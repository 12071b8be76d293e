"""Biconnected components: BFS-forest Tarjan-Vishkin vs a sequential
Hopcroft-Tarjan referee (components/BiconnectedComponents.cpp semantics),
plus the reference GTest fixture (BiconnectedComponentsGTest.cpp:21-38)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.biconnected import (
    biconnected_components,
    biconnected_node_summary,
)


def _hopcroft_tarjan(n, edges):
    """Edge partition into biconnected components (frozenset of frozensets
    of canonical edges) — iterative DFS with an edge stack, the same
    algorithm as the reference."""
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    visited, level, low, parent = {}, {}, {}, {}
    comps = []
    idx = 0
    for root in range(n):
        if root in visited:
            continue
        estack = []
        stack = [(root, iter(adj[root]))]
        visited[root] = True
        level[root] = low[root] = idx
        idx += 1
        while stack:
            u, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited[w] = True
                    level[w] = low[w] = idx
                    idx += 1
                    parent[w] = u
                    estack.append((u, w))
                    stack.append((w, iter(adj[w])))
                    advanced = True
                    break
                elif w != parent.get(u) and level[w] < level[u]:
                    estack.append((u, w))
                    low[u] = min(low[u], level[w])
            if not advanced:
                stack.pop()
                if u == root:
                    continue
                v = parent[u]
                low[v] = min(low[v], low[u])
                if low[u] >= level[v]:
                    comp = set()
                    while estack and level[estack[-1][0]] >= level[u]:
                        comp.add(frozenset(estack.pop()))
                    # the (v, u) tree edge itself
                    for i in range(len(estack) - 1, -1, -1):
                        if estack[i] == (v, u):
                            comp.add(frozenset(estack.pop(i)))
                            break
                    comps.append(frozenset(comp))
    return frozenset(c for c in comps if c)


def _spark_partition(df):
    groups = {}
    for r in df.collect():
        groups.setdefault(r["component"], set()).add(frozenset((r["u"], r["v"])))
    return frozenset(frozenset(v) for v in groups.values())


def test_biconnected_gtest_tiny_fixture(spark):
    # BiconnectedComponentsGTest.cpp:21-38: 9 nodes, 11 edges, 4 components
    edges = [(0, 1), (1, 2), (1, 3), (1, 4), (0, 5), (0, 6),
             (4, 5), (2, 3), (6, 8), (6, 7), (7, 8)]
    g = from_edge_rows(spark, [(a, b, 1.0) for a, b in edges],
                       num_nodes=9, weighted=True)
    ec = biconnected_components(g)
    assert ec.select("component").distinct().count() == 4
    assert _spark_partition(ec) == _hopcroft_tarjan(9, edges)


def test_biconnected_matches_referee_on_random_graphs(spark):
    for seed, n, m in [(1, 12, 16), (2, 14, 20), (3, 16, 18)]:
        rng = np.random.RandomState(seed)
        es = set()
        while len(es) < m:
            a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
            if a != b:
                es.add((min(a, b), max(a, b)))
        edges = sorted(es)
        g = from_edge_rows(spark, [(a, b, 1.0) for a, b in edges],
                           num_nodes=n, weighted=True)
        got = _spark_partition(biconnected_components(g))
        want = _hopcroft_tarjan(n, edges)
        assert got == want, f"seed={seed}"


def test_biconnected_bridges_and_articulation(spark):
    # path 0-1-2: both edges are bridges (singleton blocks); 1 articulates
    edges = [(0, 1), (1, 2)]
    g = from_edge_rows(spark, [(a, b, 1.0) for a, b in edges],
                       num_nodes=3, weighted=True)
    ec = biconnected_components(g)
    assert ec.select("component").distinct().count() == 2
    s = {r["id"]: (r["n_comps"], r["is_articulation"])
         for r in biconnected_node_summary(g).collect()}
    assert s == {0: (1, False), 1: (2, True), 2: (1, False)}


def test_biconnected_cycle_single_block(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    g = from_edge_rows(spark, [(a, b, 1.0) for a, b in edges],
                       num_nodes=4, weighted=True)
    ec = biconnected_components(g)
    assert ec.select("component").distinct().count() == 1
    summ = biconnected_node_summary(g)
    assert summ.filter("is_articulation").count() == 0
