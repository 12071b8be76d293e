"""Boruvka spanning forest (graph/RandomMaximumSpanningForest.cpp) tests."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.spanning import forest_weight, max_spanning_forest


def kruskal_max(n_nodes, edges):
    """Independent sequential Kruskal under the same (w, u, v) total order."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, u, v in sorted(
        ((w, min(a, b), max(a, b)) for a, b, w in edges), reverse=True
    ):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def test_matches_kruskal_on_weighted_fixture(spark):
    # two clusters + a bridge, assorted weights incl. ties
    edges = [
        (0, 1, 4.0), (1, 2, 3.0), (0, 2, 2.0), (2, 3, 1.0),
        (3, 4, 5.0), (4, 5, 5.0), (3, 5, 5.0), (5, 6, 0.5),
        (6, 7, 2.0), (7, 3, 2.0),
    ]
    g = from_edge_rows(spark, [(u, v, w) for u, v, w in edges], weighted=True)
    got = sorted(
        (r["u"], r["v"], r["weight"]) for r in max_spanning_forest(g).collect()
    )
    assert got == kruskal_max(8, edges)
    assert forest_weight(max_spanning_forest(g)) == sum(w for _, _, w in got)


def test_forest_shape_on_disconnected_graph(spark):
    # 3 components incl. an isolated vertex: |F| = n - n_components
    edges = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 3.0), (4, 5, 1.0)]
    g = from_edge_rows(
        spark, [(u, v, w) for u, v, w in edges], weighted=True, num_nodes=6
    )
    rows = max_spanning_forest(g).collect()
    assert len(rows) == 6 - 3
    assert sorted((r["u"], r["v"]) for r in rows) == [(0, 2), (1, 2), (4, 5)]


def test_path_graph_keeps_every_edge(spark):
    g = from_edge_rows(spark, [(i, i + 1) for i in range(20)])
    rows = max_spanning_forest(g).collect()
    assert sorted((r["u"], r["v"]) for r in rows) == [(i, i + 1) for i in range(20)]


# ---- union of all maximum spanning forests --------------------------------


def _umsf_referee(n_nodes, edges):
    """Cut rule: (u, v, w) is in the UMSF iff u, v are disconnected in the
    strictly-heavier subgraph (UnionMaximumSpanningForest.cpp:46-80 with
    deferred merges)."""
    canon = {}
    for u, v, w in edges:
        a, b = min(u, v), max(u, v)
        canon[(a, b)] = max(w, canon.get((a, b), float("-inf")))
    out = {}
    for (u, v), w in canon.items():
        adj = {i: [] for i in range(n_nodes)}
        for (a, b), w2 in canon.items():
            if w2 > w:
                adj[a].append(b)
                adj[b].append(a)
        seen, stack = {u}, [u]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        out[(u, v, w)] = v not in seen
    return out


def _umsf_run(spark, edges, n=None):
    from networkit_spark.operators.spanning import union_max_spanning_forest

    from networkit_spark.graph import from_edge_rows

    g = from_edge_rows(spark, edges, weighted=True, num_nodes=n)
    return {
        (r["u"], r["v"], r["weight"]): r["in_umsf"]
        for r in union_max_spanning_forest(g).collect()
    }


def test_umsf_matches_cut_rule_with_ties(spark):
    # tied-weight triangle: ALL three edges are in some MSF
    edges = [
        (0, 1, 4.0), (1, 2, 4.0), (0, 2, 4.0), (2, 3, 1.0),
        (3, 4, 5.0), (4, 5, 5.0), (3, 5, 2.0), (5, 6, 0.5),
    ]
    got = _umsf_run(spark, edges)
    assert got == _umsf_referee(7, edges)
    # the tied triangle is fully in; the bridge always is
    assert got[(0, 1, 4.0)] and got[(1, 2, 4.0)] and got[(0, 2, 4.0)]
    assert got[(5, 6, 0.5)]


def test_umsf_distinct_weights_equals_msf(spark):
    edges = [
        (0, 1, 9.0), (1, 2, 8.0), (0, 2, 7.0), (2, 3, 6.0),
        (3, 4, 5.0), (4, 0, 4.0), (1, 4, 3.0),
    ]
    got = _umsf_run(spark, edges)
    assert got == _umsf_referee(5, edges)
    msf = {(u, v, w) for u, v, w in (
        (r["u"], r["v"], r["weight"])
        for r in max_spanning_forest(
            from_edge_rows(spark, edges, weighted=True)
        ).collect()
    )}
    assert {e for e, m in got.items() if m} == msf


def test_umsf_uniform_weights_marks_everything(spark):
    # all-equal weights: the heavier subgraph is empty at the only level,
    # so every edge (even cycle edges) is in some MSF
    edges = [(0, 1, 2.0), (1, 2, 2.0), (2, 0, 2.0), (2, 3, 2.0)]
    got = _umsf_run(spark, edges)
    assert all(got.values()) and len(got) == 4


def test_umsf_rejects_unbounded_weight_domain(spark):
    import pytest
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.spanning import union_max_spanning_forest

    # a float-weighted path (e.g. after edge_score_as_weight): |levels| == m,
    # which would silently make the stacked build O(m^2) — must raise instead
    edges = [(i, i + 1, 1.0 + i * 0.123) for i in range(8)]
    g = from_edge_rows(spark, edges, weighted=True)
    with pytest.raises(ValueError, match="distinct edge weights"):
        union_max_spanning_forest(g, max_levels=4)
    # raising the cap explicitly takes the normal path on the same graph
    got = {
        (r["u"], r["v"]): r["in_umsf"]
        for r in union_max_spanning_forest(g, max_levels=8).collect()
    }
    assert all(got.values()) and len(got) == 8


def test_random_spanning_forest_invariants_and_uniformity(spark):
    """components/RandomSpanningForest.cpp:20-52 (Aldous-Broder): the
    result is a spanning forest of each component built from graph edges;
    on the triangle the sampled tree is uniform over the 3 candidates."""
    from networkit_spark.graph import Graph, from_edge_rows
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.spanning import random_spanning_forest

    # two components: a 4-cycle + a path
    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6)]
    g = from_edge_rows(spark, rows, num_nodes=7)
    tree = random_spanning_forest(g, seed=5)
    te = [(r["src"], r["dst"]) for r in tree.collect()]
    assert len(te) == 7 - 2  # n - #components
    ge = {(min(a, b), max(a, b)) for a, b in rows}
    assert all((min(a, b), max(a, b)) in ge for a, b in te)
    # the forest spans: same component structure as the graph
    fg = from_edge_rows(spark, te, num_nodes=7)
    cc_g = {r["id"]: r["label"] for r in connected_components(g).collect()}
    cc_f = {r["id"]: r["label"] for r in connected_components(fg).collect()}
    assert cc_g == cc_f
    # determinism
    te2 = [(r["src"], r["dst"]) for r in random_spanning_forest(g, seed=5).collect()]
    assert te == te2

    # uniformity on the triangle: 3 spanning trees, one per omitted edge;
    # 60 seeds should hit each a fair number of times (expected 20 each;
    # the per-seed cost is the operator's small CC job)
    tri = from_edge_rows(spark, [(0, 1), (1, 2), (2, 0)], num_nodes=3)
    omitted = {(0, 1): 0, (1, 2): 0, (0, 2): 0}
    tri_edges = set(omitted)
    for s in range(60):
        t = {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            for r in random_spanning_forest(tri, seed=s).collect()
        }
        assert len(t) == 2
        (miss,) = tri_edges - t
        omitted[miss] += 1
    assert all(c >= 10 for c in omitted.values()), omitted


def test_kruskal_msf_matches_boruvka(spark):
    """graph/KruskalMSF.cpp:42-70 — with ties broken by (u, v) asc, the
    sorted union-find scan returns the identical maximum spanning forest
    as the distributed Boruvka under the same (weight, u, v) order."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.spanning import (
        forest_weight,
        kruskal_msf,
        max_spanning_forest,
    )

    rows = [
        (0, 1, 4.0), (1, 2, 2.0), (2, 0, 5.0), (2, 3, 1.0), (3, 4, 3.0),
        (4, 2, 3.0), (5, 6, 7.0),  # ties at weight 3; separate component
    ]
    g = from_edge_rows(spark, rows, num_nodes=7, weighted=True)
    k = [(r["u"], r["v"], r["weight"]) for r in kruskal_msf(g).collect()]
    b = sorted(
        (r["u"], r["v"], r["weight"]) for r in max_spanning_forest(g).collect()
    )
    assert k == b
    assert abs(forest_weight(kruskal_msf(g)) - forest_weight(max_spanning_forest(g))) < 1e-12
    # n - #components edges
    assert len(k) == 7 - 2


def test_approx_spanning_edge_matches_effective_resistance(spark):
    """centrality/ApproxSpanningEdge.cpp:24-130 — the sampled UST edge
    frequency must land within eps of the exact spanning-edge centrality
    (= effective resistance on unweighted graphs, matrix-tree theorem)."""
    import numpy as np
    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.spanning import approx_spanning_edge

    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (3, 4)]
    g = from_edge_rows(spark, rows, num_nodes=5)
    eps = 0.15
    got = {
        (r["u"], r["v"]): r["score"]
        for r in approx_spanning_edge(g, eps=eps, seed=7).collect()
    }
    # exact via pseudoinverse of the Laplacian
    n = 5
    L = np.zeros((n, n))
    for u, v in rows:
        L[u, u] += 1; L[v, v] += 1; L[u, v] -= 1; L[v, u] -= 1
    Lp = np.linalg.pinv(L)
    for u, v in rows:
        exact = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        assert abs(got[(min(u, v), max(u, v))] - exact) <= eps, (u, v)
    # the bridge (3,4) is in EVERY spanning tree
    assert got[(3, 4)] == 1.0
    # sample-count guard
    with pytest.raises(ValueError, match="max_samples"):
        approx_spanning_edge(g, eps=0.01, max_samples=10)


def test_wilson_spanning_forest_invariants_and_uniformity(spark):
    """centrality/ApproxSpanningEdge.cpp:43-110 sampleUST (Wilson
    loop-erased walks): spanning forest of graph edges per component,
    deterministic per seed, uniform over the triangle's 3 trees."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.spanning import wilson_spanning_forest

    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6)]
    g = from_edge_rows(spark, rows, num_nodes=7)
    te = [(r["src"], r["dst"]) for r in wilson_spanning_forest(g, seed=5).collect()]
    assert len(te) == 7 - 2
    ge = {(min(a, b), max(a, b)) for a, b in rows}
    assert all((min(a, b), max(a, b)) in ge for a, b in te)
    fg = from_edge_rows(spark, te, num_nodes=7)
    cc_g = {r["id"]: r["label"] for r in connected_components(g).collect()}
    cc_f = {r["id"]: r["label"] for r in connected_components(fg).collect()}
    assert cc_g == cc_f
    te2 = [(r["src"], r["dst"]) for r in wilson_spanning_forest(g, seed=5).collect()]
    assert te == te2

    tri = from_edge_rows(spark, [(0, 1), (1, 2), (2, 0)], num_nodes=3)
    omitted = {(0, 1): 0, (1, 2): 0, (0, 2): 0}
    tri_edges = set(omitted)
    for s in range(45):
        t = {
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            for r in wilson_spanning_forest(tri, seed=s).collect()
        }
        assert len(t) == 2
        (miss,) = tri_edges - t
        omitted[miss] += 1
    assert all(c >= 7 for c in omitted.values()), omitted


def test_walk_samplers_accept_directed_input(spark):
    # regression: _collect_walk_state built a directed adjacency while
    # connected_components symmetrizes, so a directed chain stranded the
    # walk (rng over an empty neighbor list). The samplers now walk the
    # undirected simple support, same to_undirected contract as
    # max_spanning_forest.
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.spanning import (
        random_spanning_forest,
        wilson_spanning_forest,
    )

    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], directed=True)
    for sampler in (random_spanning_forest, wilson_spanning_forest):
        rows = {(r["src"], r["dst"]) for r in sampler(g, seed=7).collect()}
        # a spanning tree of the 4-node undirected support has 3 edges
        assert len(rows) == 3
        nodes = {x for e in rows for x in e}
        assert nodes == {0, 1, 2, 3}
