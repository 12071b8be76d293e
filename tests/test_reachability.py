"""ReachableNodes (reachability/ReachableNodes.cpp) contract tests."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.reachability import (
    approx_reachable_nodes,
    exact_reachable_nodes,
)


def closure_counts(n, edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    out = {}
    for s in range(n):
        seen, todo = {s}, [s]
        while todo:
            x = todo.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    todo.append(y)
        out[s] = len(seen)
    return out


def test_exact_matches_python_closure(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 3), (6, 6)]
    g = from_edge_rows(spark, edges, directed=True, num_nodes=7)
    got = {r["id"]: r["reachable"] for r in exact_reachable_nodes(g).collect()}
    assert got == closure_counts(7, edges)


def test_exact_on_dag_chain(spark):
    g = from_edge_rows(spark, [(i, i + 1) for i in range(10)], directed=True)
    got = {r["id"]: r["reachable"] for r in exact_reachable_nodes(g).collect()}
    assert got == {i: 11 - i for i in range(11)}


def test_approx_tracks_exact_ordering(spark):
    # star-out vs sink: approx must separate large reach from small
    edges = [(0, i) for i in range(1, 30)] + [(i, 30) for i in range(1, 30)]
    g = from_edge_rows(spark, edges, directed=True)
    est = {r["id"]: r["est"] for r in approx_reachable_nodes(g, max_h=4).collect()}
    assert est[0] > est[1] > 0
    assert est[30] < est[1]
    # deterministic across runs
    again = {r["id"]: r["est"] for r in approx_reachable_nodes(g, max_h=4).collect()}
    assert est == again
