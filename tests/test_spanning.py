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
