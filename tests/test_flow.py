"""EdmondsKarp vs the reference's flow/test/EdmondsKarpGTest.cpp goldens."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.flow import edmonds_karp, max_flow_value


def test_maxflow_p1_unweighted_undirected(spark):
    # EdmondsKarpGTest.cpp testEdmondsKarpP1: 7 nodes, maxflow(0,6) == 2,
    # source set == {0,1,2,3,4}
    rows = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 4), (2, 3), (2, 4), (3, 4),
        (3, 5), (4, 6), (5, 6),
    ]
    g = from_edge_rows(spark, rows, num_nodes=7)
    value, source_set = edmonds_karp(g, 0, 6)
    assert value == 2.0
    assert {r["id"] for r in source_set.collect()} == {0, 1, 2, 3, 4}


def test_maxflow_two_paths(spark):
    # testEdmondsKarpTwoPaths: 11 nodes, maxflow(0,10) == 2
    rows = [
        (0, 1), (0, 2), (2, 3), (3, 4), (1, 4), (1, 5), (5, 6), (6, 7),
        (7, 8), (8, 9), (4, 10), (9, 10),
    ]
    g = from_edge_rows(spark, rows, num_nodes=11)
    assert max_flow_value(g, 0, 10) == 2.0


def test_maxflow_p2_weighted_undirected(spark):
    # testEdmondsKarpP2: weighted undirected, maxflow(0,5) == 15
    rows = [
        (0, 1, 5.0), (0, 2, 15.0), (1, 3, 5.0), (1, 4, 5.0), (2, 3, 5.0),
        (2, 4, 5.0), (3, 5, 15.0), (4, 5, 5.0),
    ]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    assert max_flow_value(g, 0, 5) == 15.0


def test_maxflow_unconnected(spark):
    # testEdmondsKarpUnconnected: maxflow across components == 0
    rows = [(0, 1, 5.0), (0, 2, 15.0), (1, 2, 5.0), (3, 4, 5.0), (3, 5, 15.0), (4, 5, 5.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    value, source_set = edmonds_karp(g, 0, 5)
    assert value == 0.0
    assert {r["id"] for r in source_set.collect()} == {0, 1, 2}


def test_maxflow_directed_asymmetry(spark):
    # directed chain 0->1->2 carries 1.0 forward, nothing backward
    g = from_edge_rows(spark, [(0, 1), (1, 2)], num_nodes=3, directed=True)
    assert max_flow_value(g, 0, 2) == 1.0
    assert max_flow_value(g, 2, 0) == 0.0
