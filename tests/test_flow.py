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


def test_cut_clustering_two_cliques(spark):
    # Two 4-cliques joined by one bridge edge. With alpha=0.5 the min cut
    # between any clique member and the artificial sink is its whole clique
    # (cost 1 + 4*0.5 = 3 < singleton 3.5/4.5 < whole graph 4), so
    # CutClustering must recover exactly the two cliques
    # (community/CutClustering.cpp:19-84 run()).
    from networkit_spark.operators.flow import cut_clustering

    clique_a = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    clique_b = [(u, v) for u in range(4, 8) for v in range(u + 1, 8)]
    g = from_edge_rows(spark, clique_a + clique_b + [(3, 4)], num_nodes=8)
    labels = {r["id"]: r["label"] for r in cut_clustering(g, alpha=0.5).collect()}
    assert set(labels) == set(range(8))  # every node assigned
    assert len({labels[i] for i in range(4)}) == 1
    assert len({labels[i] for i in range(4, 8)}) == 1
    assert labels[0] != labels[4]
    # first processed node is the max-degree, min-id one: node 3 labels
    # clique A, node 4 labels clique B (degree-desc, id-asc order)
    assert labels[0] == 3 and labels[4] == 4


def test_cut_clustering_alpha_endpoints(spark):
    # alpha above every edge weight -> singletons; tiny alpha -> one
    # cluster per connected component (the closed-form endpoints of the
    # reference's getClusterHierarchy, CutClustering.cpp:86-130).
    from networkit_spark.operators.flow import cut_clustering

    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    hi = {r["id"]: r["label"] for r in cut_clustering(g, alpha=10.0).collect()}
    assert hi == {i: i for i in range(5)}
    lo = {r["id"]: r["label"] for r in cut_clustering(g, alpha=0.01).collect()}
    assert len({lo[0], lo[1], lo[2]}) == 1 and len({lo[3], lo[4]}) == 1
    assert lo[0] != lo[3]


def test_cut_clustering_rejects_directed(spark):
    from networkit_spark.operators.flow import cut_clustering

    g = from_edge_rows(spark, [(0, 1)], directed=True, num_nodes=2)
    try:
        cut_clustering(g, alpha=1.0)
        assert False, "expected ValueError"
    except ValueError:
        pass
