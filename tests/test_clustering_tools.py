"""GraphClusteringTools (community/GraphClusteringTools.cpp) vs
hand-computed referees."""

from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.clustering_tools import (
    cluster_weighted_degree,
    communication_graph,
    compact_labels,
    equal_clusterings,
    imbalance,
    is_one_clustering,
    is_proper_clustering,
    is_singleton_clustering,
)

BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _labels(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), "id long, label long")


def test_imbalance(spark):
    # sizes 4 and 2 over n=6, k=2 -> avg=ceil(3)=3, imbalance=4/3
    lab = _labels(spark, {0: 7, 1: 7, 2: 7, 3: 7, 4: 9, 5: 9})
    assert abs(imbalance(lab) - 4.0 / 3.0) < 1e-12
    # perfectly balanced -> 1.0
    lab = _labels(spark, {0: 1, 1: 1, 2: 2, 3: 2})
    assert imbalance(lab) == 1.0


def test_compact_labels_ascending_dense(spark):
    lab = _labels(spark, {0: 42, 1: 7, 2: 42, 3: 1000})
    got = {r["label"]: r["cid"] for r in compact_labels(lab).collect()}
    assert got == {7: 0, 42: 1, 1000: 2}


def test_communication_graph_barbell(spark):
    g = from_edge_rows(spark, BARBELL)
    lab = _labels(spark, {0: 5, 1: 5, 2: 5, 3: 3, 4: 3, 5: 3})
    got = [
        (r["src"], r["dst"], r["weight"])
        for r in communication_graph(g, lab).collect()
    ]
    # compacted: label 3 -> cid 0, label 5 -> cid 1; one cut edge (2,3)
    assert got == [(0, 1, 1.0)]


def test_communication_graph_weighted_multicut(spark):
    g = from_edge_rows(
        spark, [(0, 1, 2.0), (0, 2, 3.0), (1, 3, 5.0), (2, 3, 7.0), (0, 3, 11.0)]
    )
    lab = _labels(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in communication_graph(g, lab).collect()
    }
    # cut edges: (0,2)=3, (1,3)=5, (0,3)=11 -> total 19 between cids 0 and 1
    assert got == {(0, 1): 19.0}


def test_cluster_weighted_degree(spark):
    g = from_edge_rows(spark, BARBELL)
    lab = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    got = {
        (r["id"], r["label"]): r["wdeg"]
        for r in cluster_weighted_degree(g, lab).collect()
    }
    assert got[(2, 0)] == 2.0  # neighbors 0, 1 in cluster 0
    assert got[(2, 1)] == 1.0  # neighbor 3 across the bridge
    assert got[(4, 1)] == 2.0
    assert (4, 0) not in got


def test_predicates(spark):
    g = from_edge_rows(spark, BARBELL)
    full = _labels(spark, {i: i // 3 for i in range(6)})
    assert is_proper_clustering(g, full)
    assert not is_one_clustering(g, full)
    assert not is_singleton_clustering(g, full)
    missing = _labels(spark, {i: 0 for i in range(5)})  # node 5 unassigned
    assert not is_proper_clustering(g, missing)
    one = _labels(spark, {i: 9 for i in range(6)})
    assert is_one_clustering(g, one)
    single = _labels(spark, {i: 10 + i for i in range(6)})
    assert is_singleton_clustering(g, single)


def test_equal_clusterings_edge_level(spark):
    g = from_edge_rows(spark, BARBELL)
    a = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    b = _labels(spark, {0: 7, 1: 7, 2: 7, 3: 9, 4: 9, 5: 9})  # same structure
    assert equal_clusterings(a, b, g)
    c = _labels(spark, {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1})  # edge (1,2) cut
    assert not equal_clusterings(a, c, g)
    # non-adjacent disagreement is invisible at edge level (ref semantics):
    # split {3,4,5} vs {3,4},{5} differs only on edges (3,5),(4,5) -> visible
    d = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2})
    assert not equal_clusterings(a, d, g)


def test_compact_labels_negative_labels_numeric_order(spark):
    # sign-aware key: negative labels must compact in numeric ascending
    # order (a zero-padded decimal key embeds '-' and mis-sorts them)
    lab = _labels(spark, {0: -5, 1: 3, 2: -40, 3: 0, 4: 3})
    got = {r["label"]: r["cid"] for r in compact_labels(lab).collect()}
    assert got == {-40: 0, -5: 1, 0: 2, 3: 3}
