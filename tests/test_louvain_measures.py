"""PLM (Louvain), conductance, and clustering generators."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, from_edge_rows
from networkit_spark.operators.coarsening import (
    conductance_per_cluster,
    make_continuous_balanced_partition,
    make_one_partition,
    make_random_partition,
    make_singleton_partition,
    modularity,
)
from networkit_spark.operators.louvain import detect_communities, plm

# two 4-cliques joined by one bridge edge — unambiguous community structure
CLIQUES = (
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    + [(3, 4)]
)


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_plm_two_cliques(spark):
    g = from_edge_rows(spark, CLIQUES)
    lab = _labels(plm(g))
    assert len(set(lab.values())) == 2
    assert len({lab[i] for i in range(4)}) == 1
    assert len({lab[i] for i in range(4, 8)}) == 1
    # modularity of the recovered partition beats the trivial ones
    labels_df = plm(g)
    q = modularity(g, labels_df)
    assert q > 0.3
    assert q > modularity(g, make_one_partition(g)) + 0.3


def test_plm_improves_on_singletons(spark):
    g = from_edge_rows(spark, CLIQUES)
    q_single = modularity(g, make_singleton_partition(g))
    q_plm = modularity(g, plm(g))
    assert q_plm > q_single


def test_plm_planted_partition(spark):
    from networkit_spark.sources.generators import clustered_random_graph

    g, truth = clustered_random_graph(spark, n=60, k=3, p_intra=0.7, p_inter=0.005)
    lab = plm(g)
    # modularity in the proper range and well above random
    q = modularity(g, lab)
    assert -0.5 <= q <= 1.0
    assert q > 0.2


def test_detect_communities_dispatch(spark):
    g = from_edge_rows(spark, CLIQUES)
    assert len(set(_labels(detect_communities(g, "plm")).values())) == 2
    with pytest.raises(ValueError):
        detect_communities(g, "nope")


def test_conductance(spark):
    g = from_edge_rows(spark, CLIQUES)
    two = plm(g)
    cond = {r["label"]: r["conductance"] for r in conductance_per_cluster(g, two).collect()}
    # each clique: cut=1, vol=2*6+1=13 -> 1/13
    for v in cond.values():
        assert v == pytest.approx(1.0 / 13.0)
    # the 1-cluster partition has zero cut
    one = {r["conductance"] for r in conductance_per_cluster(g, make_one_partition(g)).collect()}
    assert one == {0.0}


def test_clustering_generators(spark):
    g = from_edge_rows(spark, CLIQUES)
    assert len(set(_labels(make_singleton_partition(g)).values())) == 8
    assert set(_labels(make_one_partition(g)).values()) == {0}
    rnd = _labels(make_random_partition(g, k=3, seed=1))
    assert set(rnd.values()) <= {0, 1, 2}
    cont = _labels(make_continuous_balanced_partition(g, k=4))
    assert cont[0] == 0 and cont[7] == 3


def test_cover_structure(spark):
    from pyspark.sql import functions as F

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.cover import (
        add_to_subset,
        cover_coverage,
        cover_from_partition,
        in_same_subset,
        number_of_subsets,
        subset_sizes,
        subsets_of,
    )

    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)])
    part = spark.createDataFrame([(0, 0), (1, 0), (2, 1)], "id long, label long")
    c = cover_from_partition(part)
    # node 2 joins subset 0 too -> overlapping membership
    c = add_to_subset(c, spark.createDataFrame([(2,)], "id long"), 0)
    sizes = {r["label"]: r["size"] for r in subset_sizes(c).collect()}
    assert sizes == {0: 3, 1: 1}
    assert number_of_subsets(c) == 2
    labs = {
        r["id"]: list(r["labels"])
        for r in subsets_of(c, spark.range(4).select(F.col("id"))).collect()
    }
    assert labs[2] == [0, 1]
    assert in_same_subset(c, 0, 2) and not in_same_subset(c, 0, 3)
    assert cover_coverage(g, c) == 0.75  # node 3 uncovered


def test_agglomerative_recovers_planted_partition(spark):
    from networkit_spark.operators.agglomerative import agglomerative_communities
    from networkit_spark.operators.coarsening import modularity
    from networkit_spark.sources.generators import clustered_random_graph

    g, truth = clustered_random_graph(
        spark, n=60, k=3, p_intra=0.5, p_inter=0.01, seed=5
    )
    labels = agglomerative_communities(g)
    # communities must align with the planted partition: every planted
    # cluster maps (mostly) into one agglomerated label
    joined = labels.join(truth.withColumnRenamed("label", "want"), "id")
    agree = (
        joined.groupBy("want", "label").count()
        .groupBy("want").agg(F.max("count").alias("best"), F.sum("count").alias("tot"))
        .selectExpr("sum(best) as b", "sum(tot) as t")
        .first()
    )
    # matching-based agglomeration merges greedily (the reference stops
    # only at 2 communities), so planted clusters stay pure but may pair up
    assert agree["b"] / agree["t"] >= 0.9
    assert modularity(g, labels) > 0.25
    n_labels = labels.select("label").distinct().count()
    assert 2 <= n_labels <= 10


def test_agglomerative_two_cliques(spark):
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.agglomerative import agglomerative_communities

    rows = [(u, v) for u in range(4) for v in range(u + 1, 4)]
    rows += [(u, v) for u in range(4, 8) for v in range(u + 1, 8)]
    rows += [(3, 4)]  # single bridge
    g = from_edge_rows(spark, rows, num_nodes=8)
    labels = {r["id"]: r["label"] for r in agglomerative_communities(g).collect()}
    assert len({labels[i] for i in range(4)}) == 1
    assert len({labels[i] for i in range(4, 8)}) == 1
    assert labels[0] != labels[7]


def test_overlapping_nmi_distance_goldens(spark):
    # CommunityGTest.cpp testOverlappingNMIDistance, n=2 cases (MAX norm)
    from networkit_spark.operators.measures import overlapping_nmi_distance

    def cover(rows):
        return spark.createDataFrame(rows, "id long, subset long")

    A = cover([(0, 0), (1, 0), (0, 1)])        # {{0,1},{0}}
    B = cover([(0, 0)])                        # {{0}}
    assert abs(overlapping_nmi_distance(A, B, 2)) < 1e-12
    assert abs(overlapping_nmi_distance(B, A, 2)) < 1e-12

    C = cover([(0, 0), (1, 1)])                # {{0},{1}}
    assert abs(overlapping_nmi_distance(A, C, 2) - 0.5) < 1e-12
    assert abs(overlapping_nmi_distance(C, A, 2) - 0.5) < 1e-12

    D = cover([(0, 0), (1, 0)])                # {{0,1}}
    assert abs(overlapping_nmi_distance(D, C, 2) - 1.0) < 1e-12
    assert abs(overlapping_nmi_distance(C, D, 2) - 1.0) < 1e-12

    E = cover([(0, 0), (1, 0), (0, 1), (0, 2), (0, 3)])  # {{0,1},{0},{0},{0}}
    assert abs(overlapping_nmi_distance(E, B, 2) - 1.0 / 3.0) < 1e-12
    assert abs(overlapping_nmi_distance(B, E, 2) - 1.0 / 3.0) < 1e-12


def test_sampled_rand_measures_match_hash_sample(spark):
    """Engine sampled Rand distances equal a hashlib transliteration of
    the same md5-ranked sample."""
    import hashlib

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.measures import (
        sampled_graph_rand_distance,
        sampled_node_rand_distance,
    )

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (2, 8), (3, 9)]
    n = 12
    za = {i: i // 4 for i in range(n)}   # 3 blocks of 4
    zb = {i: i // 6 for i in range(n)}   # 2 blocks of 6
    g = from_edge_rows(spark, edges, num_nodes=n)
    zeta = spark.createDataFrame(sorted(za.items()), "id long, label long")
    eta = spark.createDataFrame(sorted(zb.items()), "id long, label long")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    def agree(u, v):
        return (za[u] == za[v]) == (zb[u] == zb[v])

    # node sample: rank by md5("42:snr:"+id), rank r pairs with r + n//2
    ranked = sorted(range(n), key=lambda i: (h(f"42:snr:{i}"), i))
    half = n // 2
    s = min(4, half)
    pairs = [(ranked[k], ranked[k + half]) for k in range(s)]
    want_node = 1.0 - sum(agree(u, v) for u, v in pairs) / s
    got_node = sampled_node_rand_distance(g, zeta, eta, 4)
    assert got_node == pytest.approx(want_node, abs=1e-12)

    # edge sample: canonical edges ranked by md5("42:sgr:src:dst")
    canon = sorted({(min(u, v), max(u, v)) for u, v in edges})
    eranked = sorted(canon, key=lambda e: (h(f"42:sgr:{e[0]}:{e[1]}"), e))
    sample = eranked[:5]
    want_edge = 1.0 - sum(agree(u, v) for u, v in sample) / 5
    got_edge = sampled_graph_rand_distance(g, zeta, eta, 5)
    assert got_edge == pytest.approx(want_edge, abs=1e-12)


def test_plm_vs_plp_nmi_on_planted_partition(spark):
    """Quantitative community-recovery comparison (VERDICT r1 item 9):
    on a planted partition both detectors should sit close to the ground
    truth, measured by NMI distance, with PLM at least as good as a
    bounded-sweep PLP."""
    from networkit_spark.operators.labelprop import label_propagation
    from networkit_spark.operators.measures import partition_measures
    from networkit_spark.sources.generators import clustered_random_graph

    g, truth = clustered_random_graph(spark, n=60, k=3, p_intra=0.7, p_inter=0.005)
    g = Graph(
        g.vertices.localCheckpoint(eager=True),
        g.edges.localCheckpoint(eager=True),
        g.directed,
        g.weighted,
    )
    truth = truth.localCheckpoint(eager=True)

    plm_labels = plm(g).localCheckpoint(eager=True)
    plp_labels = label_propagation(g, theta=-1, max_iterations=4).localCheckpoint(
        eager=True
    )
    d_plm = partition_measures(plm_labels, truth)["nmi_distance"]
    d_plp = partition_measures(plp_labels, truth)["nmi_distance"]
    # strongly separated planted clusters: PLM should nearly recover the
    # truth; PLP is allowed to be worse but must not collapse
    assert d_plm < 0.3, d_plm
    assert d_plp < 0.9, d_plp
    assert d_plm <= d_plp + 0.05, (d_plm, d_plp)
