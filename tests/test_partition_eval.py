"""Local partition/cover evaluation (community/Intrapartition*, HubDominance,
IsolatedInterpartition*, AdjustedRandMeasure, CoverF1Similarity) tests."""

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.measures import adjusted_rand_distance
from networkit_spark.operators.partition_eval import (
    cover_f1_similarity,
    intrapartition_density,
    isolated_interpartition_values,
    partition_hub_dominance,
)

BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _labels(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), "id long, label long")


def _cover(spark, mapping):
    rows = [(i, s) for i, subs in mapping.items() for s in subs]
    return spark.createDataFrame(rows, "id long, subset long")


@pytest.fixture()
def barbell(spark):
    g = from_edge_rows(spark, BARBELL)
    labels = _labels(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    return g, labels


def test_intrapartition_density_full_triangles(spark, barbell):
    g, labels = barbell
    got = {r["label"]: r["density"] for r in intrapartition_density(g, labels).collect()}
    assert got == {0: 1.0, 1: 1.0}


def test_hub_dominance_triangle(spark, barbell):
    g, labels = barbell
    got = {r["label"]: r["hub_dominance"] for r in partition_hub_dominance(g, labels).collect()}
    assert got == {0: 1.0, 1: 1.0}


def test_isolated_interpartition_values(spark, barbell):
    g, labels = barbell
    rows = {r["label"]: r for r in isolated_interpartition_values(g, labels).collect()}
    # cut = 1 (bridge); vol = 3 intra edges x 2 + 1 bridge endpoint = 7; total = 14
    assert rows[0]["iso_conductance"] == pytest.approx(1.0 / 7.0)
    assert rows[0]["iso_expansion"] == pytest.approx(1.0 / 3.0)
    assert rows[1]["iso_conductance"] == pytest.approx(1.0 / 7.0)


def test_self_loop_conventions(spark):
    # loop (0,0) w=2: counts once in intraEdges, twice in volume, once in
    # the loop node's internal adjacency (reference forEdges/forNeighborsOf)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (0, 0, 2.0)], weighted=True)
    labels = _labels(spark, {0: 0, 1: 0, 2: 0})
    d = intrapartition_density(g, labels).collect()[0]
    assert d["density"] == pytest.approx(4.0 / 3.0)
    h = partition_hub_dominance(g, labels).collect()[0]
    assert h["hub_dominance"] == pytest.approx(3.0 / 2.0)
    v = isolated_interpartition_values(g, labels).collect()[0]
    assert v["iso_conductance"] == 0.0  # no inter edges


def test_adjusted_rand_identical_is_zero(spark, barbell):
    _, labels = barbell
    assert adjusted_rand_distance(labels, labels) == pytest.approx(0.0)


def test_adjusted_rand_vs_one_cluster(spark, barbell):
    # sum_z=6, sum_e=15, sum_i=6, max=10.5, expected=6 -> distance 1.0
    _, labels = barbell
    one = _labels(spark, {i: 0 for i in range(6)})
    assert adjusted_rand_distance(labels, one) == pytest.approx(1.0)


def test_cover_f1_exact_and_merged(spark):
    a = _cover(spark, {i: [0] for i in range(3)} | {i: [1] for i in range(3, 6)})
    merged = _cover(spark, {i: [7] for i in range(6)})
    exact = {r["subset"]: r["f1"] for r in cover_f1_similarity(a, a).collect()}
    assert exact == {0: 1.0, 1: 1.0}
    got = {r["subset"]: r["f1"] for r in cover_f1_similarity(merged, a).collect()}
    assert got[7] == pytest.approx(2.0 * 3 / (6 + 3))


def test_cover_f1_overlapping_membership(spark):
    # node 2 belongs to both subsets of C; reference splits {0,1,2} / {3,4}
    c = _cover(spark, {0: [0], 1: [0], 2: [0, 1], 3: [1], 4: [1]})
    ref = _cover(spark, {0: [0], 1: [0], 2: [0], 3: [1], 4: [1]})
    got = {r["subset"]: r["f1"] for r in cover_f1_similarity(c, ref).collect()}
    assert got[0] == pytest.approx(1.0)  # {0,1,2} vs {0,1,2}
    assert got[1] == pytest.approx(2.0 * 2 / (3 + 2))  # {2,3,4} vs {3,4}


def test_cover_hub_dominance_overlapping(spark):
    from networkit_spark.operators.partition_eval import cover_hub_dominance

    # triangle 0-1-2 + pendant 3 on node 2; subsets {0,1,2} and {2,3}
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (2, 3)], num_nodes=4)
    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1)], "id long, subset long"
    )
    got = {
        r["subset"]: (r["size"], r["hub_dominance"])
        for r in cover_hub_dominance(g, cover).collect()
    }
    # subset 0: each of 0,1,2 has 2 internal neighbors -> 2/(3-1) = 1.0
    assert got[0] == (3, 1.0)
    # subset 1: 2-3 edge only -> max internal deg 1 / (2-1) = 1.0
    assert got[1] == (2, 1.0)

    # make it non-trivial: drop edge 0-2 -> subset 0 max internal deg 2 stays
    # with node 1 (neighbors 0 and 2), dominance 1.0; instead check a path
    g2 = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    got2 = {
        r["subset"]: (r["size"], r["hub_dominance"])
        for r in cover_hub_dominance(g2, cover).collect()
    }
    assert got2[0] == (3, 1.0)  # node 1 internal deg 2 over size-1=2


def test_partition_fragmentation(spark):
    from networkit_spark.operators.partition_eval import partition_fragmentation

    # components {0,1,2} and {3,4}; cluster A = {0,1,3} spans both (frag
    # 1 - 2/3), cluster B = {2,4} spans both (frag 1 - 1/2)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (3, 10), (2, 20), (4, 20)], "id long, label long"
    )
    got = {
        r["label"]: (r["size"], round(r["fragmentation"], 6))
        for r in partition_fragmentation(g, labels).collect()
    }
    assert got[10] == (3, round(1 - 2 / 3, 6))
    assert got[20] == (2, 0.5)
