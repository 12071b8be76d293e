"""Edge switching vs randomization/EdgeSwitching.cpp's contract: exact
degree preservation, simplicity, determinism under seed, actual mixing."""

from pyspark.sql import functions as F

from networkit_spark.operators.randomization import edge_switching
from networkit_spark.sources.generators import erdos_renyi


def _canon_set(g):
    return {
        (r["src"], r["dst"])
        for r in g.edges.filter(F.col("src") <= F.col("dst")).collect()
    }


def _degrees(g):
    return {
        r["src"]: r["cnt"]
        for r in g.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_edge_switching_preserves_degrees_and_simplicity(spark):
    g = erdos_renyi(spark, n=40, p=0.15, seed=7)
    before = _degrees(g)
    r = edge_switching(g, rounds=6, seed=11)
    after = _degrees(r)
    assert before == after
    # still simple: no duplicate canonical edges, no new self-loops
    canon = r.edges.filter(F.col("src") < F.col("dst"))
    assert canon.count() == canon.distinct().count()
    assert r.edges.filter(F.col("src") == F.col("dst")).count() == \
        g.edges.filter(F.col("src") == F.col("dst")).count()
    # the switch chain actually moved something
    assert _canon_set(r) != _canon_set(g)


def test_edge_switching_deterministic(spark):
    g = erdos_renyi(spark, n=30, p=0.2, seed=3)
    a = edge_switching(g, rounds=4, seed=5)
    b = edge_switching(g, rounds=4, seed=5)
    assert _canon_set(a) == _canon_set(b)
    c = edge_switching(g, rounds=4, seed=6)
    assert _canon_set(a) != _canon_set(c)


def test_degree_preserving_shuffle(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    g = erdos_renyi(spark, n=40, p=0.12, seed=9)
    s, mapping = degree_preserving_shuffle(g, seed=4)
    # mapping is a permutation of the vertex set
    rows = mapping.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == {r["new_id"] for r in rows} == set(range(40))
    # per-id degree is EXACTLY preserved (in-class trades only)
    assert _degrees(s) == _degrees(g)
    # something actually moved
    assert _canon_set(s) != _canon_set(g)
    # deterministic under seed
    s2, _ = degree_preserving_shuffle(g, seed=4)
    assert _canon_set(s2) == _canon_set(s)


def test_degree_preserving_shuffle_salted(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    g = erdos_renyi(spark, n=40, p=0.12, seed=9)
    s, mapping = degree_preserving_shuffle(g, seed=4, salt_buckets=4)
    rows = mapping.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == {r["new_id"] for r in rows} == set(range(40))
    assert _degrees(s) == _degrees(g)
