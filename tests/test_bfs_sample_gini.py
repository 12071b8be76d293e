"""bfsSample (networkit/sampling.py) and gini (networkit/stats.pyx) vs the
reference's own fold replicated in python."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.sampling import bfs_sample, gini


def _ref_gini(values):
    # networkit/stats.pyx:gini verbatim
    sorted_list = sorted(values)
    height, area = 0, 0
    for value in sorted_list:
        height += value
        area += height - value / 2.0
    fair_area = height * len(values) / 2
    return (fair_area - area) / fair_area


def test_gini_matches_reference_fold(spark):
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        vals = [float(x) for x in rng.randint(0, 50, size=40)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        assert abs(gini(df, "x") - _ref_gini(vals)) < 1e-12


def test_gini_extremes(spark):
    eq = spark.createDataFrame([(5.0,)] * 10, "x double")
    assert abs(gini(eq, "x")) < 1e-12  # perfect equality
    one = spark.createDataFrame([(0.0,)] * 9 + [(10.0,)], "x double")
    # all mass on one of n: G = (n-1)/n
    assert abs(gini(one, "x") - 0.9) < 1e-12


def test_bfs_sample_path(spark):
    g = from_edge_rows(spark, [(i, i + 1) for i in range(6)])
    s = bfs_sample(g, source=0, k=3)
    assert {r["id"] for r in s.vertices.collect()} == {0, 1, 2}
    got = {
        (r["src"], r["dst"])
        for r in s.edges.filter(F.col("src") < F.col("dst")).collect()
    }
    assert got == {(0, 1), (1, 2)}


def test_bfs_sample_level_fill_by_id(spark):
    # star: source 0, neighbors 1..5; k=4 -> 0 plus the 3 smallest ids
    g = from_edge_rows(spark, [(0, i) for i in range(1, 6)])
    s = bfs_sample(g, source=0, k=4)
    assert {r["id"] for r in s.vertices.collect()} == {0, 1, 2, 3}


def test_bfs_sample_k_exceeds_reachable(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4)])  # two components
    s = bfs_sample(g, source=0, k=10)
    assert {r["id"] for r in s.vertices.collect()} == {0, 1, 2}
