"""Skew fixture (FIXTURES.md §2.7): star hub >> shuffle partitions; salted
results must equal unsalted small-scale results."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.components import connected_components, num_components
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.skew import salted_agg, top_degree_keys
from networkit_spark.operators.triangles import global_triangle_count
from networkit_spark.oracle import cc_oracle, pagerank_oracle

H = 5000  # hub fan-out >> 8 shuffle partitions


def _star_plus_path(spark):
    rows = [(0, i) for i in range(1, H + 1)]
    path0 = H + 1
    rows += [(path0 + i, path0 + i + 1) for i in range(9)]
    return from_edge_rows(spark, rows, num_nodes=path0 + 10), rows


def test_salted_agg_equals_plain(spark):
    g, _ = _star_plus_path(spark)
    plain = {
        r["dst"]: (r["s"], r["c"])
        for r in g.edges.groupBy("dst")
        .agg(F.sum("weight").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["dst"]: (r["s"], r["c"])
        for r in salted_agg(
            g.edges, ["dst"], {"s": ("sum", "weight"), "c": ("count", "weight")}, salt=16
        ).collect()
    }
    assert plain == salted


def test_star_algorithms_correct_under_skew(spark):
    g, rows = _star_plus_path(spark)
    n = H + 11
    sym = [(a, b, 1.0) for a, b in rows] + [(b, a, 1.0) for a, b in rows]

    labels = connected_components(g)
    got = np.zeros(n, np.int64)
    for r in labels.collect():
        got[r["id"]] = r["label"]
    assert np.array_equal(got, cc_oracle(n, sym))
    assert num_components(labels) == 2

    assert global_triangle_count(g) == 0

    scores = pagerank(g, tol=1e-8)
    arr = np.zeros(n)
    for r in scores.collect():
        arr[r["id"]] = r["score"]
    assert np.allclose(arr, pagerank_oracle(n, sym, tol=1e-8), atol=1e-9)


def test_top_degree_keys(spark):
    g, _ = _star_plus_path(spark)
    hubs = [r["key"] for r in top_degree_keys(g.edges, "src", 100).collect()]
    assert hubs == [0]
