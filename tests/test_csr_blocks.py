"""CSR-block gather-scatter path (networkit_spark.blocks): bit-for-bit
parity with the expr path on labels, 1e-12 on scores (SURVEY.md §7.3 step 2:
"both must agree").  Random graph is seeded -> deterministic."""

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.blocks import CsrBlocks
from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.labelprop import label_propagation
from networkit_spark.operators.pagerank import pagerank


def _random_graph(spark, n=60, m=150, seed=7, weighted=True):
    rng = random.Random(seed)
    rows = set()
    while len(rows) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            rows.add((min(u, v), max(u, v)))
    edges = [
        (u, v, float(rng.randint(1, 5)) if weighted else 1.0) for u, v in sorted(rows)
    ]
    return from_edge_rows(spark, edges, num_nodes=n)


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_gather_sum_tiny(spark):
    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 1.0)])
    csr = CsrBlocks.build(g.edges, num_blocks=3)
    vals = spark.createDataFrame([(0, 1.0), (1, 10.0), (2, 100.0)], "src long, value double")
    out = {r["id"]: r["mass"] for r in csr.gather_sum(vals).collect()}
    # symmetrized: 0<-1 (w2), 1<-0 (w2), 1<-2 (w1), 2<-1 (w1)
    assert out == {0: 20.0, 1: 102.0, 2: 10.0}
    csr.unpersist()


def test_pagerank_csr_matches_expr(spark):
    g = _random_graph(spark).with_cached_degrees()
    a = _scores(pagerank(g, tol=0.0, max_iterations=15))
    b = _scores(pagerank(g, tol=0.0, max_iterations=15, impl="csr", num_blocks=4))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_components_csr_matches_expr(spark):
    g = _random_graph(spark, n=80, m=90)  # sparse -> several components
    a = _labels(connected_components(g))
    b = _labels(connected_components(g, impl="csr", num_blocks=4))
    assert a == b
    # hash-min fixed point: label == min member id
    comp = {}
    for k, v in a.items():
        comp.setdefault(v, []).append(k)
    assert all(lbl == min(members) for lbl, members in comp.items())


def test_labelprop_csr_matches_expr(spark):
    g = _random_graph(spark, n=50, m=120)
    a = _labels(label_propagation(g, theta=-1, max_iterations=4))
    b = _labels(label_propagation(g, theta=-1, max_iterations=4, impl="csr", num_blocks=4))
    assert a == b


def test_csr_plan_is_arrow_not_row_python(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2)])
    csr = CsrBlocks.build(g.edges, num_blocks=2)
    vals = g.vertices.select(F.col("id").alias("src"), F.lit(1.0).alias("value"))
    plan = csr.gather_sum(vals)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no per-row Python, ever
    assert "FlatMapCoGroupsInPandas" in plan  # Arrow-batched kernel
    csr.unpersist()
