"""Checkpoint / resume / metrics (SURVEY.md §7.3 step 7): a run resumed from
the latest complete iteration equals an uninterrupted run."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.plans.checkpoint import CheckpointManager

EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]


def _arr(df, n):
    out = np.zeros(n)
    for r in df.collect():
        out[r["id"]] = r["score"]
    return out


def test_resume_equals_uninterrupted(spark, tmp_path):
    g = from_edge_rows(spark, EDGES)
    want = _arr(pagerank(g, tol=0.0, max_iterations=12), 8)

    # phase 1: run 6 iterations with durable checkpoints every 3
    cp = CheckpointManager(str(tmp_path), run_id="r1", durable=True, interval=3)
    _arr(pagerank(g, tol=0.0, max_iterations=6, checkpoint=cp), 8)
    last = cp.latest_complete_iteration("pagerank")
    assert last == 6

    # phase 2: "driver died" — resume from disk and finish to 12 total
    cp2 = CheckpointManager(str(tmp_path), run_id="r1", durable=True, interval=3)
    got = _arr(
        pagerank(g, tol=0.0, max_iterations=6, checkpoint=cp2, resume=True), 8
    )
    assert np.allclose(got, want, atol=1e-15)


def test_metrics_written(spark, tmp_path):
    g = from_edge_rows(spark, EDGES)
    cp = CheckpointManager(str(tmp_path), run_id="m1", durable=True, interval=2)
    pagerank(g, tol=0.0, max_iterations=4, checkpoint=cp)
    metrics = spark.read.json(f"{tmp_path}/m1/metrics")
    rows = metrics.collect()
    # fixed-iteration mode records one row per truncation BLOCK (supersteps
    # chain lazily inside a block); steps must sum to the iteration count
    assert len(rows) == 2
    assert sum(r["steps"] for r in rows) == 4
    assert {r["algo"] for r in rows} == {"pagerank"}
    assert all(r["wall_ms"] > 0 for r in rows)
    assert {r["iteration"] for r in rows} == {2, 4}


def test_prune_keeps_latest(spark, tmp_path):
    g = from_edge_rows(spark, EDGES)
    cp = CheckpointManager(str(tmp_path), run_id="p1", durable=True, interval=2)
    pagerank(g, tol=0.0, max_iterations=6, checkpoint=cp)
    last = cp.latest_complete_iteration("pagerank")
    cp.prune("pagerank", keep_iteration=last)
    assert cp.latest_complete_iteration("pagerank") == last
    st = cp.load_state(spark, "pagerank", last)
    assert st.count() == 8
