"""Physical-plan assertions (SURVEY.md §7.4): no per-row Python in any hot
path, pushdown/pruning reach the parquet scan, broadcast where expected."""

import os

from pyspark.sql import functions as F

from networkit_spark.edges import derive_edges, transcript_edge_keys
from networkit_spark.graph import from_edge_rows
from networkit_spark.transcripts import synth_transcripts


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_no_row_python_in_edge_pipeline(spark):
    t = synth_transcripts(spark, n_convs=10)
    _, edges = derive_edges(t)
    plan = _plan(edges)
    assert "BatchEvalPython" not in plan  # row-at-a-time Python UDF
    # fully JVM-side: no Python at all in this pipeline
    assert "ArrowEvalPython" not in plan


def test_column_pruning_reaches_scan(spark, tmp_path):
    t = synth_transcripts(spark, n_convs=10)
    path = os.path.join(str(tmp_path), "transcripts.parquet")
    t.write.parquet(path)
    read = spark.read.parquet(path)
    pairs = transcript_edge_keys(read)
    plan = _plan(pairs)
    # `text` and `ts` must be pruned from the scan (SURVEY.md §4.2)
    assert "text" not in plan.split("ReadSchema")[1][:400]
    assert "PushedFilters: [IsNotNull(tool)]" in plan or "IsNotNull(tool)" in plan


def test_degree_join_broadcasts(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2)])
    from networkit_spark.operators.triangles import _oriented

    plan = _plan(_oriented(g))
    assert "BroadcastHashJoin" in plan


def test_supersteps_whole_stage_codegen(spark):
    # one PageRank superstep: join + agg must be inside WholeStageCodegen
    g = from_edge_rows(spark, [(0, 1), (1, 2)])
    deg = g.degrees()
    out = g.edges.join(deg.withColumnRenamed("id", "src"), "src").select(
        "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
    )
    scores = g.vertices.select("id", F.lit(0.5).alias("score"))
    step = (
        out.join(scores.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("score") * F.col("frac")).alias("mass"))
    )
    step.collect()  # run so AQE finalizes the physical plan
    plan = _plan(step)
    assert "isFinalPlan=true" in plan
    # formatted explain marks codegen'd operators with a `*` prefix
    # (simple-mode shows `WholeStageCodegen (N)` spans); accept either
    assert "WholeStageCodegen" in plan or "\n   * HashAggregate" in plan or "* HashAggregate" in plan
    assert "BatchEvalPython" not in plan
