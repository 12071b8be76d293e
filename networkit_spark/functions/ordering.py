"""Distributed total-order primitives (no single-task global windows).

A global `Window.orderBy(...)` moves every row to one task. These helpers
compute the same order-dependent quantities with the range-partition +
per-partition-offset pattern: rank/cumsum values are pure functions of the
total order, so partition boundaries never change the result, and no task
ever sorts more than its own range."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame, order_cols: list[str], value_cols: list[str]
) -> DataFrame:
    """Adds ``cum_<col>`` INCLUSIVE cumulative sums under the total order
    ``order_cols`` (which must be strict — no ties — for the row-framed
    running sum to be well-defined). Plan: range-partition on the order
    columns, running sum within each partition, plus per-partition offsets
    collected as P tiny rows and broadcast back."""
    ocols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(*ocols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin pid assignment across the two actions
    )
    totals = (
        ranged.groupBy("_pid")
        .agg(*[F.sum(c).cast("long").alias(c) for c in value_cols])
        .collect()
    )
    acc = {c: 0 for c in value_cols}
    rows = []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        rows.append((int(r["_pid"]), *[acc[c] for c in value_cols]))
        for c in value_cols:
            acc[c] += int(r[c] or 0)
    off_schema = "_pid int, " + ", ".join(f"_off_{c} long" for c in value_cols)
    off_df = df.sparkSession.createDataFrame(rows, off_schema)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged.join(F.broadcast(off_df), "_pid")
    for c in value_cols:
        out = out.withColumn(
            f"cum_{c}", F.sum(c).over(w).cast("long") + F.col(f"_off_{c}")
        )
    return out.drop("_pid", *[f"_off_{c}" for c in value_cols])
