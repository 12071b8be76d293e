"""SparkSession factory with scale-aware defaults.

Defaults target the sandbox (local[32], 128 GiB) but every knob is the one
you would set on a 1000-executor cluster too: AQE for runtime re-planning
(partition coalescing + skew-join splitting), Arrow for vectorized
Python<->JVM transport, and shuffle partitions proportional to parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "networkit-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]; otherwise local[cores]. Shuffle partitions
    default to max(2*cores, 32): on a real cluster you would set this to
    ~2-3x total executor cores so AQE can coalesce down, never up.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default skew threshold (256 MB) never fires on hub-entity
        # partitions that are 10-40x the median but < 256 MB; a hub key
        # holding 2M of 43M edge rows is ~80 MB
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # AQE coalescing sizes partitions by BYTES; the text/dedup pipeline
        # is CPU-dense per byte (16 md5s per shingle), so the default 1 MB
        # floor squeezed those stages onto 1-3 tasks (measured 2-3x slower).
        # 64 KB only changes shuffles whose total size is tiny relative to
        # core count — for graph supersteps total/cores already exceeds the
        # floor, and sub-64 KB frontier tables still coalesce to one task.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # iterative supersteps re-join cached tables every round: the
        # sort-merge sort of the big side repeats per iteration, while a
        # shuffled-hash probe streams it (measured 6.6s vs 7.6s and the
        # gap widens with edge count)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # iterative algorithms re-join small score/label tables every
        # superstep; keep the broadcast threshold generous
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
