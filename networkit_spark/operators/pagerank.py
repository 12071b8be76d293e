"""Power-iteration PageRank with the reference's exact semantics.

Reference: networkit/cpp/centrality/PageRank.cpp (108 LoC) and
include/networkit/centrality/PageRank.hpp:38-65. Semantics reproduced:

1. init score[v] = 1/n; teleport = (1-damp)/n                 (PageRank.cpp:23-24)
2. deg[v] = weightedDegree over out-edges (incl. self-loop 2x
   when undirected)                                           (PageRank.cpp:28)
3. pull over in-edges (== out-edges when undirected):
   pr[u] = teleport + damp * sum_{(v->u)} score[v]*w/deg[v]   (PageRank.cpp:54-63)
4. dangling mass NOT redistributed during iteration
   (Newman's definition, PageRank.cpp:57-59)
5. convergence ||pr - score||_2 <= tol (or L1), capped by
   maxIterations                                              (PageRank.cpp:32-49)
6. final normalization: default divide by total sum; normalized=True
   divides by (1/n)((1-damp) + damp*sum_dangling)             (PageRank.cpp:73-89)

Execution has two shapes:

* tol > 0 (convergence mode): one materializing action per superstep (the
  delta check), old score carried through the step projection.
* tol == 0 (fixed-iteration mode, the scale/bench path): supersteps are
  chained LAZILY — zero-contribution self-rows make the dst aggregation
  vertex-complete so each superstep is join + agg + projection referencing
  the previous vector exactly once, and the only actions are one per
  `interval` block (lineage truncation / durable snapshot). This removes
  the per-superstep scheduling + eager-localCheckpoint floor that capped
  scaling efficiency at 0.55 (2->8 cores) in round 1, and lets
  ReusedExchange serve the static edge-side shuffle across the chained
  supersteps of a block.

Spark-first plan: one superstep = broadcast-or-shuffle hash join of the
(static, persisted) normalized out-edge table with the current score vector,
then a partial+final hash aggregation on dst — Catalyst's map-side combine
is the analogue of the reference's per-thread accumulation.

Hub-vertex skew (north star: "explicit salted repartitioning for hub-vertex
skew"): the transcript graph's role/tool vertices have out-degree O(n_convs)
(a single role holds ~n edges — 3x a whole average partition at bench
scale), so hash-partitioning the static out table by src alone leaves hub
partitions whose probe CPU straggles every superstep (event-log measured:
p50 1.15s / max 6.35s per task, steady-block concurrency 14.6 of 32 cores).
AQE skew splitting cannot help: splitting the cached build-side partition
would break the co-partitioning the chained supersteps rely on. Instead the
fast path salts ONCE at build time: srcs whose out-row count exceeds
total/(2*n_part) get their edges split over ceil(count/thresh) salt values
by hash(dst); per superstep the (vertex-sized) score vector replicates ONLY
the hub rows (|hubs| <= 2*n_part by construction — a provably tiny
broadcast), and the join runs on (src, salt). balancedParallelForNodes
(Graph.hpp:1788) is the reference's shared-memory counterpart.

The convergence check is the only extra action per iteration. Plan growth is
cut by IterationState (persist i / unpersist i-1 / checkpoint every k).
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState


def pagerank(
    graph: Graph,
    damp: float = 0.85,
    tol: float = 1e-8,
    norm: str = "l2",
    max_iterations: int | None = None,
    normalized: bool = False,
    checkpoint: CheckpointManager | None = None,
    resume: bool = False,
    impl: str = "expr",
    num_blocks: int | None = None,
    broadcast_scores: bool | None = None,
    hub_salt_threshold: int | None = None,
    compact_ids: bool | None = None,
    frac32: bool = False,
) -> DataFrame:
    """Return scores(id: long, score: double), sum-normalized.

    ``max_iterations=None`` iterates to tolerance (reference default is
    unbounded, PageRank.hpp:62). With a durable ``checkpoint`` and
    ``resume=True`` the loop restarts from the latest complete iteration.

    ``impl="expr"`` runs the pure-DataFrame superstep (join + hash agg,
    whole-stage codegen); ``impl="csr"`` runs the north star's CSR-block
    gather-scatter (networkit_spark.blocks) — same fixed point, asserted
    equal to 1e-12 by tests/test_csr_blocks.py.

    ``broadcast_scores`` hints the per-superstep edges⋈scores join to
    broadcast the (vertex-sized) score vector — the checkpointed score DF
    has no stats, so Catalyst can't pick this itself. None = auto: broadcast
    when n <= 4M (a ~100 MB broadcast ceiling; entity vertex sets are orders
    of magnitude smaller than the edge table they join). With broadcast, the
    only per-superstep shuffle is the partial+final dst aggregation.

    ``compact_ids`` stores src/dst as INT32 in the fast path's static out
    table and runs the whole superstep chain on int ids (lossless — auto
    on when every vertex id fits int32, which dense-minted entity graphs
    always satisfy; forced off for impl="csr", whose block kernels take
    long ids). Halves the id bytes streamed through the columnar cache
    scan each superstep — the DRAM-stall lever the r4 bandwidth
    accounting identified. ``frac32`` additionally stores the static edge
    fraction as FLOAT32 (quarter the bytes of double): the per-edge
    relative error is <= 6e-8 so converged scores stay well inside the
    north rule's 1e-6, but the 6-decimal oracle gate keeps the default
    double.
    """
    spark = graph.vertices.sparkSession
    if tol <= 0.0 and max_iterations is None:
        raise ValueError("tol <= 0 requires max_iterations (no convergence check runs)")
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")
    teleport = (1.0 - damp) / n

    deg = graph.degrees()
    # static per-edge fraction w/deg(src); deg==0 rows can't exist as src
    out = (
        graph.edges.alias("e")
        .join(deg.filter(F.col("wdeg") > 0).alias("d"), F.col("e.src") == F.col("d.id"))
        .select(
            F.col("e.src").alias("src"),
            F.col("e.dst").alias("dst"),
            (F.col("e.weight").cast("double") / F.col("d.wdeg")).alias("frac"),
        )
    )
    fast_path = tol <= 0.0
    compact = bool(compact_ids) if compact_ids is not None else False
    if fast_path and compact_ids is None and impl != "csr":
        b = graph.vertices.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).first()
        compact = (
            b["lo"] is not None
            and b["lo"] >= -(2**31)
            and b["hi"] < 2**31
        )
    if impl == "csr":
        compact = False
    idt = "int" if compact else "long"
    if fast_path:
        # fixed-iteration fast path: append one zero-contribution self-row
        # per vertex so the post-join dst aggregation is vertex-complete BY
        # CONSTRUCTION. This removes the scores-left-join that carried the
        # vertex list (and the old score) — each superstep then references
        # the previous scores exactly once, the logical plan grows linearly,
        # and supersteps can be chained LAZILY: no per-iteration action, no
        # per-iteration eager localCheckpoint (the ~4s/superstep fixed cost
        # behind round 1's 0.55 scaling efficiency at 2->8 cores), lineage
        # truncated only every `interval` supersteps. Within the chained
        # job the static out-side exchange is identical each superstep, so
        # Spark's ReusedExchange serves it from the first shuffle.
        out = out.unionByName(
            graph.vertices.select(
                F.col("id").alias("src"),
                F.col("id").alias("dst"),
                F.lit(0.0).alias("frac"),
            )
        )
        if compact or frac32:
            out = out.select(
                F.col("src").cast(idt).alias("src"),
                F.col("dst").cast(idt).alias("dst"),
                F.col("frac").cast("float" if frac32 else "double").alias("frac"),
            )
        # pre-shuffle the static side ONCE: cut the deep derivation plan
        # (localCheckpoint), then repartition+persist the SHALLOW scan —
        # the InMemoryRelation keeps hashpartitioning(src, P), so the
        # superstep join re-exchanges only the (vertex-sized) score vector
        # and the edge-sized shuffle happens once per RUN. (A checkpointed
        # RDD alone loses outputPartitioning — Scan ExistingRDD gets an
        # ENSURE_REQUIREMENTS exchange per superstep, measured as the
        # scaling-efficiency killer at 43M edges; and persisting the deep
        # AQE pipeline directly makes every cache scan ~10x slower.) This
        # is the single-machine analogue of bucketing the adjacency.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        out = out.localCheckpoint(eager=True)
        # ---- hub-salt analysis (one pass over the static table) ----------
        # hubs = srcs whose out-row count exceeds half a mean partition;
        # |hubs| <= total/thresh <= 2*n_part rows by construction, so the
        # hub table is provably tiny at ANY scale (10^12 edges / 10^5
        # partitions -> thresh 5M, <= 2*10^5 hub rows).
        total_rows = out.count()
        thresh = hub_salt_threshold
        if thresh is None:
            thresh = max(50_000, total_rows // n_part // 2)
        hub_rows = (
            out.groupBy("src")
            .count()
            .filter(F.col("count") > thresh)
            .select(
                "src",
                F.least(
                    F.lit(n_part), F.ceil(F.col("count") / F.lit(thresh))
                ).cast("int").alias("nsalt"),
            )
            .collect()
        )
        hub_df = None
        part_cols = ["src"]
        if hub_rows:
            hub_df = spark.createDataFrame(hub_rows, f"src {idt}, nsalt int")
            out = (
                out.join(F.broadcast(hub_df), "src", "left")
                .withColumn(
                    "salt",
                    F.when(F.col("nsalt").isNull(), F.lit(0)).otherwise(
                        F.pmod(F.xxhash64("dst"), F.col("nsalt")).cast("int")
                    ),
                )
                .drop("nsalt")
            )
            part_cols = ["src", "salt"]
        out = out.repartition(n_part, *part_cols).persist()
        out.count()
    else:
        from networkit_spark.plans.checkpoint import materialize

        out = materialize(out)  # compute once; scanned every superstep

    csr = None
    if impl == "csr":
        from networkit_spark.blocks import CsrBlocks

        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions"))
        csr = CsrBlocks.build(out, num_blocks, val_col="frac")

    if broadcast_scores is None:
        # measured on 43M edges / 2M vertices (local[32]): broadcast join
        # 4.3s vs shuffle SMJ 7.6s vs SHJ 6.6s per superstep — the score
        # vector is small relative to the edge table it joins at any
        # entity-graph scale; ~100 MB broadcast is the cluster ceiling
        broadcast_scores = n <= 4_000_000

    it0 = 0
    if resume and checkpoint is not None:
        last = checkpoint.latest_complete_iteration("pagerank")
        if last is not None:
            # durable snapshots persist the full step (id, score[, old])
            scores = checkpoint.load_state(spark, "pagerank", last).select(
                F.col("id").cast(idt).alias("id"), "score"
            )
            it0 = last
        else:
            scores = graph.vertices.select(
                F.col("id").cast(idt).alias("id"), F.lit(1.0 / n).alias("score")
            )
    else:
        scores = graph.vertices.select(
            F.col("id").cast(idt).alias("id"), F.lit(1.0 / n).alias("score")
        )

    state = IterationState(checkpoint, "pagerank", start_iteration=it0)
    scores = state.advance(it0, scores)

    iteration = it0
    if fast_path:
        # lazily-chained supersteps; a single action per `interval` block
        t_block = time.time()
        block_start = it0
        while iteration - it0 < max_iterations:
            iteration += 1
            if csr is not None:
                msgs = csr.gather_sum(
                    scores.select(F.col("id").alias("src"), F.col("score").alias("value"))
                ).withColumnRenamed("id", "dst")
            else:
                sc = scores.withColumnRenamed("id", "src")
                if hub_df is not None:
                    # replicate ONLY hub scores across their salt range —
                    # codegen explode before the exchange; adds |hubs| *
                    # (nsalt-1) rows (<= 2*n_part*n_part) to the
                    # vertex-sized exchange
                    sc = (
                        sc.join(F.broadcast(hub_df), "src", "left")
                        .withColumn(
                            "salt",
                            F.explode(
                                F.sequence(
                                    F.lit(0),
                                    F.coalesce(F.col("nsalt") - 1, F.lit(0)),
                                )
                            ),
                        )
                        .drop("nsalt")
                    )
                if broadcast_scores:
                    sc = F.broadcast(sc)
                else:
                    # pin the distributed strategy AND the score-side
                    # partition count: an explicit repartition by the join
                    # keys at n_part is exempt from AQE coalescing, so both
                    # sides present HashPartitioning(part_cols, n_part) and
                    # the cached edge side is probed with NO exchange (AQE
                    # coalescing the implicit score exchange to fewer
                    # partitions forced a one-time 90M-row re-exchange of
                    # the edge side, event-log measured). Without the SHJ
                    # hint AQE auto-broadcasts the vertex-sized vector
                    # under 64 MB — a driver-serial build per superstep.
                    sc = sc.repartition(n_part, *part_cols).hint("shuffle_hash")
                msgs = (
                    out.join(sc, part_cols)
                    .groupBy("dst")
                    .agg(F.sum(F.col("score") * F.col("frac")).alias("mass"))
                )
            # the zero self-rows make msgs vertex-complete: the new vector
            # is a pure projection, no second scores reference
            scores = msgs.select(
                F.col("dst").alias("id"),
                (F.lit(teleport) + F.lit(damp) * F.col("mass")).alias("score"),
            )
            if (
                (iteration - it0) % state.interval == 0
                or iteration - it0 >= max_iterations
            ):
                scores = state.advance(iteration, scores)
                if checkpoint is not None:
                    steps = iteration - block_start
                    checkpoint.record(
                        "pagerank",
                        iteration,
                        steps=steps,
                        wall_ms=(time.time() - t_block) * 1000.0,
                    )
                t_block = time.time()
                block_start = iteration
    else:
        while True:
            iteration += 1
            t0 = time.time()
            if csr is not None:
                msgs = csr.gather_sum(
                    scores.select(F.col("id").alias("src"), F.col("score").alias("value"))
                ).withColumnRenamed("id", "dst")
            else:
                sc = scores.withColumnRenamed("id", "src")
                if broadcast_scores:
                    sc = F.broadcast(sc)
                msgs = (
                    out.join(sc, "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("score") * F.col("frac")).alias("mass"))
                )
            # scores is vertex-complete, so it IS the vertex list: one left
            # join builds the new vector AND carries the old score, making
            # the convergence check a scan of the materialized step (no
            # extra join)
            step = (
                scores.withColumnRenamed("score", "old")
                .join(msgs.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    (
                        F.lit(teleport)
                        + F.lit(damp) * F.coalesce(F.col("mass"), F.lit(0.0))
                    ).alias("score"),
                    "old",
                )
            )
            step = state.advance(iteration, step)

            diff = F.col("score") - F.col("old")
            delta_expr = F.sum(diff * diff) if norm == "l2" else F.sum(F.abs(diff))
            delta = step.agg(delta_expr.alias("d")).first()["d"] or 0.0
            if norm == "l2":
                delta = math.sqrt(delta)
            new = step.select("id", "score")

            if checkpoint is not None:
                checkpoint.record(
                    "pagerank",
                    iteration,
                    delta=float(delta),
                    wall_ms=(time.time() - t0) * 1000.0,
                )
            scores = new
            if delta <= tol or (
                max_iterations is not None and iteration - it0 >= max_iterations
            ):
                break

    if compact:
        scores = scores.select(F.col("id").cast("long").alias("id"), "score")
    if normalized:
        # (1/n) * ((1-damp) + damp * sum over dangling vertices) — PageRank.cpp:80-89
        dangling_sum = (
            scores.join(deg.filter(F.col("wdeg") <= 0).select("id"), "id", "semi")
            .agg(F.sum("score"))
            .first()[0]
            or 0.0
        )
        denom = (1.0 / n) * ((1.0 - damp) + damp * dangling_sum)
    else:
        denom = scores.agg(F.sum("score")).first()[0] or 1.0

    result = scores.select("id", (F.col("score") / F.lit(denom)).alias("score"))
    # snapshot before releasing cached state
    result = result.localCheckpoint(eager=True)
    state.close()
    if csr is not None:
        csr.unpersist()
    if checkpoint is not None:
        checkpoint.flush_metrics(spark)
    return result


def ranking(scores: DataFrame, k: int | None = None) -> DataFrame:
    """(id, score) ordered by (score desc, id asc) — Centrality::ranking
    (networkit/cpp/centrality/Centrality.cpp:30-42); limit(k) for top-k."""
    r = scores.orderBy(F.desc("score"), F.asc("id"))
    return r.limit(k) if k is not None else r
