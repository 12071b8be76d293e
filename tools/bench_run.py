"""Single bench run for the scaling protocol (launched via spark-submit
--py-files by tools/bench_scaling.py). Builds the deterministic synthetic
transcript graph (seed=42), runs PageRank at fixed superstep count, and
writes per-superstep timing JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--convs", type=int, default=50000)
    ap.add_argument("--tools", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--interval", type=int, default=4)
    ap.add_argument("--impl", default="expr", choices=["expr", "csr"])
    ap.add_argument("--no-compact", action="store_true",
                    help="disable int32 superstep ids (r5 default: auto-on)")
    ap.add_argument("--frac32", action="store_true",
                    help="store the static edge fraction as float32")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-aqe", action="store_true")
    ap.add_argument(
        "--cache-dir",
        default=None,
        help="write the derived vertex/edge tables to parquet here on first "
        "build and load them on later runs — the superstep metric only "
        "measures the (identical) cached out table, so reps and rungs can "
        "skip the deterministic synthesis cost",
    )
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from networkit_spark.session import get_spark

    # same conf surface as the engine's session factory (AQE + skew
    # thresholds + SHJ preference), so the scaling run measures the
    # production plan shape
    spark = get_spark(
        f"bench-scaling-{args.cores}",
        cores=args.cores,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.no_aqe:
        # the fixpoint loop pins its physical plan (SHJ hint, explicit
        # repartition, hub salting); AQE then only contributes per-exchange
        # materialization barriers between chained supersteps
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    from networkit_spark.edges import derive_edges
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.plans.checkpoint import CheckpointManager
    from networkit_spark.transcripts import synth_transcripts

    from networkit_spark.plans.checkpoint import materialize

    cache = None
    if args.cache_dir:
        import os as _os

        cache = _os.path.join(
            args.cache_dir, f"convs{args.convs}-tools{args.tools}"
        )
    if cache and _os.path.exists(_os.path.join(cache, "_BUILT")):
        vertices = spark.read.parquet(_os.path.join(cache, "vertices"))
        edges = spark.read.parquet(_os.path.join(cache, "edges"))
    else:
        t = synth_transcripts(
            spark, n_convs=args.convs, n_tools=args.tools, seed=42
        )
        vertices, edges = derive_edges(t)
        # materialize the derived tables ONCE: every downstream action
        # (degree cache, edge count, out-table build) would otherwise re-run
        # the whole synth->window->mint pipeline — build cost, not superstep
        # cost, but it multiplies wall-clock at low core counts
        vertices = materialize(vertices.select("id"))
        edges = materialize(edges)
        if cache:
            vertices.write.mode("overwrite").parquet(
                _os.path.join(cache, "vertices")
            )
            edges.write.mode("overwrite").parquet(_os.path.join(cache, "edges"))
            open(_os.path.join(cache, "_BUILT"), "w").write("ok")
            vertices = spark.read.parquet(_os.path.join(cache, "vertices"))
            edges = spark.read.parquet(_os.path.join(cache, "edges"))
    g = Graph(vertices, edges).with_cached_degrees()
    directed_edges = g.edges.count()

    # interval = truncation-block size: supersteps chain lazily inside a
    # block (one action per block), so blocks are the timing unit; the
    # first block is the warmup sample
    cp = CheckpointManager(
        tempfile.mkdtemp(prefix="bench-cp-"), durable=False, interval=args.interval
    )
    t0 = time.time()
    pagerank(g, tol=0.0, max_iterations=args.iters, checkpoint=cp,
             broadcast_scores=False, impl=args.impl,
             compact_ids=False if args.no_compact else None,
             frac32=args.frac32)
    total = time.time() - t0

    from networkit_spark.plans.checkpoint import per_superstep_seconds

    per_step, supersteps = per_superstep_seconds(cp.history, "pagerank")
    blocks = [
        (round(m["wall_ms"] / 1000.0, 4), int(m.get("steps", 1)))
        for m in cp.history
        if m["algo"] == "pagerank"
    ]
    out = {
        "impl": args.impl,
        "compact_ids": not args.no_compact,
        "frac32": args.frac32,
        "cores": args.cores,
        "convs": args.convs,
        "directed_edges": directed_edges,
        "supersteps": supersteps,
        "block_secs": blocks,
        "median_superstep_sec": round(per_step, 4),
        "edges_per_sec_per_superstep": round(directed_edges / per_step, 1),
        "total_sec": round(total, 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
