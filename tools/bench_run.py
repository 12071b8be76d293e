"""Single bench run for the scaling protocol (launched via spark-submit
--py-files by tools/bench_scaling.py). Builds the deterministic synthetic
transcript graph (seed=42), runs PageRank at fixed superstep count, and
writes per-superstep timing JSON to --out.
"""

from __future__ import annotations

import argparse
import json
import statistics
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--convs", type=int, default=50000)
    ap.add_argument("--tools", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from networkit_spark.session import get_spark

    # same conf surface as the engine's session factory (AQE + skew
    # thresholds + SHJ preference), so the scaling run measures the
    # production plan shape
    spark = get_spark(f"bench-scaling-{args.cores}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    from networkit_spark.edges import derive_edges
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.plans.checkpoint import CheckpointManager
    from networkit_spark.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_convs=args.convs, n_tools=args.tools, seed=42)
    vertices, edges = derive_edges(t)
    g = Graph(vertices.select("id"), edges).with_cached_degrees()
    directed_edges = g.edges.count()

    cp = CheckpointManager(tempfile.mkdtemp(prefix="bench-cp-"), durable=False)
    t0 = time.time()
    pagerank(g, tol=0.0, max_iterations=args.iters, checkpoint=cp)
    total = time.time() - t0

    walls = [m["wall_ms"] / 1000.0 for m in cp.history if m["algo"] == "pagerank"]
    steady = walls[1:] if len(walls) > 1 else walls
    med = statistics.median(steady)
    out = {
        "cores": args.cores,
        "convs": args.convs,
        "directed_edges": directed_edges,
        "supersteps": len(walls),
        "superstep_secs": [round(w, 4) for w in walls],
        "median_superstep_sec": round(med, 4),
        "edges_per_sec_per_superstep": round(directed_edges / med, 1),
        "total_sec": round(total, 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
