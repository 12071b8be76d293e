"""Per-round bench harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the north rule's: directed-edge visits per second per
PageRank superstep at 1e-6 convergence (steady-state median, first superstep
excluded as warmup), measured on a deterministic synthetic transcript graph
(seed=42) large enough to exercise shuffles — the sf-dir event graph is also
timed for completeness. Scaling-efficiency evidence (local[8] vs local[32])
is produced by tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "500000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from networkit_spark.session import get_spark

    spark = get_spark("networkit-spark-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from networkit_spark import entry_queries as EQ
    from networkit_spark.edges import derive_edges
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import pagerank
    from networkit_spark.plans.checkpoint import CheckpointManager
    from networkit_spark.transcripts import synth_transcripts

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # ---- headline: PageRank superstep throughput on the synthetic
    # transcript graph (seed=42, deterministic at any parallelism) ----------
    t = synth_transcripts(spark, n_convs=n_convs, n_tools=64, seed=42)
    vertices, edges = derive_edges(t)
    from networkit_spark.plans.checkpoint import materialize

    vertices = materialize(vertices.select("id"))
    edges = materialize(edges)
    g = Graph(vertices, edges).with_cached_degrees()
    directed_edges = g.edges.count()

    # fixed superstep count: the metric is steady-state per-superstep
    # throughput; convergence-to-1e-6 superstep counts are data/scale
    # dependent (absolute L2 tol tightens per-vertex as n grows) and can
    # collapse to 1-2 samples, so throughput is sampled over a pinned loop.
    # 20 steps / interval 5 -> 4 truncation blocks: block 1 is warmup
    # (JIT/codegen, cache population), blocks 2-4 are steady samples.  The
    # headline `value` is the steady-state MEDIAN block (the r1-r3 protocol,
    # comparable across rounds); the BEST steady block — an upper-bound
    # capability estimate on this multi-tenant VM, where host contention
    # only subtracts throughput — is emitted separately and explicitly
    # named `..._best` (ADVICE r4: never compare best against historic
    # medians).  Every block's wall is in `detail` for transparency.
    n_steps = int(os.environ.get("SPARK_GRAFT_BENCH_STEPS", "20"))
    cp = CheckpointManager(
        tempfile.mkdtemp(prefix="bench-cp-"), durable=False, interval=5
    )
    t0 = time.time()
    pagerank(g, tol=0.0, max_iterations=n_steps, checkpoint=cp, broadcast_scores=False)
    timings["pagerank_synth_total"] = round(time.time() - t0, 3)

    blocks = [
        (m["wall_ms"] / 1000.0, int(m.get("steps", 1)))
        for m in cp.history
        if m["algo"] == "pagerank" and "wall_ms" in m
    ]
    supersteps = sum(s for _, s in blocks)
    steady = blocks[1:] if len(blocks) > 1 else blocks
    per_step = sorted(w / s for w, s in steady)
    med = per_step[len(per_step) // 2] if per_step else 0.0
    best = per_step[0] if per_step else 0.0
    edges_per_sec = directed_edges / med if med > 0 else 0.0
    edges_per_sec_best = directed_edges / best if best > 0 else 0.0

    # ---- sf-dir queries (the driver-contract surface) ---------------------
    # one untimed fixture-scale pass warms the events-derivation codegen
    # paths (window+mint+joins) so the first timed query isn't a JIT sample
    EQ.QUERIES["graph_degrees"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in [
        "graph_pagerank",
        "graph_components",
        "graph_labelprop",
        "graph_triangle_count",
        "graph_degrees",
        "dedup_minhash_bands",
        "dedup_simhash",
        "embed_cosine_topk",
        "text_token_stats",
        "events_sessionize",
    ]:
        fn = EQ.QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save())

    print(
        json.dumps(
            {
                "metric": "pagerank_edges_per_sec_per_superstep",
                "value": round(edges_per_sec, 1),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "detail": {
                    "synth_convs": n_convs,
                    "directed_edges": directed_edges,
                    "supersteps": supersteps,
                    "median_steady_superstep_sec": round(med, 4),
                    "best_steady_superstep_sec": round(best, 4),
                    "pagerank_edges_per_sec_per_superstep_best": round(
                        edges_per_sec_best, 1
                    ),
                    "block_secs": [[round(w, 3), s] for w, s in blocks],
                    "cores": cpus,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
