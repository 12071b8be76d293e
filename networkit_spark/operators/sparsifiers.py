"""Composed backbone sparsifiers — sparsification/Sparsifiers.cpp:33-135
and the target-ratio parameterization of sparsification.pyx:696-786.

Each named sparsifier is a thin composition of an existing edge-score
operator and GlobalThresholdFilter, exactly as the reference chains them.

``sparsify_to_ratio`` replaces the reference's BinarySearchParameterization
(sparsification.pyx:744-786 — up to maxSteps full filter+count probes of
the graph, one Spark job each) with a single distributed exact-rank pass:
rank edges under (score DESC, md5 tiebreak, src, dst) with the
range-partition cumsum and keep the top ceil(ratio*m). One job, no probe
loop, deterministic, and it lands exactly on the target size instead of
binary-searching toward it — the Spark-first form of the same API.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.sparsification import (
    canonical_edges,
    global_threshold_filter,
    local_similarity_score,
    random_edge_score,
    simmelian_overlap_score,
    tri_deg_base,
)


def _resym(graph: Graph, keep: DataFrame) -> Graph:
    """Kept canonical (src < dst) edges -> undirected Graph on the same
    vertex set (GlobalThresholdFilter.calculate output shape)."""
    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    kept = canon.join(keep.select("src", "dst"), ["src", "dst"], "semi")
    sym = kept.unionByName(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return Graph(graph.vertices, sym, directed=False, weighted=graph.weighted)


def sparsify_to_ratio(
    graph: Graph,
    scores: DataFrame,
    edge_ratio: float,
    seed: int = 42,
) -> Graph:
    """Keep the ceil(edge_ratio * m) highest-scored canonical edges —
    getSparsifiedGraphOfSize (sparsification.pyx:696) without the binary
    search. ``scores``: (src, dst, score). Ties broken by the
    deterministic md5 draw, then (src, dst)."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.functions.ordering import global_cumsum

    m = scores.count()
    k = int(math.ceil(edge_ratio * m))
    if k <= 0 or m == 0:
        return _resym(graph, scores.filter(F.lit(False)))
    tb = F.expr(
        md5_long_sql(
            f"('{seed}:ratio:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
        )
    )
    base = (
        scores.withColumn("_s", -F.col("score").cast("double"))
        .withColumn("_t", tb)
        .withColumn("_one", F.lit(1))
    )
    ranked = global_cumsum(base, ["_s", "_t", "src", "dst"], ["_one"])
    return _resym(graph, ranked.filter(F.col("cum__one") <= k))


def simmelian_sparsifier_non_parametric(
    graph: Graph, threshold: float = 0.5, base: DataFrame | None = None
) -> Graph:
    """Sparsifiers.cpp:33-48: prefix-Jaccard over per-edge triangle counts,
    keep score >= threshold."""
    from networkit_spark.operators.edgescores import prefix_jaccard_score

    e = tri_deg_base(graph) if base is None else base
    tri = e.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("tri").cast("double").alias("score"),
    )
    pj = prefix_jaccard_score(tri).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.col("pj_score").alias("score"),
    )
    return global_threshold_filter(graph, pj, threshold, above=True)


def simmelian_sparsifier_parametric(
    graph: Graph,
    max_rank: int = 10,
    min_overlap: int = 5,
    base: DataFrame | None = None,
) -> Graph:
    """Sparsifiers.cpp:51-67: Simmelian overlap, keep >= min_overlap."""
    ov = simmelian_overlap_score(graph, max_rank=max_rank, base=base)
    return global_threshold_filter(graph, ov, float(min_overlap), above=True)


def multiscale_sparsifier(graph: Graph, alpha: float = 0.5) -> Graph:
    """Sparsifiers.cpp:70-87: multiscale backbone over the edge WEIGHTS,
    keep probability >= alpha."""
    from networkit_spark.operators.edgescores import multiscale_score

    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "weight",
        )
        .groupBy("u", "v")
        .agg(F.max("weight").cast("double").alias("score"))
    )
    ms = multiscale_score(canon).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.col("ms_score").alias("score"),
    )
    return global_threshold_filter(graph, ms, alpha, above=True)


def simmelian_multiscale_sparsifier(
    graph: Graph, alpha: float = 0.5, base: DataFrame | None = None
) -> Graph:
    """Sparsifiers.cpp:105-121: multiscale backbone over the per-edge
    TRIANGLE counts, keep >= alpha."""
    from networkit_spark.operators.edgescores import multiscale_score

    e = tri_deg_base(graph) if base is None else base
    tri = e.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("tri").cast("double").alias("score"),
    )
    ms = multiscale_score(tri).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.col("ms_score").alias("score"),
    )
    return global_threshold_filter(graph, ms, alpha, above=True)


def local_similarity_sparsifier(
    graph: Graph, e: float = 0.5, base: DataFrame | None = None
) -> Graph:
    """Sparsifiers.cpp:90-103: local-similarity rank exponents, keep >= e."""
    ls = local_similarity_score(graph, base=base)
    return global_threshold_filter(graph, ls, e, above=True)


def random_sparsifier(graph: Graph, ratio: float, seed: int = 42) -> Graph:
    """Sparsifiers.cpp:123-135: uniform random score, keep >= ratio —
    reproduced as-is (the reference keeps the ~(1-ratio) fraction; its
    naming quirk, not ours)."""
    rs = random_edge_score(graph, seed=seed)
    return global_threshold_filter(graph, rs, ratio, above=True)
