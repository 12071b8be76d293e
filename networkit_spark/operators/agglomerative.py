"""Parallel agglomerative community detection (ref: networkit/cpp/
community/ParallelAgglomerativeClusterer.cpp:20-95): repeat { score each
edge by the modularity delta of merging its endpoints
(scoring/ModularityScoring.hpp:64-73: w_uv/tw - (wdeg_u wdeg_v)/(2tw)^2),
match on the scored graph, contract matched pairs } until the graph stops
shrinking (diff <= 5e-3 n) or fewer than 2 communities remain; the final
contraction hierarchy projected back to the fine vertices is the
partition.

Spark composition of operators the engine already has: local_max_matching
(the deterministic distributed stand-in for the reference's sequential
PathGrowingMatcher — documented deviation, same maximal-matching
contract) and coarsen (ParallelPartitionCoarsening). Only
positive-modularity-gain edges are offered to the matcher: merging a
negative-gain pair can only lower modularity, and the reference's scored
matching favors the same pairs. Each level costs one scoring join, the
matching's supersteps, and one contraction shuffle.

weightedDegree here counts self-loops ONCE, matching the C++ default
used by ModularityScoring (Graph::weightedDegree without
countSelfLoopsTwice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def agglomerative_communities(
    graph: Graph,
    max_levels: int = 12,
    min_communities: int = 2,
    rel_repeat: float = 5e-3,
) -> DataFrame:
    """labels(id, label) — community per fine vertex (labels are coarse
    dense ids, contiguous like the reference's final Partition)."""
    from networkit_spark.operators.coarsening import coarsen
    from networkit_spark.operators.matching import local_max_matching

    g = graph.to_undirected() if graph.directed else graph
    mapping = graph.vertices.select("id", F.col("id").alias("label"))
    mapping = mapping.localCheckpoint(eager=True)

    for _ in range(max_levels):
        n = g.num_nodes()
        tw = g.total_edge_weight()
        if tw <= 0:
            break
        wdeg = (
            g.edges.groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("weight").cast("double")).alias("wd"))
        )
        canon = (
            g.edges.filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min(F.col("weight").cast("double")).alias("w"))
        )
        scored = (
            canon.join(wdeg.withColumnRenamed("id", "src").withColumnRenamed("wd", "ws"), "src")
            .join(wdeg.withColumnRenamed("id", "dst").withColumnRenamed("wd", "wt"), "dst")
            .select(
                "src", "dst",
                (
                    F.col("w") / F.lit(tw)
                    - F.col("ws") * F.col("wt") / F.lit((2.0 * tw) ** 2)
                ).alias("score"),
            )
            .filter(F.col("score") > 0)
        )
        sym = scored.select("src", "dst", F.col("score").alias("weight")).unionByName(
            scored.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                F.col("score").alias("weight"),
            )
        )
        sg = Graph(g.vertices, sym, directed=False, weighted=True)
        matching = local_max_matching(sg)
        if matching.limit(1).count() == 0:
            break
        pair_labels = matching.select(
            F.col("u").alias("id"), F.least("u", "v").alias("label")
        ).unionByName(
            matching.select(F.col("v").alias("id"), F.least("u", "v").alias("label"))
        )
        labels = (
            g.vertices.join(pair_labels, "id", "left")
            .select("id", F.coalesce("label", F.col("id")).alias("label"))
        )
        g2, fine_to_coarse = coarsen(g, labels)
        mapping = (
            mapping.join(
                fine_to_coarse.withColumnRenamed("id", "label"), "label"
            )
            .select("id", F.col("coarse_id").alias("label"))
            .localCheckpoint(eager=True)
        )
        cn = g2.num_nodes()
        g = g2
        if cn <= min_communities or (n - cn) <= rel_repeat * n:
            break
    return mapping
