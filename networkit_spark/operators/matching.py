"""Local-max (Preis) weighted matching as synchronous supersteps.

Reference: networkit/cpp/matching/LocalMaxMatcher.cpp:21-84 — repeat until
no edges remain: every vertex points at its heaviest remaining incident
edge; an edge both of whose endpoints point at it is locally dominant and
enters the matching; edges touching matched vertices are discarded. The
result is a maximal matching with weight >= 1/2 optimum (Preis 1999).

The reference breaks weight ties by perturbing weights with Aux::Random
(LocalMaxMatcher.cpp:37); for cross-engine determinism we use the strict
total order (weight, min(u,v), max(u,v)) on edges instead — every vertex
has a unique best edge, so the algorithm is schedule-independent and the
DuckDB oracle reproduces it exactly.

Spark-first plan per round (no Python anywhere):
  best(v)   = max_by over v's remaining incident directed rows — one
              map-side-combined aggregation on the adjacency key;
  matched   = canonical edges where best(src) == best(dst) == the edge —
              one self-agreement join;
  remaining = edges anti-joined against the new matched vertex set.
Rounds are O(log n) expected; IterationState bounds plan growth the same
way the components loop does. At scale each round shuffles only the
remaining-edge table, which shrinks geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState, materialize


def local_max_matching(
    graph: Graph,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """matching(u: long, v: long, weight: double) with u < v — the
    deterministic local-max matching of the undirected simple support.
    Self-loops are never matched (LocalMaxMatcher.cpp:64 u != v guard)."""
    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
    )
    remaining = materialize(canon)
    spark = remaining.sparkSession
    matched = spark.createDataFrame([], "u long, v long, weight double")

    state = IterationState(checkpoint, "matching")
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        # directed view: one row per (node, nbr, edge) of the remaining set
        d = remaining.select(
            F.col("u").alias("node"), F.col("v").alias("nbr"), "u", "v", "w"
        ).unionByName(
            remaining.select(
                F.col("v").alias("node"), F.col("u").alias("nbr"), "u", "v", "w"
            )
        )
        # each vertex's unique best edge under the (w, u, v) total order
        best = d.groupBy("node").agg(
            F.max(F.struct("w", "u", "v")).alias("b")
        ).select("node", F.col("b.u").alias("bu"), F.col("b.v").alias("bv"))
        # an edge is matched iff BOTH endpoints name it as their best
        agree = (
            remaining.join(
                best.select(F.col("node").alias("u"), F.col("bu").alias("u1"), F.col("bv").alias("v1")),
                "u",
            )
            .join(
                best.select(F.col("node").alias("v"), F.col("bu").alias("u2"), F.col("bv").alias("v2")),
                "v",
            )
            .filter(
                (F.col("u1") == F.col("u")) & (F.col("v1") == F.col("v"))
                & (F.col("u2") == F.col("u")) & (F.col("v2") == F.col("v"))
            )
            .select("u", "v", F.col("w").alias("weight"))
        )
        new_matched = matched.unionByName(agree)
        # drop every remaining edge touching a newly matched vertex
        mv = agree.select(F.col("u").alias("id")).unionByName(
            agree.select(F.col("v").alias("id"))
        )
        nxt = (
            remaining.join(mv.withColumnRenamed("id", "u"), "u", "anti")
            .join(mv.withColumnRenamed("id", "v"), "v", "anti")
            .select("u", "v", "w")
        )
        nxt = state.advance(rnd, nxt)
        left = nxt.count()
        matched = new_matched
        remaining = nxt
        if left == 0:
            break
    state.close()
    return materialize(matched.select("u", "v", "weight"))


def matching_weight(matching: DataFrame) -> float:
    """Total weight of a matching DataFrame (Matching.cpp::weight)."""
    return matching.agg(F.sum("weight")).first()[0] or 0.0
