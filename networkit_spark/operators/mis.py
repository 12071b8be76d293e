"""Maximal independent set — Luby's algorithm as hash-priority supersteps.

Reference: networkit/cpp/independentset/Luby.cpp:15-100 — rounds of
(randomly select candidates, drop the lower-priority endpoint of every
conflicting edge, add survivors to I, deactivate their neighborhoods) until
no active vertex remains. The reference draws per-round random bits
(Aux::Random); for cross-engine determinism we use the textbook
derandomization-by-seeded-hash: vertex v's round-r priority is the 48-bit
md5 of (seed, r, v) with id as tie-break, and v enters the set iff its
priority is the strict minimum of its active closed neighborhood. The
result satisfies the same contract Luby.cpp's isIndependentSet test checks
(independence + maximality); the set itself differs run-to-run in the
reference (random) but is a pure function of the seed here.

Spark-first plan per round: one join of the active edge list against the
active priority table + a min-aggregation on dst gives each vertex its
neighborhood minimum (map-side combined); winners and their neighbors leave
the active set via two anti-joins. The active edge table shrinks
geometrically, rounds are O(log n) w.h.p., and IterationState bounds the
plan like every other superstep loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState, materialize


def _priority(seed: int, rnd: int) -> F.Column:
    return F.expr(md5_long_sql(f"('{seed}:mis:{rnd}:' || CAST(id AS STRING))"))


def maximal_independent_set(
    graph: Graph,
    seed: int = 42,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, in_set: int 0/1) over every vertex — a maximal independent set
    of the simple undirected support, deterministic in ``seed``."""
    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession
    edges = materialize(
        g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    active_v = g.vertices.select("id")
    active_e = edges
    chosen = spark.createDataFrame([], "id long")

    state = IterationState(checkpoint, "mis")
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        pri = active_v.select("id", _priority(seed, rnd).alias("p"))
        # per active vertex: the min priority over active neighbors; a vertex
        # wins on a STRICT minimum (hash-equal neighbors both wait a round —
        # no tie-break needed, and both engines agree exactly)
        nbr_min = (
            active_e.join(
                pri.select(F.col("id").alias("src"), F.col("p").alias("np")), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("np").alias("m"))
        )
        winners = (
            pri.join(nbr_min, "id", "left")
            .filter(
                F.col("m").isNull()  # isolated active vertex -> always wins
                | (F.col("p") < F.col("m"))
            )
            .select("id")
        )
        # deactivate winners + their neighborhoods
        nbrs = active_e.join(
            winners.withColumnRenamed("id", "src"), "src", "semi"
        ).select(F.col("dst").alias("id"))
        gone = winners.unionByName(nbrs).distinct()
        new_active_v = active_v.join(gone, "id", "anti")
        new_active_v = state.advance(rnd, new_active_v)
        chosen = chosen.unionByName(winners)
        left = new_active_v.count()
        active_v = new_active_v
        active_e = (
            active_e.join(gone.withColumnRenamed("id", "src"), "src", "anti")
            .join(gone.withColumnRenamed("id", "dst"), "dst", "anti")
            .select("src", "dst")
        )
        if left == 0:
            break
    state.close()
    chosen = materialize(chosen)
    return graph.vertices.select("id").join(
        chosen.withColumn("in_set", F.lit(1)), "id", "left"
    ).fillna({"in_set": 0}).select("id", F.col("in_set").cast("int").alias("in_set"))
