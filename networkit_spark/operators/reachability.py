"""Reachable-node counts on directed graphs.

Reference: networkit/cpp/reachability/ReachableNodes.cpp:15-77 — exact
mode runs one BFS per node and counts visits (numberOfReachableNodes(u) =
|{v : u ->* v}|, including u itself); estimate mode returns lower/upper
bounds from SCC + hub sampling.

Spark-first design splits the same way:
- exact_reachable_nodes: all-pairs closure as frontier supersteps — the
  pair table (s, v) grows by one edge-hop per round with an anti-join
  dedupe, i.e. a DISTINCT-semiring semi-naive Datalog evaluation. The
  closure is O(n^2) rows in the worst case: this is the gate/fixture path
  and says so, exactly like the reference's exact mode is O(n*m).
- approx_reachable_nodes: the 100 TB path — Flajolet-Martin reach sketches
  (same mask machinery as operators/anf.py, same derandomized geometric
  bit law) propagated along REVERSED edges, so a node's mask accumulates
  everything its out-edges can reach; the FM estimate replaces the
  reference's bound pair (documented deviation: one consistent estimator
  instead of [low, high]).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import (
    fm_init_mask_sql,
    lowest_unset_bit_pos_sql,
    md5_long_sql,
)
from networkit_spark.graph import Graph
from networkit_spark.operators.anf import FM_CORRECTION
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState, materialize


def exact_reachable_nodes(
    graph: Graph,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """(id, reachable) — |{v : id ->* v}| counting id itself. Semi-naive
    closure: rounds = directed eccentricity, shuffles touch only the new
    frontier pairs each round."""
    edges = materialize(graph.edges.select("src", "dst").distinct())
    pairs = materialize(
        graph.vertices.select(F.col("id").alias("s"), F.col("id").alias("v"))
    )
    frontier = pairs
    state = IterationState(checkpoint, "reach")
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        stepped = (
            frontier.join(edges.withColumnRenamed("src", "v"), "v")
            .select("s", F.col("dst").alias("v"))
            .distinct()
        )
        new = stepped.join(pairs, ["s", "v"], "anti")
        new = state.advance(rnd, new)
        if new.isEmpty():
            break
        pairs = materialize(pairs.unionByName(new))
        frontier = new
    state.close()
    return pairs.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("reachable")
    )


def approx_reachable_nodes(
    graph: Graph,
    k: int = 8,
    r: int = 7,
    seed: int = 42,
    max_h: int = 32,
) -> DataFrame:
    """(id, est) — FM estimate of the reachable-set size (self included).
    One superstep = reversed-edge join + bit_or aggregation per mask
    column, all JVM-side; masks are monotone so convergence needs no
    active-set bookkeeping."""
    n = graph.num_nodes()
    width = math.ceil(math.log2(max(n, 2))) + r
    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    mcols = [f"m{j}" for j in range(k)]
    init = [
        F.expr(
            fm_init_mask_sql(
                md5_long_sql(f"('{seed}:reach:{j}:' || CAST(id AS STRING))"), width
            )
        ).alias(mcols[j])
        for j in range(k)
    ]
    masks = materialize(graph.vertices.select("id", *init))
    state = IterationState(None, "reach_fm")
    for h in range(1, max_h + 1):
        # node <- OR of its OUT-neighbors' masks (reach set grows forward)
        nbr = (
            edges.join(masks.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.expr(f"bit_or({c})").alias(f"n_{c}") for c in mcols])
        )
        masks = masks.join(nbr, "id", "left").select(
            "id",
            *[
                F.expr(f"{c} | COALESCE(n_{c}, CAST(0 AS BIGINT))").alias(c)
                for c in mcols
            ],
        )
        masks = state.advance(h, masks)
    state.close()
    b_sum = "(" + " + ".join(lowest_unset_bit_pos_sql(c) for c in mcols) + ")"
    return masks.select(
        "id",
        F.expr(
            f"POWER(2, CAST({b_sum} AS DOUBLE) / {k}) / {FM_CORRECTION}"
        ).alias("est"),
    )
