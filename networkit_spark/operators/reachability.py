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


def all_simple_paths(
    graph: Graph, source: int, target: int, cutoff: int
) -> DataFrame:
    """(path: array<long>) — every simple path source ->* target with at
    most ``cutoff`` edges (reachability/AllSimplePaths.cpp:15-120 —
    directed, unweighted; the reference prunes expansion with a reverse
    BFS labelling distanceToTarget <= cutoff, and so does this plan).

    Frontier superstep: partial paths carry an array column; extension is
    one join on the tail vertex + a NOT array_contains simplicity filter
    + the reverse-distance prune — all JVM expressions. Path count is
    worst-case exponential (same as the reference); the cutoff and the
    prune are the bounds that matter."""
    if source == target:
        raise ValueError("source equals target")
    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    # reverse BFS from target: dtt(id) = hop distance to target, <= cutoff
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    spark = graph.vertices.sparkSession
    dtt = spark.createDataFrame([(int(target), 0)], "id long, dtt int")
    frontier = dtt
    for depth in range(1, cutoff + 1):
        nxt = (
            frontier.withColumnRenamed("id", "src")
            .join(rev, "src")
            .select(F.col("dst").alias("id"), F.lit(depth).alias("dtt"))
            .distinct()
            .join(dtt.select("id"), "id", "anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        dtt = dtt.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    reach = dtt.select("id", "dtt")

    paths = spark.createDataFrame(
        [([int(source)], int(source))], "path array<long>, last long"
    )
    done = []
    state = IterationState(None, "simple_paths")
    for ln in range(1, cutoff + 1):
        ext = (
            paths.withColumnRenamed("last", "src")
            .join(edges, "src")
            .filter(~F.array_contains(F.col("path"), F.col("dst")))
            .join(reach.withColumnRenamed("id", "dst"), "dst")
            .filter(F.col("dtt") <= cutoff - ln)
            .select(
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
                F.col("dst").alias("last"),
            )
        )
        ext = state.advance(ln, ext)
        done.append(ext.filter(F.col("last") == int(target)).select("path"))
        paths = ext.filter(F.col("last") != int(target))
        if ln < cutoff and paths.isEmpty():
            break
    state.close()
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return out
