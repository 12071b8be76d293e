"""Algebraic distance on graphs.

Reference: networkit/cpp/distance/AlgebraicDistance.cpp:24-140 —
``numSystems`` random test vectors in [0,1) are Jacobi-smoothed for
``numIters`` rounds: x_u <- (1-omega)*x_u + omega * (sum_v w_uv x_v /
sum_v w_uv); each system is then affinely normalized by
(min - x)/(min - max); the per-edge distance is the Lp norm (p=0 ->
max) of the per-system differences. NaN distances (isolated endpoints)
clamp to 0 like the reference's final isnan guard.

Spark-first design: the random init is hash-derandomized
(functions/hashing md5 -> unit interval — pure function of (seed,
system, id), identical in the DuckDB oracle); systems live as k DOUBLE
columns of ONE DataFrame, so each smoothing round is one edge join +
one aggregation regardless of k, fully JVM-side. Per-superstep shuffle
is O(m) rows x k columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize

UNIT = float(1 << 48)


def algebraic_loads(
    graph: Graph,
    num_systems: int = 4,
    num_iters: int = 5,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(id, x0..x{k-1}) — normalized smoothed loads."""
    cols = [f"x{j}" for j in range(num_systems)]
    init = [
        (
            F.expr(md5_long_sql(f"('{seed}:ad:{j}:' || CAST(id AS STRING))"))
            / F.lit(UNIT)
        ).alias(cols[j])
        for j in range(num_systems)
    ]
    loads = materialize(graph.vertices.select("id", *init))
    adj = materialize(graph.edges.select("src", "dst", "weight"))
    state = IterationState(None, "algdist")
    for t in range(1, num_iters + 1):
        nbr = (
            adj.join(loads.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                *[F.sum(F.col("weight") * F.col(c)).alias(f"v_{c}") for c in cols],
                F.sum("weight").alias("ws"),
            )
        )
        loads = loads.join(nbr, "id", "left").select(
            "id",
            *[
                F.when(
                    F.col("ws").isNotNull(),
                    (1.0 - omega) * F.col(c) + omega * F.col(f"v_{c}") / F.col("ws"),
                )
                .otherwise(F.col(c))
                .alias(c)
                for c in cols
            ],
        )
        loads = state.advance(t, loads)
    state.close()
    mm = loads.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    )
    return loads.crossJoin(F.broadcast(mm)).select(
        "id",
        *[
            ((F.col(f"mn_{c}") - F.col(c)) / (F.col(f"mn_{c}") - F.col(f"mx_{c}"))).alias(c)
            for c in cols
        ],
    )


def algebraic_distance_edge_scores(
    graph: Graph,
    num_systems: int = 4,
    num_iters: int = 5,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, ad) — one row per canonical edge (src <= dst on
    undirected input), Lp distance between endpoint load vectors."""
    cols = [f"x{j}" for j in range(num_systems)]
    loads = materialize(
        algebraic_loads(graph, num_systems, num_iters, omega, seed)
    )
    fe = graph.edges.select("src", "dst")
    if not graph.directed:
        fe = fe.filter(F.col("src") <= F.col("dst"))
    fe = fe.distinct()
    a = loads.select(
        F.col("id").alias("src"), *[F.col(c).alias(f"a_{c}") for c in cols]
    )
    b = loads.select(
        F.col("id").alias("dst"), *[F.col(c).alias(f"b_{c}") for c in cols]
    )
    joined = fe.join(a, "src").join(b, "dst")
    diffs = [F.abs(F.col(f"a_{c}") - F.col(f"b_{c}")) for c in cols]
    if norm == 0:
        dist = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    else:
        s = diffs[0] ** float(norm)
        for d in diffs[1:]:
            s = s + d ** float(norm)
        dist = s ** (1.0 / norm)
    return joined.select(
        "src", "dst", F.coalesce(F.nanvl(dist, F.lit(0.0)), F.lit(0.0)).alias("ad")
    )
