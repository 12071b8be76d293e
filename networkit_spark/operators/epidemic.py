"""SEIR epidemic simulation as synchronous supersteps.

Reference: networkit/cpp/simulation/EpidemicSimulationSEIR.cpp:18-105 —
states S/E/I/R with timestamps; per step t: an exposed node becomes
infectious after eTime steps, an infectious node contacts every neighbor
(a susceptible contact becomes exposed with probability transP) and is
removed after iTime steps; after each sweep a census of the four
populations is recorded as rows (zero, t, state, count) for t < tMax.

The reference's parallelForNodes sweep is racy (a node promoted E→I mid-
sweep may or may not contact in the same sweep, and Aux::Random draws are
order-dependent) — its own test only checks population monotonicity. We
define the synchronous-deterministic variant: all transitions read the
state at the START of step t, and the per-(step, infector, target)
Bernoulli(transP) draw is a seeded 48-bit md5 threshold, so both engines
replay the epidemic exactly.

Spark-first plan: state is one row per node (id, st, ts); a step is one
semi-join (infectious frontier × edges, hash-filtered) + one projection;
census rows are per-step groupBy counts unioned and materialized once.
Only the infectious frontier joins the edge table, so a step's cost is
proportional to the epidemic's active surface, not the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState

S, E, I, R = 0, 1, 2, 3


def seir_simulation(
    graph: Graph,
    zero: int,
    t_max: int = 8,
    trans_p: float = 0.5,
    e_time: int = 2,
    i_time: int = 7,
    seed: int = 42,
) -> DataFrame:
    """(t, state, population) for t = 0..t_max-1 and state in {0:S, 1:E,
    2:I, 3:R}, the census after each synchronous sweep (patient ``zero``
    starts infectious at t=0)."""
    g = graph.to_undirected() if graph.directed else graph
    edges = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()

    state = g.vertices.select(
        "id",
        F.when(F.col("id") == zero, F.lit(I)).otherwise(F.lit(S)).alias("st"),
        F.lit(0).cast("int").alias("ts"),
    )
    it = IterationState(None, "seir")
    state = it.advance(0, state)

    cut = int(trans_p * (2**48))
    snaps: list[DataFrame] = []
    for t in range(t_max):
        hit = F.expr(
            md5_long_sql(
                f"('{seed}:sir:{t}:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
            )
        )
        exposed = (
            state.filter(F.col("st") == I)
            .select(F.col("id").alias("src"))
            .join(edges, "src")
            .filter(hit <= F.lit(cut))
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        state = (
            state.join(exposed.withColumn("hit", F.lit(True)), "id", "left")
            .select(
                "id",
                F.when((F.col("st") == S) & F.col("hit"), F.lit(E))
                .when((F.col("st") == E) & (F.lit(t) - F.col("ts") >= e_time), F.lit(I))
                .when((F.col("st") == I) & (F.lit(t) - F.col("ts") >= i_time), F.lit(R))
                .otherwise(F.col("st"))
                .alias("st"),
                F.when(
                    ((F.col("st") == S) & F.col("hit"))
                    | ((F.col("st") == E) & (F.lit(t) - F.col("ts") >= e_time))
                    | ((F.col("st") == I) & (F.lit(t) - F.col("ts") >= i_time)),
                    F.lit(t),
                )
                .otherwise(F.col("ts"))
                .cast("int")
                .alias("ts"),
            )
        )
        state = it.advance(t + 1, state)
        counts = state.groupBy("st").agg(F.count(F.lit(1)).alias("population"))
        snaps.append(
            counts.select(
                F.lit(t).cast("int").alias("t"),
                F.col("st").cast("int").alias("state"),
                F.col("population").cast("long").alias("population"),
            )
        )
    it.close()
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    # census rows exist for all four states even when a population is 0
    spark = graph.vertices.sparkSession
    grid = spark.range(t_max).select(F.col("id").cast("int").alias("t")).crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("state"))
    )
    return (
        grid.join(out, ["t", "state"], "left")
        .fillna({"population": 0})
        .orderBy("t", "state")
    )
