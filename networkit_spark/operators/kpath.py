"""K-path centrality: randomized self-avoiding-walk visit estimator.

Reference: networkit/cpp/centrality/KPathCentrality.cpp:34-105 — t
random walks; each picks a uniform start s and a length l in [1, k],
then walks self-avoidingly: at each step the next node is drawn from the
UNEXPLORED neighbors with probability proportional to 1/w(edge) (the
reference's weighted branch; uniform when all weights equal), stopping
early when no unexplored neighbor remains; every non-start visit
increments counter[v]; final score(v) = k * n * counter[v] / t.

Determinism: the reference draws start/length/steps from its global RNG;
here every draw is a pure md5 function of (seed, walk_id, step) — start
= hash % n over the dense vertex ids, length = 1 + hash % k, and the
inverse-weight pick inverts the cumulative 1/w distribution (candidates
in dst-ascending order) at u = hash·2^-48·total, the same
window-cumulative trick node2vec.py uses, so Spark and DuckDB produce
bit-identical cums and identical walks.

Spark-first plan: walk state is one row per live walk (wid, cur,
visited array, l); a step joins state against the edge table on cur —
cost Σ deg(cur) over live walks, independent of graph size — then two
per-walk windows (total + cumulative) and a top-1 pick.  The visited
array is walk-length-bounded (≤ k+1 entries), so state rows stay tiny;
10^9 walks are just more state rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize

UNIT = float(1 << 48)


def kpath_centrality(
    graph: Graph, k: int = 4, num_walks: int = 64, seed: int = 42
) -> DataFrame:
    """(id, score) for every vertex; score = k * n * visits / num_walks."""
    g = graph.to_undirected() if graph.directed else graph
    edges = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    n = g.vertices.count()
    spark = g.vertices.sparkSession

    start = F.expr(
        md5_long_sql(f"('{seed}:kps:' || CAST(wid AS STRING))")
    ) % F.lit(n)
    length = F.expr(
        md5_long_sql(f"('{seed}:kpl:' || CAST(wid AS STRING))")
    ) % F.lit(k) + 1
    state = materialize(
        spark.range(num_walks)
        .select(F.col("id").alias("wid"))
        .select(
            "wid",
            start.cast("long").alias("cur"),
            length.cast("long").alias("l"),
        )
        .select("wid", "cur", "l", F.array(F.col("cur")).alias("visited"))
    )

    it = IterationState(None, "kpath")
    for j in range(1, k + 1):
        live = state.filter(F.col("l") >= j)
        cand = (
            live.join(edges, live["cur"] == edges["src"])
            .filter(~F.array_contains(F.col("visited"), F.col("dst")))
            .select("wid", "dst", (F.lit(1.0) / F.col("w")).alias("iw"))
        )
        w_all = Window.partitionBy("wid")
        w_cum = (
            Window.partitionBy("wid")
            .orderBy("dst")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        r = (
            F.expr(
                md5_long_sql(f"('{seed}:kpp:{j}:' || CAST(wid AS STRING))")
            )
            / F.lit(UNIT)
        ) * F.sum("iw").over(w_all)
        scored = cand.select(
            "wid",
            "dst",
            F.sum("iw").over(w_cum).alias("cum"),
            r.alias("r"),
        ).filter(F.col("cum") > F.col("r"))
        pick = (
            scored.withColumn(
                "rn", F.row_number().over(Window.partitionBy("wid").orderBy("dst"))
            )
            .filter(F.col("rn") == 1)
            .select("wid", F.col("dst").alias("nxt"))
        )
        state = it.advance(
            j,
            state.join(pick, "wid", "left").select(
                "wid",
                F.coalesce("nxt", F.col("cur")).alias("cur"),
                # a live walk with no unexplored neighbor dies (l := 0)
                F.when(
                    (F.col("l") >= j) & F.col("nxt").isNull(), F.lit(0)
                )
                .otherwise(F.col("l"))
                .alias("l"),
                F.when(
                    F.col("nxt").isNotNull(),
                    F.concat(F.col("visited"), F.array(F.col("nxt"))),
                )
                .otherwise(F.col("visited"))
                .alias("visited"),
            ),
        )
    it.close()

    visits = (
        state.select(
            F.explode(
                F.slice(F.col("visited"), 2, F.size("visited") - 1)
            ).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        g.vertices.select("id")
        .join(visits, "id", "left")
        .select(
            "id",
            (
                F.lit(float(k))
                * F.lit(float(n))
                * F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                / F.lit(float(num_walks))
            ).alias("score"),
        )
    )
