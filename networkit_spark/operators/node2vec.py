"""Node2Vec biased random walks as distributed supersteps.

Reference: networkit/cpp/embedding/BiasedRandomWalk.cpp:45-140 (adapted in
the reference from SNAP node2vec, Grover & Leskovec 2016) — walks of fixed
length from every node: the first hop is uniform over the start's
neighbors; from then on, standing at v having arrived from t, the next hop
x is drawn with unnormalized weight w(v,x)/p if x = t, w(v,x) if x is a
neighbor of t, w(v,x)/q otherwise; a walk truncates at an out-degree-0
node. The reference then feeds walks into word2vec (LearnEmbedding.cpp);
walk GENERATION is the distributed-expensive part and what this operator
provides — training is a separate concern (no GPU/word2vec in scope).

Determinism: the reference draws from thread-local RNGs (walks differ
run-to-run); here every choice is a pure function of (seed, step,
walk_id): the uniform hop picks neighbor index hash % degree over the
x-ascending neighbor list, the biased hop inverts the cumulative
distribution at u = hash·2^-48·total. Cumulative window sums run in the
same ORDER BY x frame order in Spark and DuckDB, so both engines produce
bit-identical cums and pick the same x — the walk table is exactly
hash-checkable.

Spark-first plan: walk state is one row per live walk (walk_id, t, v);
a step is state ⋈ edges (grouped window per walk) — cost proportional to
Σ deg(v) over CURRENT positions, i.e. walks×avg-degree, independent of
graph size; the t-adjacency check is an edge-table equi-join, not a
broadcast set. 10^9 walks are just more rows in the state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def _draw(seed: int, step: int) -> F.Column:
    return F.expr(
        md5_long_sql(f"('{seed}:walk:{step}:' || CAST(walk_id AS STRING))")
    )


def biased_random_walks(
    graph: Graph,
    p: float = 1.0,
    q: float = 1.0,
    walk_length: int = 5,
    walks_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(walk_id, step, node) — walks_per_node walks from every vertex,
    walk_id = id * walks_per_node + c; truncated walks simply stop
    producing rows (BiasedRandomWalk.cpp:92-106 shortening)."""
    # walk the graph as given — directed graphs follow out-edges and walks
    # truncate at out-degree-0 nodes (BiasedRandomWalk.cpp:92-106)
    g = graph
    edges = materialize(
        g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))  # simple-graph adjacency
    )
    adj = edges.select("src", "dst")

    starts = g.vertices.select("id")
    if walks_per_node > 1:
        spark = graph.vertices.sparkSession
        reps = spark.range(walks_per_node).select(F.col("id").alias("c"))
        starts = starts.crossJoin(reps).select(
            (F.col("id") * walks_per_node + F.col("c")).alias("walk_id"),
            F.col("id").alias("node"),
        )
    else:
        starts = starts.select(
            (F.col("id") * walks_per_node).alias("walk_id"), F.col("id").alias("node")
        )

    it = IterationState(None, "n2v")
    snaps = [starts.select("walk_id", F.lit(0).cast("int").alias("step"), "node")]
    if walk_length <= 1:
        # a walk of length 1 is its start node alone — the hop-1 step
        # below must not run or every walk comes back one node too long
        it.close()
        return snaps[0]

    # hop 1: uniform over the x-ascending neighbor list (Aux::Random::index)
    w_nb = Window.partitionBy("src").orderBy("dst")
    ranked = adj.select(
        "src",
        "dst",
        F.row_number().over(w_nb).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("cnt"),
    )
    st = (
        starts.withColumnRenamed("node", "src")
        .join(ranked, "src")
        .filter(F.col("rn") == (_draw(seed, 1) % F.col("cnt")) + 1)
        .select("walk_id", F.col("src").alias("t"), F.col("dst").alias("v"))
    )
    st = it.advance(1, st)
    snaps.append(st.select("walk_id", F.lit(1).cast("int").alias("step"),
                           F.col("v").alias("node")))

    for step in range(2, walk_length):
        cand = (
            st.join(edges.withColumnRenamed("src", "v"), "v")
            .withColumnRenamed("dst", "x")
            .join(
                adj.select(
                    F.col("src").alias("t"), F.col("dst").alias("x"),
                    F.lit(True).alias("t_adj"),
                ),
                ["t", "x"],
                "left",
            )
            .select(
                "walk_id",
                "t",
                "v",
                "x",
                F.when(F.col("x") == F.col("t"), F.col("w") / p)
                .when(F.col("t_adj"), F.col("w"))
                .otherwise(F.col("w") / q)
                .alias("wadj"),
            )
        )
        w_cum = Window.partitionBy("walk_id").orderBy("x")
        w_all = Window.partitionBy("walk_id")
        # tot = MAX of the ordered running sum, NOT a separate unordered
        # partition sum: with order-sensitive doubles the two could differ
        # by ULPs, letting the draw u land in the gap past the final cum
        # and strand the walk with no picked row (and breaking the
        # bit-identical cross-engine contract; the oracle CTE mirrors
        # this max-of-cum formulation)
        picked = (
            cand.select(
                "walk_id",
                "v",
                "x",
                F.sum("wadj").over(w_cum).alias("cum"),
            )
            .withColumn("tot", F.max("cum").over(w_all))
            .filter(
                F.col("cum")
                > _draw(seed, step) * F.lit(2.0 ** -48) * F.col("tot")
            )
            .groupBy("walk_id")
            .agg(F.min("x").alias("x"), F.min("v").alias("v"))
        )
        st = picked.select("walk_id", F.col("v").alias("t"), F.col("x").alias("v"))
        st = it.advance(step, st)
        snaps.append(
            st.select("walk_id", F.lit(step).cast("int").alias("step"),
                      F.col("v").alias("node"))
        )
    it.close()
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out
