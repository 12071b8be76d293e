"""Centrality family beyond PageRank (SURVEY.md §2.12 `centrality/`).

Each operator mirrors a reference Algorithm subclass's run() contract and
returns a scores(id, score) DataFrame; ranking() in operators.pagerank
applies the (score desc, id asc) ordering of Centrality::ranking
(networkit/cpp/centrality/Centrality.cpp:30-42).

All supersteps are pure DataFrame joins + partial+final hash aggregations;
iteration state is lineage-truncated via IterationState.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def degree_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """scores(id, score) — out-degree, optionally /(n-1)
    (ref: networkit/cpp/centrality/DegreeCentrality.cpp, 53 LoC)."""
    deg = graph.degrees().select("id", F.col("degree").cast("double").alias("score"))
    if normalized:
        n = graph.num_nodes()
        scale = 1.0 / (n - 1) if n > 1 else 1.0
        deg = deg.select("id", (F.col("score") * scale).alias("score"))
    return deg


def eigenvector_centrality(
    graph: Graph, tol: float = 1e-9, max_iterations: int | None = 100
) -> DataFrame:
    """Power iteration on the weighted adjacency, L2-normalized per step
    (ref: networkit/cpp/centrality/EigenvectorCentrality.cpp, 69 LoC — the
    near-clone of the PageRank loop, SURVEY.md §2.12). Convergence:
    L1 distance of consecutive normalized vectors <= tol."""
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")

    edges = materialize(
        graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )
    scores = graph.vertices.select("id", F.lit(1.0 / math.sqrt(n)).alias("score"))
    state = IterationState(None, "eigenvector")
    scores = state.advance(0, scores)

    iteration = 0
    while True:
        iteration += 1
        msgs = (
            edges.join(scores.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("w")).alias("mass"))
            .withColumnRenamed("dst", "id")
        )
        # scores is vertex-complete: one left join carries raw AND old, so
        # the norm and the convergence delta are SCANS of the materialized
        # step — no per-superstep delta join (pagerank's old-carry shape)
        step = state.advance(
            iteration,
            scores.withColumnRenamed("score", "old")
            .join(msgs, "id", "left")
            .select("id", F.coalesce("mass", F.lit(0.0)).alias("raw"), "old"),
        )
        norm = step.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw")))).first()[0] or 1.0
        if tol > 0.0:
            delta = (
                step.agg(F.sum(F.abs(F.col("raw") / norm - F.col("old")))).first()[0]
                or 0.0
            )
        else:
            delta = float("inf")
        scores = step.select("id", (F.col("raw") / norm).alias("score"))
        if delta <= tol or (max_iterations is not None and iteration >= max_iterations):
            break

    result = scores.localCheckpoint(eager=True)
    state.close()
    return result


def katz_centrality(
    graph: Graph,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iterations: int | None = 100,
) -> DataFrame:
    """x_{k+1}[u] = beta + alpha * Σ_{(v→u)} w(v,u)·x_k[v]; converge on L1;
    final L2 normalization (ref: networkit/cpp/centrality/KatzCentrality.cpp)."""
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")
    edges = materialize(
        graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )
    scores = graph.vertices.select("id", F.lit(0.0).alias("score"))
    state = IterationState(None, "katz")
    scores = state.advance(0, scores)

    iteration = 0
    while True:
        iteration += 1
        msgs = (
            edges.join(scores.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("w")).alias("mass"))
            .withColumnRenamed("dst", "id")
        )
        # old score carried through the step projection — the convergence
        # delta is a scan of the materialized step, not an extra join
        step = state.advance(
            iteration,
            scores.withColumnRenamed("score", "old")
            .join(msgs, "id", "left")
            .select(
                "id",
                (F.lit(beta) + F.lit(alpha) * F.coalesce("mass", F.lit(0.0))).alias(
                    "score"
                ),
                "old",
            ),
        )
        if tol > 0.0:
            delta = (
                step.agg(F.sum(F.abs(F.col("score") - F.col("old")))).first()[0] or 0.0
            )
        else:
            delta = float("inf")
        scores = step.select("id", "score")
        if delta <= tol or (max_iterations is not None and iteration >= max_iterations):
            break

    norm = scores.agg(F.sqrt(F.sum(F.col("score") * F.col("score")))).first()[0] or 1.0
    result = scores.select("id", (F.col("score") / norm).alias("score"))
    result = result.localCheckpoint(eager=True)
    state.close()
    return result


def core_decomposition(
    graph: Graph, max_iterations: int | None = None
) -> DataFrame:
    """cores(id, core) — k-core number per vertex via distributed h-index
    iteration (Montresor, De Pellegrini, Miorandi, "Distributed k-core
    decomposition", IEEE TPDS 2013): init core(v) = simple degree, then
    repeat core(v) <- min(core(v), H({core(u) : u in N(v)})) where H is the
    h-index of the neighbor multiset. The fixed point is exactly the
    reference's coreness (networkit/cpp/centrality/CoreDecomposition.cpp
    bucket peel computes the same unique values).

    ONE superstep per round — a join + per-vertex sorted-array fold, all
    JVM expressions — converging in tens of rounds on power-law graphs,
    versus the O(k_max x peel-rounds) job storm of the degree-peel
    formulation this replaces. ``max_iterations`` pins the round count for
    the driver's unrolled SQL oracle; None iterates to the fixed point.

    Skew note: collect_list materializes each vertex's neighbor-core array
    (size = degree). Total memory is O(m) — the adjacency itself — but a
    10^8-degree hub makes a single wide row; at that scale feed the hub
    rows through a two-level H (bucketed counts) instead."""
    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    edges = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )

    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    cores = (
        g.vertices.select("id")
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("deg"), F.lit(0)).cast("long").alias("core"))
    )
    state = IterationState(None, "kcore")
    cores = state.advance(0, cores)

    iteration = 0
    while True:
        iteration += 1
        # neighbor cores gathered per vertex; h-index = Σ 1[a[i] >= i+1]
        # over the desc-sorted array (the indicator is prefix-true)
        nb = edges.join(
            cores.select(F.col("id").alias("dst"), F.col("core").alias("ncore")),
            "dst",
        )
        harr = nb.groupBy(F.col("src").alias("id")).agg(
            F.sort_array(F.collect_list("ncore"), asc=False).alias("a")
        )
        hval = F.aggregate(
            F.zip_with(
                F.col("a"),
                F.sequence(F.lit(1), F.size("a")),
                lambda v, i: F.when(v >= i.cast("long"), F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        step = state.advance(
            iteration,
            cores.join(harr, "id", "left").select(
                "id",
                F.when(
                    F.col("a").isNull(), F.col("core")
                )
                .otherwise(F.least(F.col("core"), hval.cast("long")))
                .alias("new_core"),
                F.col("core").alias("old_core"),
            ),
        )
        if max_iterations is not None:
            changed = 1  # pinned-count mode: extra rounds are no-ops
        else:
            changed = step.filter(F.col("new_core") < F.col("old_core")).count()
        cores = step.select("id", F.col("new_core").alias("core"))
        if changed == 0 or (
            max_iterations is not None and iteration >= max_iterations
        ):
            break

    result = cores.localCheckpoint(eager=True)
    state.close()
    return result


def bfs_hops(graph: Graph, source: int, max_iterations: int | None = None) -> DataFrame:
    """dist(id, dist) — unweighted hop distance from ``source``; unreachable
    vertices are ABSENT (ref: networkit/cpp/distance/BFS.cpp, 80 LoC; the
    frontier superstep is the same shape as CC's active-set loop).
    Directed graphs follow OUT-edges only, matching BFS.cpp; undirected
    graphs store both directions, so no symmetrization is needed here."""
    spark = graph.vertices.sparkSession
    edges = materialize(graph.edges.select("src", "dst"))

    dist = spark.createDataFrame([(int(source), 0)], "id long, dist long")
    dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("id")
    level = 0
    while True:
        level += 1
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "semi")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "anti")
            .select("id", F.lit(level).cast("long").alias("dist"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        cnt = nxt.count()
        if cnt == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
        if max_iterations is not None and level >= max_iterations:
            break
    return dist


def reverse_bfs_hops(
    graph: Graph, source: int, max_iterations: int | None = None
) -> DataFrame:
    """dist(id, dist) — hop distance TO ``source`` along edge direction
    (ref: distance/ReverseBFS.cpp:18-75 — the same BFS loop over
    ``forInNeighborsOf``). Distributed as plain BFS on the transposed edge
    table; on undirected graphs both stored directions make this identical
    to bfs_hops, exactly as in the reference."""
    return bfs_hops(graph.transpose() if graph.directed else graph,
                    source, max_iterations)


def sssp_weighted(
    graph: Graph, source: int, max_iterations: int | None = 50
) -> DataFrame:
    """dist(id, dist: double) — single-source shortest paths by synchronous
    Bellman-Ford-style relaxation (the distributed analogue of
    networkit/cpp/distance/Dijkstra.cpp, 94 LoC; a priority queue does not
    distribute, frontier relaxation does). Converges in <= |V|-1 rounds."""
    spark = graph.vertices.sparkSession
    edges = materialize(
        graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )

    dist = spark.createDataFrame([(int(source), 0.0)], "id long, dist double")
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    iteration = 0
    while True:
        iteration += 1
        cand = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        merged = (
            dist.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("cand"), F.lit(float("inf"))),
                ).alias("new_dist"),
                F.col("dist").alias("old_dist"),
            )
        )
        merged = merged.localCheckpoint(eager=True)
        improved = merged.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        )
        n_improved = improved.count()
        dist = merged.select("id", F.col("new_dist").alias("dist"))
        frontier = improved.select("id", F.col("new_dist").alias("dist"))
        if n_improved == 0 or (
            max_iterations is not None and iteration >= max_iterations
        ):
            break
    return dist


def laplacian_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """(id, score): Laplacian energy lost when dropping the node —
    wdeg(u)^2 + Σ_{v~u} w(u,v)·(w(u,v) + 2·wdeg(v)); normalized divides by
    the total Laplacian energy Σ_u wdeg(u)^2 + Σ_e∈directed w(e)^2.
    Reference: centrality/LaplacianCentrality.cpp:16-45 (weightedDegree
    counts self-loops ONCE there — plain out-edge weight sum).

    Spark-first: one weighted-degree aggregation, one edges⋈degrees join,
    one groupBy — no iteration, fully partial-aggregated."""
    edges = graph.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    )
    wdeg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wd"))
    wdeg = graph.vertices.join(wdeg, "id", "left").fillna({"wd": 0.0})
    nbr = (
        edges.join(
            wdeg.select(F.col("id").alias("dst"), F.col("wd").alias("wd_v")), "dst"
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("w") * (F.col("w") + 2.0 * F.col("wd_v"))).alias("loss_nbr"))
    )
    score = (
        wdeg.join(nbr, "id", "left")
        .fillna({"loss_nbr": 0.0})
        .select("id", (F.col("wd") * F.col("wd") + F.col("loss_nbr")).alias("score"))
    )
    if not normalized:
        return score
    tot = wdeg.agg(F.sum(F.col("wd") * F.col("wd")).alias("a")).crossJoin(
        edges.agg(F.sum(F.col("w") * F.col("w")).alias("b"))
    )
    return score.crossJoin(F.broadcast(tot)).select(
        "id", (F.col("score") / (F.col("a") + F.col("b"))).alias("score")
    )


def sfigality(graph: Graph) -> DataFrame:
    """(id, score): fraction of a node's incident edges whose other
    endpoint has strictly higher (unweighted) degree; NULL for isolated
    nodes (the reference divides 0/0). centrality/Sfigality.cpp:17-29."""
    edges = graph.edges.select("src", "dst")
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    hi = (
        edges.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.when(F.col("du") < F.col("dv"), 1).otherwise(0)).alias("sf"))
    )
    return (
        graph.vertices.join(deg, "id", "left")
        .join(hi, "id", "left")
        .select(
            "id",
            (F.coalesce("sf", F.lit(0)) / F.when(F.col("deg") > 0, F.col("deg"))).alias(
                "score"
            ),
        )
    )
