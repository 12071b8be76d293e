"""Betweenness centrality — distributed Brandes.

Reference: networkit/cpp/centrality/Betweenness.cpp:25-103 — per source s,
an SSSP records path counts sigma and predecessors, then dependencies
accumulate in order of DECREASING distance:

    delta_s(v) = sum_{w : succ of v} sigma_s(v)/sigma_s(w) * (1 + delta_s(w))
    bc(v)      = sum_{s != v} delta_s(v)

Dependencies are summed over ALL sources (each unordered pair contributes
from both of its ordered orientations on undirected graphs — the reference
does not halve; normalized=True divides by (n-1)(n-2), Betweenness.cpp:86-95).

Spark-first plan: the per-source loop becomes a SOURCE-BATCHED frontier
superstep — state is (s, v, dist, sigma) keyed by (s, v), so one join+agg
per BFS level advances EVERY source at once (the distributed analogue of
the reference's omp-parallel source loop). The backward pass replays levels
deepest-first with one join+agg per level. Total supersteps = 2 x diameter,
independent of source count.

Scale shape: state is O(|sources| x n) rows. Exact mode (sources=None) is
for small graphs or batched exact sweeps; at 100 TB run the sampled
estimator (EstimateBetweenness.cpp semantics: a uniform source sample,
scores scaled by n/|S|) — same code path, sources=[...], scale=True.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def betweenness(
    graph: Graph,
    sources: list[int] | DataFrame | None = None,
    normalized: bool = False,
    scale_to_n: bool = False,
    max_depth: int | None = None,
) -> DataFrame:
    """scores(id, score). ``sources=None`` = exact (all vertices as
    sources); a list (or an (id) DataFrame — stays distributed, nothing
    collected: the Dyn* updaters pass graph-sized affected sets) runs the
    sampled estimator over that pinned source set. ``scale_to_n``
    multiplies sampled scores by n/|sources|
    (EstimateBetweenness.cpp:49-57). ``normalized`` divides by (n-1)(n-2).
    Directed graphs follow out-edges, like the reference's BFS."""
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")

    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )

    if sources is None:
        src_df = graph.vertices.select(F.col("id").alias("s"))
        n_sources = n
    elif isinstance(sources, DataFrame):
        src_df = materialize(sources.select(F.col(sources.columns[0]).alias("s")))
        n_sources = src_df.count()
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources], "s long")
        n_sources = len(sources)

    # ---- forward: multi-source BFS with path counts -----------------------
    # levels[d] = (s, id, sigma) materialized per BFS level
    state = IterationState(None, "betweenness-fwd")
    frontier = src_df.select("s", F.col("s").alias("id"), F.lit(1.0).alias("sigma"))
    frontier = state.advance(0, frontier)
    visited = frontier.select("s", "id")  # grows by union, re-persisted
    visited = visited.localCheckpoint(eager=True)
    levels: list[DataFrame] = [frontier]

    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.withColumnRenamed("id", "src")
            .join(edges, "src")
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "id"], "anti")
        )
        nxt = state.advance(depth, nxt)
        if nxt.limit(1).count() == 0:
            depth -= 1
            break
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "id")).localCheckpoint(eager=True)
        frontier = nxt
        if max_depth is not None and depth >= max_depth:
            break

    # ---- backward: dependency accumulation, deepest level first -----------
    # a vertex sits at exactly one level per source, so its delta is
    # written once — when its successor level is processed. Only the
    # PREVIOUS level's deltas are needed as lookup; all levels' deltas are
    # kept for the final per-vertex sum (delta rows absent = 0).
    bstate = IterationState(None, "betweenness-bwd")
    contribs: list[DataFrame] = []
    prev: DataFrame | None = None  # deltas of the level just processed
    for d in range(depth, 0, -1):
        wlev = levels[d].withColumnRenamed("id", "w").withColumnRenamed(
            "sigma", "sigma_w"
        )
        if prev is not None:
            wlev = wlev.join(
                prev.select("s", F.col("id").alias("w"), F.col("delta").alias("dw")),
                ["s", "w"],
                "left",
            )
        else:
            wlev = wlev.withColumn("dw", F.lit(None).cast("double"))
        contrib = (
            wlev.join(
                edges.select(F.col("src").alias("v"), F.col("dst").alias("w")), "w"
            )
            .join(
                levels[d - 1].select(
                    "s", F.col("id").alias("v"), F.col("sigma").alias("sigma_v")
                ),
                ["s", "v"],
            )
            .groupBy("s", F.col("v").alias("id"))
            .agg(
                F.sum(
                    (F.col("sigma_v") / F.col("sigma_w"))
                    * (1.0 + F.coalesce(F.col("dw"), F.lit(0.0)))
                ).alias("delta")
            )
        )
        contrib = bstate.advance(depth - d, contrib)
        contribs.append(contrib)
        prev = contrib

    if not contribs:
        bc = graph.vertices.select("id", F.lit(0.0).alias("score"))
    else:
        delta = contribs[0]
        for c in contribs[1:]:
            delta = delta.unionByName(c)
        per_v = (
            delta.filter(F.col("id") != F.col("s"))
            .groupBy("id")
            .agg(F.sum("delta").alias("score"))
        )
        bc = (
            graph.vertices.select("id")
            .join(per_v, "id", "left")
            .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
        )

    factor = 1.0
    if scale_to_n and n_sources > 0:
        factor *= n / n_sources
    if normalized and n > 2:
        factor /= (n - 1.0) * (n - 2.0)
    if factor != 1.0:
        bc = bc.select("id", (F.col("score") * factor).alias("score"))

    bc = bc.localCheckpoint(eager=True)
    state.close()
    bstate.close()
    return bc


def kadabra_betweenness(
    graph: Graph,
    eps: float = 0.05,
    delta: float = 0.1,
    batch: int = 32,
    max_batches: int = 16,
    max_depth: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(id, score, err) — ADAPTIVE-sampling approximate betweenness in the
    role of KadabraBetweenness (centrality/KadabraBetweenness.cpp, Borassi
    & Natale "KADABRA is an ADaptive Algorithm for Betweenness via Random
    Approximation", ESA 2016): sample shortest paths in batches and STOP
    once a per-node concentration bound certifies every estimate to within
    eps with probability 1-delta, instead of fixing the sample size up
    front like RK.

    Documented deviation: the reference couples balanced bidirectional BFS
    per sample with per-node adaptive deltas; here each batch reuses the
    batched RK walk machinery (approx_betweenness_rk — one multi-source
    BFS + synchronized backward walks per batch, all hash-derandomized)
    and the stopping rule is the empirical-Bernstein bound for [0,1]
    samples,  err(v) = sqrt(2*v_hat*ln(4n/delta)/r) + 3*ln(4n/delta)/r
    with v_hat = b_hat(1-b_hat), evaluated distributed as one aggregation
    per batch. The adaptive semantics (sample until certified, return the
    certificate) are preserved; scores estimate betweenness normalized by
    the number of ordered pairs, exactly like the RK estimator it wraps.
    Deterministic: batch b draws with seed (seed, b), so the batch count
    is a pure function of (seed, graph)."""
    import math

    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    log_term = math.log(4.0 * max(n, 2) / delta)
    totals = None
    r_total = 0
    err_expr = None
    for b in range(max_batches):
        part = approx_betweenness_rk(
            graph, num_samples=batch, max_depth=max_depth, seed=seed + 7919 * b
        ).select("id", (F.col("score") * batch).alias("c"))
        totals = (
            part
            if totals is None
            else totals.unionByName(part).groupBy("id").agg(F.sum("c").alias("c"))
        ).localCheckpoint(eager=True)
        r_total += batch
        bhat = F.col("c") / F.lit(float(r_total))
        err_expr = (
            F.sqrt(2.0 * bhat * (1.0 - bhat) * F.lit(log_term) / r_total)
            + F.lit(3.0 * log_term / r_total)
        )
        worst = totals.agg(F.max(err_expr)).first()[0] or 0.0
        if worst <= eps:
            break
    return (
        graph.vertices.select("id")
        .join(totals, "id", "left")
        .select(
            "id",
            (F.coalesce("c", F.lit(0.0)) / F.lit(float(r_total))).alias("score"),
            F.coalesce(
                F.sqrt(
                    2.0
                    * (F.coalesce("c", F.lit(0.0)) / r_total)
                    * (1.0 - F.coalesce("c", F.lit(0.0)) / r_total)
                    * F.lit(log_term)
                    / r_total
                )
                + F.lit(3.0 * log_term / r_total),
                F.lit(3.0 * log_term / r_total),
            ).alias("err"),
        )
    )


def estimate_betweenness(
    graph: Graph,
    n_samples: int,
    seed: int = 42,
    normalized: bool = False,
    max_depth: int | None = None,
) -> DataFrame:
    """Sampled-source betweenness estimate
    (centrality/EstimateBetweenness.cpp: uniform random sources, per-source
    dependencies scaled by n/|S|). Sources are drawn by the deterministic
    hash ranking (operators/sampling.py), so the estimate is a pure
    function of (seed, graph) — replayable at any parallelism. This is the
    100 TB path: state O(n_samples x n) instead of O(n^2)."""
    from networkit_spark.operators.sampling import sample_nodes

    srcs = [r["id"] for r in sample_nodes(graph, n_samples, seed).collect()]
    return betweenness(
        graph,
        sources=srcs,
        normalized=normalized,
        scale_to_n=True,
        max_depth=max_depth,
    )


def approx_betweenness_rk(
    graph: Graph,
    num_samples: int = 32,
    max_depth: int = 8,
    seed: int = 42,
    return_credits: bool = False,
    sample_ids: DataFrame | None = None,
) -> DataFrame:
    """(id, score) — Riondato-Kornaropoulos approximate betweenness
    (ref: centrality/ApproxBetweenness.cpp: sample r (s,t) pairs, walk ONE
    shortest path per pair backwards choosing each predecessor with
    probability sigma(pred)/sum sigma, credit every internal node 1/r;
    score estimates betweenness normalized by the number of pairs, with
    the RK eps-delta guarantee governing r).

    Derandomization: pairs and every predecessor choice are md5 draws
    ((seed, sample) / (seed, sample, step)), predecessors inverse-CDF'd
    in id-ascending cumulative order — the DuckDB oracle replays walks
    exactly. The path-length horizon is PINNED at ``max_depth`` (the
    reference samples from the true diameter; pairs farther apart than
    the horizon contribute nothing on either engine — set it >= the
    graph diameter for the reference semantics).

    Plan shape: one source-batched forward BFS with path counts (shared
    with betweenness()), then max_depth-1 backward-walk supersteps where
    ALL sample walks advance at once: state is one row per live walk, a
    step is a join against the (dist, sigma) table plus two per-walk
    windows. Cost independent of n beyond the BFS."""
    from networkit_spark.functions.hashing import md5_long_sql
    from pyspark.sql import Window

    UNIT = float(1 << 48)
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    r = num_samples

    s_draw = F.expr(md5_long_sql(f"('{seed}:abs:' || CAST(i AS STRING))")) % F.lit(n)
    t_off = F.expr(md5_long_sql(f"('{seed}:abt:' || CAST(i AS STRING))")) % F.lit(
        n - 1
    ) + 1
    samples = (
        spark.range(r)
        .select(F.col("id").alias("i"))
        .select(
            "i",
            s_draw.cast("long").alias("s"),
            ((s_draw + t_off) % F.lit(n)).cast("long").alias("t"),
        )
    )
    if sample_ids is not None:
        # DynApproxBetweenness path: replay ONLY the affected walks — the
        # md5-pinned draws make the restricted run reproduce exactly the
        # walks the full run would take for those sample ids
        samples = samples.join(
            sample_ids.select(F.col(sample_ids.columns[0]).alias("i")), "i"
        )
    samples = materialize(samples)

    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    sources = samples.select("s").distinct()

    # forward multi-source BFS with path counts, horizon max_depth
    state = IterationState(None, "abrk-fwd")
    frontier = sources.select("s", F.col("s").alias("id"), F.lit(1.0).alias("sigma"))
    frontier = state.advance(0, frontier)
    visited = frontier.select("s", "id").localCheckpoint(eager=True)
    dist_sigma = frontier.select(
        "s", "id", F.lit(0).cast("long").alias("dist"), "sigma"
    ).localCheckpoint(eager=True)
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.withColumnRenamed("id", "src")
            .join(edges, "src")
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "id"], "anti")
        )
        nxt = state.advance(depth, nxt)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt.select("s", "id")).localCheckpoint(eager=True)
        dist_sigma = dist_sigma.unionByName(
            nxt.select("s", "id", F.lit(depth).cast("long").alias("dist"), "sigma")
        ).localCheckpoint(eager=True)
        frontier = nxt
    state.close()

    # backward hash walks, all samples at once
    walks = materialize(
        samples.join(
            dist_sigma.select(
                "s", F.col("id").alias("t"), F.col("dist").alias("dd")
            ),
            ["s", "t"],
        )
        .filter(F.col("dd") >= 1)
        .select("i", "s", F.col("t").alias("cur"), "dd")
    )
    credits = None
    wstate = IterationState(None, "abrk-bwd")
    for j in range(1, max_depth):
        live = walks.filter(F.col("dd") > 1)
        preds = (
            live.join(edges.withColumnRenamed("dst", "cur"), "cur")
            .join(
                dist_sigma.select(
                    "s", F.col("id").alias("src"), "dist", "sigma"
                ),
                ["s", "src"],
            )
            .filter(F.col("dist") == F.col("dd") - 1)
            .select("i", F.col("src").alias("p"), "sigma")
        )
        w_all = Window.partitionBy("i")
        w_cum = (
            Window.partitionBy("i")
            .orderBy("p")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        rdraw = (
            F.expr(md5_long_sql(f"('{seed}:abp:{j}:' || CAST(i AS STRING))"))
            / F.lit(UNIT)
        ) * F.sum("sigma").over(w_all)
        pick = (
            preds.select(
                "i", "p", F.sum("sigma").over(w_cum).alias("cum"), rdraw.alias("rd")
            )
            .filter(F.col("cum") > F.col("rd"))
            .withColumn("rn", F.row_number().over(Window.partitionBy("i").orderBy("p")))
            .filter(F.col("rn") == 1)
            .select("i", "p")
        )
        credits = (
            pick if credits is None else credits.unionByName(pick)
        ).localCheckpoint(eager=True)
        walks = wstate.advance(
            j,
            walks.join(pick, "i", "left").select(
                "i",
                "s",
                F.coalesce("p", F.col("cur")).alias("cur"),
                F.when(F.col("p").isNotNull(), F.col("dd") - 1)
                .otherwise(F.col("dd"))
                .alias("dd"),
            ),
        )
    wstate.close()

    credits = (
        credits if credits is not None else spark.createDataFrame([], "i long, p long")
    )
    if return_credits:
        # (walk id, internal node) pairs — the sampled-path membership table
        # approx_group_betweenness runs its greedy cover over
        return credits
    counts = (
        credits
        .groupBy(F.col("p").alias("id"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        graph.vertices.select("id")
        .join(counts, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.lit(float(r))).alias(
                "score"
            ),
        )
    )


def approx_group_betweenness(
    graph: Graph,
    k: int,
    num_samples: int = 64,
    max_depth: int = 8,
    seed: int = 42,
) -> DataFrame:
    """(rank, id, covered, coverage) — greedy group betweenness over
    sampled shortest paths (the role of
    centrality/ApproxGroupBetweenness.cpp: sample paths, then greedily
    pick the k vertices covering the most of them — group betweenness is
    monotone submodular, so greedy cover of the path sample carries the
    (1-1/e) guarantee of the reference's construction).

    The sample is the RK walk table (approx_betweenness_rk, identical
    hash-derandomized walks); each greedy round is one count-distinct
    aggregation over the remaining (walk, node) memberships plus an
    anti-join removing the covered walks — k rounds, never materializing
    subsets. ``coverage`` is the cumulative fraction of sampled paths
    hit, the group-betweenness estimate the reference reports."""
    spark = graph.vertices.sparkSession
    credits = approx_betweenness_rk(
        graph, num_samples=num_samples, max_depth=max_depth, seed=seed,
        return_credits=True,
    ).select("i", "p").distinct().localCheckpoint(eager=True)
    total = credits.select("i").distinct().count()
    rows = []
    covered = 0
    remaining = credits
    for rank in range(1, k + 1):
        top = (
            remaining.groupBy("p")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "p")
            .limit(1)
            .first()
        )
        if top is None:
            break
        covered += int(top["c"])
        rows.append(
            (rank, int(top["p"]), covered,
             covered / float(total) if total else 0.0)
        )
        hit = remaining.filter(F.col("p") == int(top["p"])).select("i")
        remaining = remaining.join(hit, "i", "anti").localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, "rank int, id long, covered long, coverage double"
    )
