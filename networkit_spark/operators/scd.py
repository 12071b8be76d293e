"""Selective community detection: ApproximatePageRank (push) and
PageRankNibble seed-set expansion.

References:
- networkit/cpp/scd/ApproximatePageRank.cpp:17-61 — Andersen-Chung-Lang
  push: seeds start with residual 1/|seeds|; pushing u moves alpha*r(u)
  into p(u), sends (1-alpha)*r(u)*w/(2*vol(u)) to each neighbor, and keeps
  (1-alpha)*r(u)/2; a node is pushable while r(u) >= eps*vol(u), with
  vol = weightedDegree(u, includeSelfLoops=true).
- networkit/cpp/scd/PageRankNibble.cpp:27-97 — order the support by
  p(v)/vol(v) descending, sweep: cumulative volume adds the single-count
  weighted degree, an edge joins the cut at the earlier endpoint's rank
  and leaves at the later one's (self-loops enter and never leave),
  conductance = cut / min(vol, totalVolume - vol) with
  totalVolume = 2 * totalEdgeWeight; the community is the strictly-best
  prefix (first minimum), constrained to fewer than n nodes.

Determinism: the reference pushes one queue element at a time, so its
intermediate states depend on pop order (any order satisfies the same
eps-approximation guarantee). The distributed-standard batched variant
pushes EVERY pushable node per superstep — a deterministic schedule both
engines replay exactly; ``eps=0`` with a pinned round count is the
oracle-checkable mode (every node with r > 0 pushes), ``eps > 0`` is the
reference's locality-terminating mode.

Spark-first plan: the push loop is a join + groupBy(dst).sum per
superstep over the SUPPORT only (the frontier of touched nodes — at scale
O(1/(eps*alpha)) nodes, not the graph); the sweep is window functions
over the support ordered by score. The single-partition window is bounded
by the support size, which is exactly why PageRankNibble is the 10^12-edge
local-community tool: the graph-sized tables are touched once (a semi-join
pulling the support's edges), everything after is support-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def approximate_pagerank(
    graph: Graph,
    seeds: list[int],
    alpha: float = 0.15,
    eps: float = 0.0,
    max_rounds: int = 8,
) -> DataFrame:
    """(id, p, res) over the touched support after batched push rounds.
    eps=0 pushes every node with positive residual for exactly
    ``max_rounds`` supersteps (deterministic, oracle-checkable); eps>0
    additionally stops early once no node has r >= eps*vol."""
    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    deg = g.degrees().select("id", F.col("wdeg").alias("vol"))
    edges = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))

    state = IterationState(None, "apr")
    init = 1.0 / len(seeds)
    pr = spark.createDataFrame(
        [(int(s), 0.0, init) for s in seeds], "id long, p double, res double"
    )
    pr = state.advance(0, pr.join(deg, "id", "left").fillna({"vol": 0.0}))

    for rnd in range(1, max_rounds + 1):
        active = pr.filter(
            (F.col("res") > 0) & (F.col("res") >= F.lit(eps) * F.col("vol"))
        )
        if eps > 0 and active.limit(1).count() == 0:
            break
        # mass each active u sends per unit weight; vol=0 nodes hold mass
        pushes = (
            active.filter(F.col("vol") > 0)
            .withColumnRenamed("id", "src")
            .join(edges, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(
                F.sum(
                    F.lit(1.0 - alpha) * F.col("res") * F.col("w") / (2.0 * F.col("vol"))
                ).alias("gain")
            )
        )
        settled = pr.select(
            "id",
            "vol",
            (
                F.col("p")
                + F.when(
                    (F.col("res") > 0)
                    & (F.col("res") >= F.lit(eps) * F.col("vol"))
                    & (F.col("vol") > 0),
                    F.lit(alpha) * F.col("res"),
                ).otherwise(0.0)
            ).alias("p"),
            F.when(
                (F.col("res") > 0)
                & (F.col("res") >= F.lit(eps) * F.col("vol"))
                & (F.col("vol") > 0),
                F.lit(1.0 - alpha) * F.col("res") / 2.0,
            )
            .otherwise(F.col("res"))
            .alias("res"),
        )
        pr = (
            settled.join(pushes, "id", "full")
            .join(deg.withColumnRenamed("vol", "dvol"), "id", "left")
            .select(
                "id",
                F.coalesce("p", F.lit(0.0)).alias("p"),
                (F.coalesce("res", F.lit(0.0)) + F.coalesce("gain", F.lit(0.0))).alias(
                    "res"
                ),
                F.coalesce("vol", "dvol", F.lit(0.0)).alias("vol"),
            )
        )
        pr = state.advance(rnd, pr)
    state.close()
    return pr.select("id", "p", "res")


def pagerank_nibble(
    graph: Graph,
    seeds: list[int],
    alpha: float = 0.15,
    eps: float = 0.0,
    max_rounds: int = 8,
    apr: DataFrame | None = None,
) -> DataFrame:
    """(id) — the best-conductance sweep prefix of the APR support,
    ascending ids. Scores/conductances are rounded to 9 dp before ranking
    and argmin so both engines agree on every discrete choice."""
    g = graph.to_undirected() if graph.directed else graph
    pr = (
        apr
        if apr is not None
        else approximate_pagerank(g, seeds, alpha=alpha, eps=eps, max_rounds=max_rounds)
    )
    n = g.num_nodes()
    deg = g.degrees()  # (id, degree, wdeg) — wdeg counts self-loops twice
    edges = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    # single-count weighted degree (forNeighborsOf semantics in the sweep)
    wdeg1 = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("wdeg1"))
    # totalVolume = 2 * totalEdgeWeight = sym-sum + self-loop sum
    tv = edges.agg(
        (
            F.sum("w")
            + F.coalesce(
                F.sum(F.when(F.col("src") == F.col("dst"), F.col("w"))), F.lit(0.0)
            )
        ).alias("tv")
    )

    support = materialize(
        pr.filter((F.col("p") > 0) | (F.col("res") > 0))
        .join(deg.select("id", "wdeg"), "id", "left")
        .join(wdeg1, "id", "left")
        .select(
            "id",
            F.round(
                F.col("p") / F.when(F.col("wdeg") > 0, F.col("wdeg")), 9
            ).alias("score"),
            F.coalesce("wdeg1", F.lit(0.0)).alias("wdeg1"),
        )
    )
    w_rank = Window.orderBy(F.col("score").desc_nulls_last(), F.col("id").asc())
    ranked = support.select("id", "wdeg1", F.row_number().over(w_rank).alias("rank"))

    ra = ranked.select(F.col("id").alias("src"), F.col("rank").alias("ra"))
    rb = ranked.select(F.col("id").alias("dst"), F.col("rank").alias("rb"))
    und = edges.filter(F.col("src") <= F.col("dst"))
    ev = (
        und.join(ra, "src", "left")
        .join(rb, "dst", "left")
        .select(
            F.when(
                F.col("src") == F.col("dst"), F.coalesce("ra", F.lit(None))
            )
            .otherwise(F.least(F.coalesce("ra", F.lit(2147483647)), F.coalesce("rb", F.lit(2147483647))))
            .alias("enter"),
            F.when(
                (F.col("src") != F.col("dst"))
                & F.col("ra").isNotNull()
                & F.col("rb").isNotNull(),
                F.greatest("ra", "rb"),
            ).alias("leave"),
            "w",
        )
        .filter(F.col("enter").isNotNull() & (F.col("enter") != 2147483647))
    )
    deltas = (
        ev.select(F.col("enter").alias("rank"), F.col("w").alias("d"))
        .unionByName(
            ev.filter(F.col("leave").isNotNull()).select(
                F.col("leave").alias("rank"), (-F.col("w")).alias("d")
            )
        )
        .groupBy("rank")
        .agg(F.sum("d").alias("delta"))
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(deltas, "rank", "left")
        .fillna({"delta": 0.0})
        .crossJoin(F.broadcast(tv))
        .select(
            "rank",
            "id",
            F.sum("delta").over(w_cum).alias("cut"),
            F.sum("wdeg1").over(w_cum).alias("vol"),
            "tv",
        )
        .select(
            "rank",
            "id",
            F.round(
                F.col("cut")
                / F.when(
                    F.least("vol", F.col("tv") - F.col("vol")) > 0,
                    F.least("vol", F.col("tv") - F.col("vol")),
                ),
                9,
            ).alias("cond"),
        )
        .filter(F.col("rank") < n)  # sweep set must stay below n nodes
        .filter(F.col("cond").isNotNull())
    )
    best = sweep.agg(F.min_by("rank", F.struct(F.col("cond"), F.col("rank"))).alias("k"))
    return (
        ranked.crossJoin(F.broadcast(best))
        .filter(F.col("rank") <= F.col("k"))
        .select("id")
        .orderBy("id")
    )


def lfm(
    graph: Graph,
    alpha: float = 0.15,
    eps: float = 0.0,
    nibble_rounds: int = 8,
    max_communities: int = 32,
    seed: int = 42,
) -> DataFrame:
    """cover(id, subset) — overlapping communities via LFM (ref:
    networkit/cpp/community/LFM.cpp:17-41): repeatedly pick an uncovered
    node and expand one community around it with a selective community
    detector; nodes reached by several expansions belong to several
    subsets. The expander here is PageRankNibble (the engine's SCD), and
    the reference's forNodesInRandomOrder seed order is hash-derandomized
    (md5 rank) so runs are reproducible at any parallelism. The loop is
    sequential in the number of COMMUNITIES (the reference's is too);
    each expansion is the batched-push APR + sweep superstep plan."""
    from networkit_spark.functions.hashing import md5_long_sql

    spark = graph.vertices.sparkSession
    ranked = graph.vertices.withColumn(
        "hstr", F.concat_ws(":", F.lit(str(seed)), F.col("id"))
    ).withColumn("h", F.expr(md5_long_sql("hstr"))).select("id", "h")
    ranked = ranked.localCheckpoint(eager=True)

    covered = spark.createDataFrame([], "id long")
    parts = []
    for o in range(max_communities):
        nxt = (
            ranked.join(covered, "id", "anti")
            .orderBy("h", "id")
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        s = int(nxt[0]["id"])
        comm = pagerank_nibble(
            graph, [s], alpha=alpha, eps=eps, max_rounds=nibble_rounds
        ).select("id")
        comm = comm.unionByName(
            spark.createDataFrame([(s,)], "id long")
        ).distinct().localCheckpoint(eager=True)
        parts.append(comm.withColumn("subset", F.lit(o).cast("long")))
        covered = covered.unionByName(comm).distinct().localCheckpoint(eager=True)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("id", "subset")


def gce(
    graph: Graph,
    seeds: list[int],
    max_steps: int = 20,
    pinned: bool = False,
    objective: str = "M",
) -> DataFrame:
    """(seed, node) — Greedy Community Expansion (ref: scd/GCE.cpp:44-116
    expandseedInternal): starting from each seed, repeatedly admit the
    shell node maximizing dQ while some dQ > 0.

    objective "M" (expandseedInternal<true>):
        dQ = (W_int + intDeg) / (cut - intDeg + extDeg) - W_int / cut.
    objective "L" (expandseedInternal<false>, GCE.cpp:56-68,82-86):
        Q = 2 W_int B / (|S| cut) with B = # boundary members (members
        with an external neighbor); admitting v changes the boundary by
        boundaryChange(v) = [v has an external neighbor] - #{members whose
        ONLY external neighbor is v}, giving
        dQ = 2 (W_int+intDeg)(B+Δb) / ((|S|+1)(cut-intDeg+extDeg)) - Q.

    The reference breaks dQ ties uniformly at random; here ties go to the
    smallest node id so the DuckDB oracle replays the identical
    expansion.  Self-loops are excluded (GCE.cpp:18-20 rejects them).

    ALL seed expansions advance simultaneously as one (seed, node)
    membership table: each greedy step is one adjacency join + a few
    seed-keyed aggregations + a per-seed top-1 window — the per-seed
    community is small (locality is the point of SCD), so the window
    partitions are tiny and the shuffle is bounded by
    |members| x avg-degree rows per superstep.  ``pinned=True`` runs
    exactly max_steps rounds with no early-exit action, the
    oracle-checkable mode.
    """
    if objective not in ("M", "L"):
        raise ValueError("objective must be 'M' or 'L' (GCE.cpp:118-126)")
    adj = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    wdeg = adj.groupBy(F.col("src").alias("dst")).agg(F.sum("w").alias("wd"))
    ncnt = adj.groupBy(F.col("src").alias("dst")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    spark = graph.vertices.sparkSession
    mem = materialize(
        spark.createDataFrame(
            [(int(s), int(s)) for s in seeds], "seed long, node long"
        )
    )

    state = IterationState(None, "gce")
    for t in range(1, max_steps + 1):
        rows = (
            mem.withColumnRenamed("node", "src")
            .join(adj, "src")
            .join(
                mem.select("seed", F.col("node").alias("dst"), F.lit(True).alias("inm")),
                ["seed", "dst"],
                "left",
            )
            .select(
                "seed", "src", "dst", "w",
                F.coalesce("inm", F.lit(False)).alias("inm"),
            )
        )
        agg = rows.groupBy("seed").agg(
            (
                F.coalesce(F.sum(F.when(F.col("inm"), F.col("w"))), F.lit(0.0)) / 2.0
            ).alias("wint"),
            F.coalesce(
                F.sum(F.when(~F.col("inm"), F.col("w"))), F.lit(0.0)
            ).alias("cut"),
        )
        cand = (
            rows.filter(~F.col("inm"))
            .groupBy("seed", "dst")
            .agg(F.sum("w").alias("intdeg"), F.count(F.lit(1)).alias("ic"))
        )
        if objective == "M":
            denom = F.col("cut") - F.col("intdeg") + (F.col("wd") - F.col("intdeg"))
            dq = (
                F.when(denom > 0, (F.col("wint") + F.col("intdeg")) / denom)
                .otherwise(F.lit(1e308))
                - F.col("wint") / F.col("cut")
            )
            scored = (
                cand.join(agg, "seed")
                .join(wdeg, "dst")
                .filter(F.col("cut") > 0)
                .select("seed", "dst", dq.alias("dq"))
            )
        else:
            extc = rows.groupBy("seed", "src").agg(
                F.sum(F.when(~F.col("inm"), F.lit(1)).otherwise(F.lit(0))).alias("xc")
            )
            bsz = (
                extc.filter(F.col("xc") > 0)
                .groupBy("seed")
                .agg(F.count(F.lit(1)).alias("b"))
            )
            szs = mem.groupBy("seed").agg(F.count(F.lit(1)).alias("sz"))
            lastc = (
                rows.filter(~F.col("inm"))
                .join(
                    extc.filter(F.col("xc") == 1).select("seed", "src"),
                    ["seed", "src"],
                    "semi",
                )
                .groupBy("seed", "dst")
                .agg(F.count(F.lit(1)).alias("lc"))
            )
            db = (
                F.when(F.col("nc") - F.col("ic") > 0, F.lit(1)).otherwise(F.lit(0))
                - F.coalesce(F.col("lc"), F.lit(0))
            )
            denoml = (F.col("sz") + 1) * (
                F.col("cut") - F.col("intdeg") + (F.col("wd") - F.col("intdeg"))
            )
            dq = (
                F.when(
                    denoml > 0,
                    2.0 * (F.col("wint") + F.col("intdeg")) * (F.col("b") + db)
                    / denoml,
                ).otherwise(F.lit(1e308))
                - 2.0 * F.col("wint") * F.col("b")
                / (F.col("sz") * F.col("cut"))
            )
            scored = (
                cand.join(agg, "seed")
                .join(wdeg, "dst")
                .join(ncnt, "dst")
                .join(szs, "seed")
                .join(bsz.withColumnRenamed("b", "b"), "seed", "left")
                .join(lastc, ["seed", "dst"], "left")
                .select(
                    "seed", "dst",
                    F.coalesce("b", F.lit(0)).alias("b"),
                    "wint", "cut", "intdeg", "wd", "nc", "ic", "sz", "lc",
                )
                .filter(F.col("cut") > 0)
                .select("seed", "dst", dq.alias("dq"))
            )
        scored = scored.filter(F.col("dq") > 0)
        w = Window.partitionBy("seed").orderBy(F.desc("dq"), F.asc("dst"))
        winners = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("seed", F.col("dst").alias("node"))
        )
        mem = state.advance(t, mem.unionByName(winners))
        if not pinned and winners.isEmpty():
            break
    state.close()
    return mem


def scd_ground_truth_comparison(
    found: DataFrame, truth: DataFrame, ignore_seeds: bool = False
) -> DataFrame:
    """(seed, jaccard, f1, precision, recall) — each metric is the BEST
    value of the seed's found community against any ground-truth subset,
    maximized independently (ref: scd/SCDGroundTruthComparison.cpp:11-110).
    With ignore_seeds=False only truth subsets CONTAINING the seed are
    allowed (:59-71); seeds whose community overlaps no allowed subset
    score 0.

    ``found`` is (seed, node); ``truth`` is a cover (id, subset) —
    partitions are the single-membership special case.  Pure joins and
    label-keyed aggregations on exact counts: no float summation, so the
    DuckDB oracle is bit-identical.
    """
    fs = found.groupBy("seed").agg(
        F.count(F.lit(1)).cast("double").alias("fsz")
    )
    ts = truth.groupBy("subset").agg(
        F.count(F.lit(1)).cast("double").alias("tsz")
    )
    ov = found.join(
        truth.select(F.col("id").alias("node"), "subset"), "node"
    )
    if not ignore_seeds:
        allowed = (
            found.select("seed")
            .distinct()
            .join(truth.select(F.col("id").alias("seed"), "subset"), "seed")
        )
        ov = ov.join(allowed, ["seed", "subset"], "semi")
    ov = ov.groupBy("seed", "subset").agg(
        F.count(F.lit(1)).cast("double").alias("ov")
    )
    o, f_, t_ = F.col("ov"), F.col("fsz"), F.col("tsz")
    metrics = (
        ov.join(fs, "seed")
        .join(ts, "subset")
        .select(
            "seed",
            (o / (f_ + t_ - o)).alias("j"),
            (o / t_).alias("recall"),
            (o / f_).alias("precision"),
            F.when(
                o > 0,
                2 * (o / f_) * (o / t_) / ((o / f_) + (o / t_)),
            )
            .otherwise(F.lit(0.0))
            .alias("f1"),
        )
    )
    best = metrics.groupBy("seed").agg(
        F.max("j").alias("j"),
        F.max("f1").alias("f1"),
        F.max("precision").alias("precision"),
        F.max("recall").alias("recall"),
    )
    return (
        fs.join(best, "seed", "left")
        .select(
            "seed",
            F.coalesce("j", F.lit(0.0)).alias("jaccard"),
            F.coalesce("f1", F.lit(0.0)).alias("f1"),
            F.coalesce("precision", F.lit(0.0)).alias("precision"),
            F.coalesce("recall", F.lit(0.0)).alias("recall"),
        )
    )


def set_conductance(graph: Graph, community: list[int]) -> float:
    """scd/SetConductance.cpp:10-47: phi = cut / min(vol(C), vol(rest)),
    volumes from the symmetrized incident weights (self-loops doubled),
    1.0 when either side is empty. One filtered aggregation."""
    cset = [int(x) for x in community]
    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession
    cdf = spark.createDataFrame([(c,) for c in cset], "id long")
    e = g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    inc = e.join(cdf.withColumnRenamed("id", "src"), "src")
    row = (
        inc.join(
            cdf.select(F.col("id").alias("dst"), F.lit(1).alias("in_c")),
            "dst",
            "left",
        )
        .agg(
            F.sum(F.when(F.col("in_c").isNull(), F.col("w")).otherwise(0.0)).alias(
                "cut"
            ),
            F.sum(
                F.when(F.col("src") == F.col("dst"), 2 * F.col("w")).otherwise(
                    F.col("w")
                )
            ).alias("vol"),
        )
        .first()
    )
    cut = float(row["cut"] or 0.0)
    vol = float(row["vol"] or 0.0)
    total = 2.0 * g.total_edge_weight()
    rest = total - vol
    if vol > 0 and rest > 0:
        return cut / min(vol, rest)
    return 1.0


def random_bfs_community(graph: Graph, seed_node: int, size: int, seed: int = 42) -> list[int]:
    """scd/RandomBFS.cpp:28-78 — grow a community of ``size`` nodes by BFS
    levels from the seed; the partially-admitted last level is a uniform
    draw, hash-derandomized here (md5 rank instead of std::shuffle) so the
    result is a pure function of (seed, graph). Level expansion is the
    standard frontier superstep; the partial level is a distributed
    top-k (orderBy + limit)."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.plans.checkpoint import materialize

    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession
    edges = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    result = spark.createDataFrame([(int(seed_node),)], "id long").localCheckpoint(
        eager=True
    )
    level = result
    taken = 1
    while taken < size:
        nxt = (
            edges.join(level.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(result, "id", "anti")
        )
        nxt = materialize(nxt)
        c = nxt.count()
        if c == 0:
            break
        if taken + c <= size:
            admitted = nxt
        else:
            h = F.expr(md5_long_sql(f"('{seed}:rbfs:' || CAST(id AS STRING))"))
            admitted = (
                nxt.select("id", h.alias("_h"))
                .orderBy("_h", "id")
                .limit(size - taken)
                .select("id")
            )
            admitted = materialize(admitted)
            c = size - taken
        result = materialize(result.unionByName(admitted))
        taken += c
        level = admitted
    return sorted(int(r["id"]) for r in result.collect())


def combined_scd(
    graph: Graph, seed_node: int, first_size: int = 5, **gce_kwargs
) -> DataFrame:
    """(seed, node) — scd/CombinedSCD.cpp: run one SCD algorithm and feed
    its community as the seed set of a second — here RandomBFS (cheap
    local cover) into GCE greedy expansion. Documented deviation: our GCE
    expands per seed; the combined community is the union of the
    expansions from every first-stage member, labeled by the original
    seed (the reference's set-seeded expansion admits a superset the same
    way)."""
    seeds = random_bfs_community(graph, seed_node, first_size)
    return (
        gce(graph, seeds, **gce_kwargs)
        .select("node")
        .distinct()
        .select(F.lit(int(seed_node)).cast("long").alias("seed"), "node")
    )
