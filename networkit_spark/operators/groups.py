"""Group centrality: greedy group degree.

Reference: networkit/cpp/centrality/GroupDegree.cpp:24-140 — greedy
submodular maximization of the group degree (the number of nodes
reachable from the group in one hop, plus the group itself when
``countGroupNodes``): a lazy bucket-queue re-evaluates marginal gains
after each pick. The greedy pick sequence is identical here; the
reference breaks exact gain ties by queue extraction order (an
implementation artifact), this engine by smallest id (deterministic at
any parallelism — documented deviation).

Spark-first plan: one closed-neighborhood adjacency table; each of the
k rounds is one anti-join (uncovered targets) + one count aggregation +
one argmax — gains are recomputed exactly each round instead of lazily,
trading the queue's sequential O(1) pops for k parallel scans (k is
small; each scan is the m-row shuffle a superstep costs anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import materialize


def group_degree(
    graph: Graph, k: int = 5, count_group_nodes: bool = True
) -> DataFrame:
    """(rank, id, gain) — the greedy group in pick order with each pick's
    marginal coverage gain. Coverage = group ∪ N(group); with
    ``count_group_nodes`` False the group members themselves don't count
    (GroupDegree.hpp scoring switch)."""
    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    simple = (
        g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    closed = simple
    if count_group_nodes:
        closed = closed.unionByName(
            graph.vertices.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
    closed = materialize(closed)

    covered = spark.createDataFrame([], "id long")
    group = spark.createDataFrame([], "id long")
    picks: list[tuple[int, int, int]] = []
    n = graph.num_nodes()
    for rank in range(1, min(k, n) + 1):
        uncovered = closed.join(
            covered.withColumnRenamed("id", "dst"), "dst", "anti"
        )
        if not count_group_nodes:
            # group members are not score targets (|N(S) \ S| scoring);
            # marginal gains are taken at pick time, like the reference's
            # affected-node re-evaluation
            uncovered = uncovered.join(
                group.withColumnRenamed("id", "dst"), "dst", "anti"
            )
        gains = (
            graph.vertices.join(group, "id", "anti")
            .join(
                uncovered.groupBy(F.col("src").alias("id")).agg(
                    F.count(F.lit(1)).alias("gain")
                ),
                "id",
                "left",
            )
            .select("id", F.coalesce(F.col("gain"), F.lit(0)).alias("gain"))
        )
        best = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).first()
        picks.append((rank, int(best["id"]), int(best["gain"])))
        picked = spark.createDataFrame([(int(best["id"]),)], "id long")
        group = group.unionByName(picked).localCheckpoint(eager=True)
        newly = closed.join(picked.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id")
        )
        covered = (
            covered.unionByName(newly).distinct().localCheckpoint(eager=True)
        )
    return spark.createDataFrame(picks, "rank long, id long, gain long")


def group_degree_score(graph: Graph, k: int = 5, count_group_nodes: bool = True) -> int:
    """The group degree value of the greedy group — sum of marginal gains."""
    return int(
        group_degree(graph, k, count_group_nodes).agg(F.sum("gain")).first()[0] or 0
    )


def group_closeness(
    graph: Graph, k: int = 5, hops: DataFrame | None = None
) -> DataFrame:
    """(rank, id, farness) — greedy group-closeness group in pick order
    (ref: networkit/cpp/centrality/GroupCloseness.cpp:83-207): each step
    adds the candidate minimizing the group farness sum_v d(S, v); the
    reference seeds with the top-closeness node, which IS the
    farness-argmin single node, so plain greedy reproduces the sequence.
    Ties break to the smallest id (the reference's queue order is an
    implementation artifact — same documented deviation as group_degree).

    Unreachable targets count distance n (farness-with-penalty), which
    reduces to the reference's connected-graph semantics and makes the
    greedy well-defined on fragments. The reference prunes per-candidate
    BFS with bounds; here the batched APSP table D(s, v) is computed ONCE
    (one multi-source frontier loop) and each greedy round is a single
    join+agg over it: delta(c) = sum_v (min(D(c,v), gd(v)) - gd(v)).
    At 10^9 vertices the APSP table is the scale limit — the sampled-
    sources estimate (pass ``hops`` from a source sample) is the same
    plan shape."""
    from networkit_spark.operators.distance import multi_source_hops

    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    D = hops if hops is not None else multi_source_hops(g)
    D = materialize(D.select("s", F.col("id").alias("t"), "dist"))
    n = graph.num_nodes()

    gd = graph.vertices.select(
        F.col("id").alias("t"), F.lit(n).cast("long").alias("gd")
    ).localCheckpoint(eager=True)
    total = n * n
    group = spark.createDataFrame([], "id long")
    picks: list[tuple[int, int, int]] = []
    for rank in range(1, min(k, n) + 1):
        deltas = (
            D.join(gd, "t")
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum(F.least("dist", "gd") - F.col("gd")).alias("delta"))
        )
        cand = (
            graph.vertices.join(group, "id", "anti")
            .join(deltas, "id", "left")
            .select("id", (F.lit(total) + F.coalesce("delta", F.lit(0))).alias("farness"))
        )
        best = cand.orderBy(F.asc("farness"), F.asc("id")).limit(1).first()
        picks.append((rank, int(best["id"]), int(best["farness"])))
        total = int(best["farness"])
        picked = spark.createDataFrame([(int(best["id"]),)], "id long")
        group = group.unionByName(picked).localCheckpoint(eager=True)
        dbest = D.join(picked.withColumnRenamed("id", "s"), "s").select(
            "t", F.col("dist").alias("nd")
        )
        gd = (
            gd.join(dbest, "t", "left")
            .select("t", F.least("gd", F.coalesce("nd", F.col("gd"))).alias("gd"))
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(picks, "rank bigint, id bigint, farness bigint")


def group_harmonic_closeness(
    graph: Graph, k: int = 5, hops: DataFrame | None = None
) -> DataFrame:
    """(rank, id, score) — greedy group-harmonic-closeness group in pick
    order (ref: networkit/cpp/centrality/GroupHarmonicCloseness.cpp —
    greedily add the candidate maximizing the marginal gain of
    score(S) = sum_{t not in S} 1 / d(S, t), unreachable targets
    contributing 0; the reference's submodular upper-bound pruning is a
    pure evaluation-order optimization over the same greedy).  Ties break
    to the smallest id (same documented deviation as group_closeness).

    Same plan shape as group_closeness: batched APSP once, then each
    round is one join+agg over it — delta(v) = sum over v's reachable
    non-member targets of 1/min(gd(t), d(v,t)) - 1/gd(t), minus v's own
    previous contribution.  Marginal gains are quantized to 9 decimals
    before the argmax so the DuckDB oracle's floating summation order
    cannot flip exact-tie decisions."""
    from networkit_spark.operators.distance import multi_source_hops

    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    D = hops if hops is not None else multi_source_hops(g)
    D = materialize(D.select("s", F.col("id").alias("t"), "dist"))
    n = graph.num_nodes()
    BIG = 1e18

    gd = graph.vertices.select(
        F.col("id").alias("t"), F.lit(None).cast("double").alias("gd")
    ).localCheckpoint(eager=True)
    group = spark.createDataFrame([], "id long")
    picks: list[tuple[int, int, float]] = []
    score = 0.0
    for rank in range(1, min(k, n) + 1):
        # gd = 0 marks a member (its own pick row); 1/gd guarded for ANSI
        contrib_old = F.when(F.col("gd") > 0, 1.0 / F.col("gd")).otherwise(
            F.lit(0.0)
        )
        deltas = (
            D.filter(F.col("dist") > 0)
            .join(group.withColumnRenamed("id", "t"), "t", "anti")
            .join(gd, "t")
            .groupBy(F.col("s").alias("id"))
            .agg(
                F.sum(
                    1.0
                    / F.least(F.coalesce(F.col("gd"), F.lit(BIG)), F.col("dist"))
                    - contrib_old
                ).alias("delta")
            )
        )
        own = gd.select(F.col("t").alias("id"), contrib_old.alias("own"))
        cand = (
            graph.vertices.join(group, "id", "anti")
            .join(deltas, "id", "left")
            .join(own, "id", "left")
            .select(
                "id",
                (
                    F.coalesce("delta", F.lit(0.0))
                    - F.coalesce("own", F.lit(0.0))
                ).alias("gain"),
            )
        )
        best = (
            cand.orderBy(F.desc(F.round(F.col("gain"), 9)), F.asc("id"))
            .limit(1)
            .first()
        )
        score += float(best["gain"])
        picks.append((rank, int(best["id"]), float(score)))
        picked = spark.createDataFrame([(int(best["id"]),)], "id long")
        group = group.unionByName(picked).localCheckpoint(eager=True)
        dbest = D.join(picked.withColumnRenamed("id", "s"), "s").select(
            "t", F.col("dist").cast("double").alias("nd")
        )
        gd = (
            gd.join(dbest, "t", "left")
            .select(
                "t",
                F.coalesce(
                    F.least("gd", "nd"), F.col("gd"), F.col("nd")
                ).alias("gd"),
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(picks, "rank bigint, id bigint, score double")


def ged_walk_group(
    graph: Graph,
    k: int = 3,
    alpha: float = 0.1,
    levels: int = 4,
    pool_size: int = 6,
) -> DataFrame:
    """(rank, id, ged_score) — greedy GedWalk group centrality
    (ref: networkit/cpp/centrality/GedWalk.cpp, GedWalk.hpp:94-126):
    GED(S) = sum_{l >= 1} alpha^l * (# length-l walks that TOUCH S)
           = sum_l alpha^l * (w_l(G) - w_l(G minus S)),
    greedily adding the node with the largest marginal gain, i.e. the
    smallest avoided-walk mass w(G minus S minus v).

    Pinned-budget variant of the reference's adaptive machinery: the walk
    sum truncates at ``levels`` (the reference truncates adaptively under
    an epsilon bound) and greedy candidates come from the top
    ``pool_size`` vertices by (degree desc, id) (the reference lazily
    scores all nodes under upper bounds) — the same bounded-contract
    trade documented for TopCloseness. Ties break to the smallest id.

    Determinism across engines is exact, not approximate: per-level walk
    counts stay LONG integers (order-independent sums), and the damped
    total sum_l alpha^l * w_l is evaluated in fixed ascending-l order on
    both sides, so the greedy comparisons are bit-identical. Each level
    is one edge join + one aggregation with candidate columns riding
    along (pool_size + 1 LONG columns); k * levels supersteps total.
    Walks run over the simple undirected support (self-loops excluded).
    """
    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    adj = materialize(
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    pool = [
        int(r["id"])
        for r in deg.orderBy(F.desc("d"), F.asc("id")).limit(pool_size).collect()
    ]

    def avoided_mass(masks: list[list[int]]) -> list[float]:
        """For each mask (a node-id list), sum_l alpha^l * w_l(G minus mask),
        all masks advanced simultaneously as LONG columns."""
        cols = [f"x{j}" for j in range(len(masks))]
        state = graph.vertices.select(
            "id",
            *[
                F.when(F.col("id").isin([int(x) for x in m]), F.lit(0))
                .otherwise(F.lit(1))
                .cast("long")
                .alias(c)
                if m
                else F.lit(1).cast("long").alias(c)
                for m, c in zip(masks, cols)
            ],
        ).localCheckpoint(eager=True)
        totals = [0.0] * len(masks)
        for lvl in range(1, levels + 1):
            nbr = (
                adj.join(state.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(*[F.sum(c).alias(f"v_{c}") for c in cols])
            )
            state = (
                graph.vertices.select("id")
                .join(nbr, "id", "left")
                .select(
                    "id",
                    *[
                        F.when(
                            F.col("id").isin([int(x) for x in m]), F.lit(0)
                        )
                        .otherwise(F.coalesce(F.col(f"v_{c}"), F.lit(0)))
                        .cast("long")
                        .alias(c)
                        if m
                        else F.coalesce(F.col(f"v_{c}"), F.lit(0))
                        .cast("long")
                        .alias(c)
                        for m, c in zip(masks, cols)
                    ],
                )
                .localCheckpoint(eager=True)
            )
            row = state.agg(*[F.sum(c).alias(c) for c in cols]).first()
            for j in range(len(masks)):
                # fixed ascending-l order; identical expression in the oracle
                totals[j] = totals[j] + (alpha ** lvl) * float(row[cols[j]])
        return totals

    wall = avoided_mass([[]])[0]
    picks: list[tuple[int, int, float]] = []
    group: list[int] = []
    for rank in range(1, k + 1):
        cands = [v for v in pool if v not in group]
        if not cands:
            break
        totals = avoided_mass([group + [v] for v in cands])
        best_i = min(range(len(cands)), key=lambda i: (totals[i], cands[i]))
        group.append(cands[best_i])
        picks.append((rank, cands[best_i], float(wall - totals[best_i])))
    return spark.createDataFrame(picks, "rank bigint, id bigint, ged_score double")


def group_closeness_local_swaps(
    graph: Graph,
    group: list[int],
    max_rounds: int = 3,
    hops: DataFrame | None = None,
) -> DataFrame:
    """(round, out_id, in_id, farness) — local-search refinement of a
    group-closeness group by single swaps (ref:
    centrality/GroupClosenessGrowShrink.cpp + ...LocalSwaps.cpp: exchange
    a member with a non-member while the group farness decreases).

    Deterministic pinned variant of the reference's randomized
    grow-shrink: each round evaluates EVERY (member out, candidate in)
    swap exactly against the batched APSP table and applies the single
    best strictly-improving one (ties: smallest out id, then in id); a
    round with no improving swap applies nothing, so extra pinned rounds
    are no-ops — the oracle-checkable mode.  Unreachable targets count
    distance n (the group_closeness penalty convention).

    Removal is O(1) per target via the top-2 member distances (gd1, gd2
    + argmin): excluding member x leaves gd1 unless x IS the argmin, in
    which case gd2.  Each round is then one window over the member
    distances, one member-keyed base sum, and one (out, in, t) delta
    aggregation bounded by |S| x Σ_y |reach(y)| rows — no per-candidate
    BFS.  Emits one row per APPLIED swap.
    """
    from pyspark.sql import Window

    from networkit_spark.operators.distance import multi_source_hops

    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    D = hops if hops is not None else multi_source_hops(g)
    D = materialize(D.select("s", F.col("id").alias("t"), "dist"))
    n = graph.num_nodes()

    members = [int(x) for x in group]
    out_rows: list[tuple[int, int, int, int]] = []
    for rnd in range(1, max_rounds + 1):
        mem_df = spark.createDataFrame([(m,) for m in members], "s long")
        md = D.join(mem_df, "s")
        w = Window.partitionBy("t").orderBy(F.asc("dist"), F.asc("s"))
        top2 = (
            md.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .groupBy("t")
            .agg(
                F.min(F.when(F.col("rn") == 1, F.col("dist"))).alias("gd1"),
                F.min(F.when(F.col("rn") == 1, F.col("s"))).alias("arg1"),
                F.min(F.when(F.col("rn") == 2, F.col("dist"))).alias("gd2"),
            )
        )
        # excl(x, t) for every member x over ALL targets, penalty n
        excl = (
            spark.createDataFrame([(m,) for m in members], "x long")
            .crossJoin(graph.vertices.select(F.col("id").alias("t")))
            .join(top2, "t", "left")
            .select(
                "x",
                "t",
                F.coalesce(
                    F.when(F.col("arg1") == F.col("x"), F.col("gd2")).otherwise(
                        F.col("gd1")
                    ),
                    F.lit(n).cast("long"),
                ).alias("ex"),
            )
        )
        excl = materialize(excl)
        base = excl.groupBy("x").agg(F.sum("ex").alias("base"))
        cur_far = int(
            graph.vertices.select(F.col("id").alias("t"))
            .join(top2, "t", "left")
            .agg(F.sum(F.coalesce("gd1", F.lit(n).cast("long")))).first()[0]
        )
        ydist = D.join(mem_df.withColumnRenamed("s", "s"), "s", "anti").select(
            F.col("s").alias("y"), "t", F.col("dist").alias("dy")
        )
        deltas = (
            ydist.join(excl, "t")
            .filter(F.col("dy") < F.col("ex"))
            .groupBy("x", "y")
            .agg(F.sum(F.col("dy") - F.col("ex")).alias("delta"))
        )
        best = (
            deltas.join(base, "x")
            .select("x", "y", (F.col("base") + F.col("delta")).alias("nf"))
            .orderBy(F.asc("nf"), F.asc("x"), F.asc("y"))
            .limit(1)
            .first()
        )
        if best is None or int(best["nf"]) >= cur_far:
            break
        members = [m for m in members if m != int(best["x"])] + [int(best["y"])]
        out_rows.append((rnd, int(best["x"]), int(best["y"]), int(best["nf"])))
    return spark.createDataFrame(
        out_rows, "round bigint, out_id bigint, in_id bigint, farness bigint"
    )
