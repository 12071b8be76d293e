"""Degree-preserving graph randomization (ref: networkit/cpp/randomization/
EdgeSwitching.cpp:10-51, GlobalCurveball.cpp; tests
randomization/test/*GTest.cpp).

The reference draws one switch at a time from a URNG: pick two edges
(s1,t1), (s2,t2), reject if the swap (s1,t2), (s2,t1) would create a
self-loop or multi-edge, else swap in place. That serial MCMC does not
distribute, but its *batch* form does — the Spark-first re-expression runs
hash-derandomized rounds:

  1. every canonical edge gets a per-round 64-bit hash; edges are thrown
     into ~m/2 buckets and each bucket's first two (hash-ordered) edges
     form a switch candidate — a parallel analogue of sampling disjoint
     edge pairs,
  2. an orientation bit (another hash bit) decides which endpoints trade,
     matching the reference's random i-th-neighbor draw,
  3. a pair commits only if neither proposed edge is a self-loop, the two
     proposals differ, and neither collides with the FULL pre-round edge
     set or any other proposal (one groupBy). Checking against the full
     pre-round set (rather than the post-removal survivor set) is slightly
     conservative but makes accept/reject decisions independent across
     pairs — no cascading reverts, one superstep per round.

Each committed switch is exactly the reference's swapEdge: degrees are
untouched, the graph stays simple. Self-loops (possible in the transcript
graph: an etype->etype transition to itself) are frozen — the reference
operates on simple graphs and never creates or destroys loops either.

Expected commit rate per round is a constant fraction of m (Poisson
bucketing yields ~1/(2e) of edges paired, minus collision rejects), so
``rounds ~ 2e * switches_per_edge`` reproduces the reference's
numberOfSwitchesPerEdge contract. All supersteps are joins/groupBys on
(src, dst) or bucket — no global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from networkit_spark.graph import Graph, require_fixture_scale
from networkit_spark.functions.hashing import md5_long_sql


def edge_switching(
    graph: Graph, rounds: int = 20, seed: int = 42
) -> Graph:
    """Randomized graph with the exact same degree sequence. Undirected
    input only (the reference's contract)."""
    if graph.directed:
        raise ValueError("edge switching randomizes undirected graphs")
    from networkit_spark.plans.checkpoint import materialize

    base = graph.edges.select("src", "dst")
    loops = base.filter(F.col("src") == F.col("dst")).distinct()
    canon = materialize(
        base.filter(F.col("src") < F.col("dst")).distinct()
    )
    m = canon.count()
    if m < 2:
        return graph

    n_buckets = max(1, m // 2)
    edges = canon
    for r in range(rounds):
        e = (
            edges.withColumn(
                "hstr",
                F.concat_ws(
                    ":", F.lit(str(seed)), F.lit(str(r)), F.col("src"), F.col("dst")
                ),
            )
            .withColumn("h", F.expr(md5_long_sql("hstr")))
            .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
        )
        w = F.row_number().over(
            Window.partitionBy("bucket").orderBy("h", "src", "dst")
        )
        e = e.withColumn("rk", w).filter(F.col("rk") <= 2)
        pairs = (
            e.filter(F.col("rk") == 1)
            .select(
                "bucket",
                F.col("src").alias("a"), F.col("dst").alias("b"),
                F.col("h").alias("h1"),
            )
            .join(
                e.filter(F.col("rk") == 2).select(
                    "bucket",
                    F.col("src").alias("c"), F.col("dst").alias("d"),
                ),
                "bucket",
            )
        )
        # orientation bit: swap partners (a,d)+(c,b) or (a,c)+(b,d)
        flip = F.pmod(F.col("h1"), F.lit(2)) == 1
        p1u = F.col("a")
        p1v = F.when(flip, F.col("c")).otherwise(F.col("d"))
        p2u = F.when(flip, F.col("b")).otherwise(F.col("c"))
        p2v = F.when(flip, F.col("d")).otherwise(F.col("b"))
        prop = pairs.filter(
            (p1u != p1v) & (p2u != p2v)
            & ~((F.least(p1u, p1v) == F.least(p2u, p2v))
                & (F.greatest(p1u, p1v) == F.greatest(p2u, p2v)))
        ).select(
            "bucket", "a", "b", "c", "d",
            F.least(p1u, p1v).alias("n1s"), F.greatest(p1u, p1v).alias("n1d"),
            F.least(p2u, p2v).alias("n2s"), F.greatest(p2u, p2v).alias("n2d"),
        )
        # collision check vs full pre-round set and vs other proposals
        cand = prop.select(
            F.col("bucket"), F.col("n1s").alias("src"), F.col("n1d").alias("dst")
        ).unionByName(
            prop.select("bucket", F.col("n2s").alias("src"), F.col("n2d").alias("dst"))
        )
        occupancy = (
            cand.join(edges.withColumn("pre", F.lit(1)), ["src", "dst"], "left")
            .groupBy("src", "dst")
            .agg(
                F.count(F.lit(1)).alias("nprop"),
                F.max("pre").alias("pre"),
            )
        )
        bad_edges = occupancy.filter(
            (F.col("nprop") > 1) | F.col("pre").isNotNull()
        ).select("src", "dst")
        bad_buckets = cand.join(bad_edges, ["src", "dst"], "semi").select(
            "bucket"
        ).distinct()
        ok = prop.join(bad_buckets, "bucket", "anti")
        removed = ok.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            ok.select(F.col("c").alias("src"), F.col("d").alias("dst"))
        )
        added = ok.select(F.col("n1s").alias("src"), F.col("n1d").alias("dst")).unionByName(
            ok.select(F.col("n2s").alias("src"), F.col("n2d").alias("dst"))
        )
        edges = (
            edges.join(removed, ["src", "dst"], "anti")
            .unionByName(added)
            .localCheckpoint(eager=True)
        )

    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = sym.unionByName(loops).withColumn("weight", F.lit(1.0).cast("float"))
    return Graph(graph.vertices, out, directed=False, weighted=False)


def degree_preserving_shuffle(
    graph: Graph, seed: int = 42, salt_buckets: int = 1
):
    """Relabel node ids by a permutation that only maps within equal-degree
    classes (ref: networkit/cpp/randomization/DegreePreservingShuffle.cpp:
    70-146 — per-degree-group Fisher-Yates). Distributed form: rank each
    degree class under two independent hash orders and map rank-to-rank;
    any such mapping is a uniform in-class permutation, so per-id degrees
    are EXACTLY preserved (degree(id) is invariant because ids trade places
    only with same-degree ids).

    ``salt_buckets > 1`` splits each degree class into hash salt buckets
    and permutes within buckets — the scale path for power-law graphs where
    one degree class (deg=1) would otherwise be a single window partition;
    still degree-preserving, just a subgroup of the permutation group.

    Directed graphs class on the (out, in) degree PAIR like the
    reference's DirectedDegree (DegreePreservingShuffle.cpp:29-38) —
    out-degree alone would let ids with different in-degrees trade
    places. Self-loops count toward the class key (a loopy id swapping
    with a loop-free one would change both ids' degrees).

    Returns (shuffled Graph, mapping DataFrame(id, new_id)).
    """
    out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("odeg")
    )
    if graph.directed:
        in_deg = graph.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("ideg")
        )
        deg = (
            graph.vertices.join(out_deg, "id", "left")
            .join(in_deg, "id", "left")
            .select(
                "id",
                F.concat_ws(
                    "|",
                    F.coalesce("odeg", F.lit(0)),
                    F.coalesce("ideg", F.lit(0)),
                ).alias("deg"),
            )
        )
    else:
        deg = graph.vertices.join(out_deg, "id", "left").select(
            "id", F.coalesce("odeg", F.lit(0)).alias("deg")
        )

    def ranked(tag: str, out: str):
        # the salt hash must NOT depend on the ranking tag: both rankings
        # need identical (deg, salt) class membership or the rank-to-rank
        # join stops being a permutation
        d = (
            deg.withColumn(
                "sstr",
                F.concat_ws(":", F.lit(str(seed)), F.lit("salt"), F.col("id")),
            )
            .withColumn(
                "salt",
                F.pmod(F.expr(md5_long_sql("sstr")), F.lit(salt_buckets))
                if salt_buckets > 1
                else F.lit(0),
            )
            .withColumn(
                "hstr",
                F.concat_ws(":", F.lit(str(seed)), F.lit(tag), F.col("id")),
            )
            .withColumn("h", F.expr(md5_long_sql("hstr")))
        )
        w = Window.partitionBy("deg", "salt").orderBy("h", "id")
        return d.select(
            "deg", "salt", F.col("id").alias(out),
            F.row_number().over(w).alias("rk"),
        )

    mapping = (
        ranked("a", "id")
        .join(ranked("b", "new_id"), ["deg", "salt", "rk"])
        .select("id", "new_id")
    )
    ms = mapping.withColumnRenamed("id", "src").withColumnRenamed("new_id", "new_src")
    md = mapping.withColumnRenamed("id", "dst").withColumnRenamed("new_id", "new_dst")
    edges = (
        graph.edges.join(ms, "src")
        .join(md, "dst")
        .select(
            F.col("new_src").alias("src"),
            F.col("new_dst").alias("dst"),
            "weight",
        )
    )
    g = Graph(
        graph.vertices, edges, directed=graph.directed, weighted=graph.weighted
    )
    return g, mapping


def global_curveball(graph: Graph, rounds: int = 5, seed: int = 42) -> Graph:
    """Degree-preserving randomization by global curveball trades (ref:
    networkit/cpp/randomization/GlobalCurveball.cpp:1-71 wrapping the
    EM-GCB algorithm of GlobalCurveballImpl.hpp:125-320, Carstens et al.
    ESA 2018; tests randomization/test/GlobalCurveballGTest.cpp).

    Reference semantics per global trade: a round permutation orders the
    vertices; consecutive pairs (u, v) trade — common neighbours stay with
    both, the symmetric-difference neighbours are pooled and re-dealt
    uniformly at random, u drawing |N(u) \\ N(v)| of them. Every vertex
    participates in exactly one trade per round, every edge belongs to the
    trade of its earlier-ordered endpoint.

    Spark-first deviation (documented): the reference processes the n/2
    trades of a round SEQUENTIALLY in permutation order, re-queueing a
    traded edge into the same round when its new holder is a later-ordered
    vertex (GlobalCurveballImpl.hpp:205-216) — that intra-round cascade is
    what keeps simultaneous trades from colliding. Here all trades of a
    round run in PARALLEL, and collisions are handled like
    ``edge_switching`` handles them: a trade whose re-deal would recreate
    an edge that existed before the round outside the trade itself, or
    would collide with another trade's proposal, REVERTS wholesale to its
    original arcs (conservative Metropolis-style reject — state unchanged,
    degrees untouched, graph stays simple). Each accepted trade is exactly
    one reference curveball trade, so every round applies a disjoint union
    of valid trades; rejects only slow mixing, never bias a single trade's
    redistribution. All randomness is md5-derandomized: identical output
    at any parallelism, replayable by the serial referee in
    tests/test_randomization.py.

    Scale shape per round: one distributed rank (range partition, no
    global window), then joins/groupBys keyed on pair id; per-pair windows
    are bounded by deg(u)+deg(v) — the same hub-trade cost profile as the
    reference's per-trade neighbourhood scan.

    Undirected simple graphs (the reference's default contract;
    allowSelfLoops requires directed input there, Globals checked at
    GlobalCurveball.cpp:23-31). Self-loops in the input are frozen, like
    ``edge_switching``.
    """
    if graph.directed:
        raise ValueError("global_curveball randomizes undirected graphs")
    from networkit_spark.functions.ordering import global_cumsum
    from networkit_spark.plans.checkpoint import materialize

    base = graph.edges.select("src", "dst")
    loops = base.filter(F.col("src") == F.col("dst")).distinct()
    canon = materialize(base.filter(F.col("src") < F.col("dst")).distinct())
    verts = graph.vertices.select("id")

    for r in range(rounds):
        tag = f"{seed}:{r}"
        # -- 1. round permutation -> disjoint vertex pairs (pair, side) ----
        perm = verts.withColumn(
            "h",
            F.expr(
                md5_long_sql(f"concat_ws(':', '{tag}', 'perm', CAST(id AS STRING))")
            ),
        )
        ranked = global_cumsum(
            perm.withColumn("one", F.lit(1)), ["h", "id"], ["one"]
        ).select(
            "id",
            "h",
            ((F.col("cum_one") - 1) / 2).cast("long").alias("pair"),
            (F.col("cum_one") % 2).alias("side"),  # 1 = first member (u)
            F.col("cum_one").alias("rk"),
        )
        n_rows = ranked.count()  # also materializes the rank
        # the last rank of an odd-order graph has no partner: deactivate
        pairing = ranked.withColumn(
            "active",
            F.when(
                (F.lit(n_rows % 2 == 1)) & (F.col("rk") == n_rows), F.lit(False)
            ).otherwise(F.lit(True)),
        ).select("id", "h", "pair", "side", "active")

        # -- 2. edge ownership: the earlier-ordered endpoint's trade -------
        pa = pairing.select(
            F.col("id").alias("src"), F.col("h").alias("h_src"),
            F.col("pair").alias("pair_src"), F.col("active").alias("act_src"),
        )
        pb = pairing.select(
            F.col("id").alias("dst"), F.col("h").alias("h_dst"),
            F.col("pair").alias("pair_dst"), F.col("active").alias("act_dst"),
        )
        owned = (
            canon.join(pa, "src")
            .join(pb, "dst")
            .withColumn(
                "owner_is_src",
                (F.col("h_src") < F.col("h_dst"))
                | ((F.col("h_src") == F.col("h_dst")) & (F.col("src") < F.col("dst"))),
            )
            .select(
                "src",
                "dst",
                F.when(F.col("owner_is_src"), F.col("src")).otherwise(F.col("dst")).alias("owner"),
                F.when(F.col("owner_is_src"), F.col("dst")).otherwise(F.col("src")).alias("nb"),
                F.when(F.col("owner_is_src"), F.col("pair_src")).otherwise(F.col("pair_dst")).alias("pair"),
                F.when(F.col("owner_is_src"), F.col("act_src")).otherwise(F.col("act_dst")).alias("act"),
            )
        )
        untouched = owned.filter(~F.col("act")).select("src", "dst")
        arcs = owned.filter(F.col("act")).select("src", "dst", "owner", "nb", "pair")

        # partner lookup + per-pair member ids (u = side-1 member, v = other)
        members = (
            pairing.filter(F.col("active"))
            .groupBy("pair")
            .agg(
                F.max(F.when(F.col("side") == 1, F.col("id"))).alias("u"),
                F.max(F.when(F.col("side") == 0, F.col("id"))).alias("v"),
            )
        )
        arcs = arcs.join(members, "pair")
        # edge between the trade partners is pinned (reference pops it
        # before the re-deal, GlobalCurveballImpl.hpp:152-173)
        partner_edge = (F.col("nb") == F.col("u")) | (F.col("nb") == F.col("v"))

        # -- 3. common vs disjoint neighbours per trade --------------------
        per_nb = arcs.withColumn(
            "cnt", F.count(F.lit(1)).over(Window.partitionBy("pair", "nb"))
        )
        fixed = per_nb.filter(partner_edge | (F.col("cnt") == 2)).select("src", "dst")
        pool = per_nb.filter(~partner_edge & (F.col("cnt") == 1)).select(
            "pair", "u", "v", "owner", "nb", "src", "dst"
        )

        # -- 4. re-deal the pool: owner u draws k_u = |pool arcs from u| ---
        pool = pool.withColumn(
            "k_u",
            F.sum(F.when(F.col("owner") == F.col("u"), 1).otherwise(0)).over(
                Window.partitionBy("pair")
            ),
        ).withColumn(
            "deal_h",
            F.expr(
                md5_long_sql(
                    f"concat_ws(':', '{tag}', 'deal', CAST(pair AS STRING), CAST(nb AS STRING))"
                )
            ),
        )
        pool = pool.withColumn(
            "deal_rk",
            F.row_number().over(Window.partitionBy("pair").orderBy("deal_h", "nb")),
        ).withColumn(
            "new_owner",
            F.when(F.col("deal_rk") <= F.col("k_u"), F.col("u")).otherwise(F.col("v")),
        )
        proposals = pool.select(
            "pair",
            "src",
            "dst",
            F.least(F.col("new_owner"), F.col("nb")).alias("nsrc"),
            F.greatest(F.col("new_owner"), F.col("nb")).alias("ndst"),
        )

        # -- 5. conservative conflict reverts (edge_switching pattern) -----
        # pre-round edges annotated with their owning pair (null = inactive)
        pre = owned.select(
            "src", "dst", F.when(F.col("act"), F.col("pair")).alias("own_pair")
        )
        clash_pre = (
            proposals.join(
                pre.select(
                    F.col("src").alias("nsrc"), F.col("dst").alias("ndst"), "own_pair"
                ),
                ["nsrc", "ndst"],
                "left",
            )
            .filter(
                F.col("own_pair").isNull()
                | (F.col("own_pair") != F.col("pair"))
            )
            .join(
                pre.select(
                    F.col("src").alias("nsrc"), F.col("dst").alias("ndst")
                ).withColumn("pre_hit", F.lit(1)),
                ["nsrc", "ndst"],
                "semi",
            )
            .select("pair")
        )
        clash_dup = (
            proposals.groupBy("nsrc", "ndst")
            .agg(F.count(F.lit(1)).alias("np"), F.collect_set("pair").alias("ps"))
            .filter(F.col("np") > 1)
            .select(F.explode("ps").alias("pair"))
        )
        bad_pairs = clash_pre.unionByName(clash_dup).distinct()

        accepted = proposals.join(bad_pairs, "pair", "anti").select(
            F.col("nsrc").alias("src"), F.col("ndst").alias("dst")
        )
        reverted = proposals.join(bad_pairs, "pair", "semi").select("src", "dst")

        canon = materialize(
            untouched.unionByName(fixed)
            .unionByName(reverted)
            .unionByName(accepted)
        )

    sym = canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = sym.unionByName(loops).withColumn("weight", F.lit(1.0).cast("float"))
    return Graph(graph.vertices, out, directed=False, weighted=False)


def curveball(
    graph: Graph,
    trades: list[tuple[int, int]],
    seed: int = 42,
    max_m: int = 200_000,
) -> Graph:
    """Degree-preserving randomization by an ARBITRARY caller-supplied
    trade sequence — the uniform-trade Curveball variant
    (randomization/Curveball.cpp + CurveballImpl.cpp:395-527): each trade
    (u, v) keeps the common neighbors of u and v (and the u-v edge, if
    present) in place and redistributes the disjoint neighbors uniformly
    at random, |N(u) \\ common| of them to u and the rest to v. Exactly
    the reference's per-trade semantics over plain set adjacency — the
    reference's edge-OWNERSHIP adjacency + trade-offset lists
    (CurveballImpl.cpp:416-470 organize_neighbors) are an external-memory
    optimization for streaming many trades, not part of the estimand, so
    the fixture-tier port replaces them with a dict of neighbor sets and
    processes trades driver-sequentially (trades within a sequence are
    order-dependent by design; the reference is equally sequential).
    global_curveball (above) is the distributed round-based path.

    The disjoint shuffle derandomizes through one seeded numpy
    Generator, so (graph, trades, seed) fixes the output graph."""
    import numpy as np

    if graph.directed:
        raise ValueError("curveball randomizes undirected graphs")
    require_fixture_scale(graph, max_m, "curveball")
    spark = graph.vertices.sparkSession
    adj: dict[int, set[int]] = {}
    for r in graph.edges.select("src", "dst").distinct().collect():
        u, v = int(r["src"]), int(r["dst"])
        if u == v:
            raise ValueError("curveball expects no self-loops")
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    rng = np.random.default_rng(seed)
    for u, v in trades:
        nu = adj.get(u, set()) - {v}
        nv = adj.get(v, set()) - {u}
        shared = v in adj.get(u, set())
        common = nu & nv
        du = sorted(nu - common)
        dv = sorted(nv - common)
        disjoint = sorted(du + dv)
        u_setsize = len(du)
        rng.shuffle(disjoint)
        new_u = set(disjoint[:u_setsize]) | common
        new_v = set(disjoint[u_setsize:]) | common
        # detach old, attach new (neighbor sets of third parties update too)
        for x in nu:
            adj[x].discard(u)
        for x in nv:
            adj[x].discard(v)
        adj[u] = new_u | ({v} if shared else set())
        adj[v] = new_v | ({u} if shared else set())
        for x in new_u:
            adj.setdefault(x, set()).add(u)
        for x in new_v:
            adj.setdefault(x, set()).add(v)

    half = sorted(
        (u, x) for u, nb in adj.items() for x in nb if u < x
    )
    rows = [(u, x, 1.0) for u, x in half] + [(x, u, 1.0) for u, x in half]
    edges = spark.createDataFrame(rows, "src long, dst long, weight float")
    return Graph(graph.vertices, edges, directed=False, weighted=False)
