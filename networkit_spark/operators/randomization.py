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

from networkit_spark.graph import Graph
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

    Returns (shuffled Graph, mapping DataFrame(id, new_id)).
    """
    deg = (
        graph.vertices.join(
            graph.edges.filter(F.col("src") != F.col("dst"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg")),
            "id",
            "left",
        )
        .select("id", F.coalesce("deg", F.lit(0)).alias("deg"))
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
