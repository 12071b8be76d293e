"""Edge-score combinators (edgescores/ + sparsification/ utility tier).

All operate on a canonical per-edge score table (u < v, score) — the
columnar stand-in for the reference's edge-id-indexed scoreData vectors —
and are pure column algebra except prefix-Jaccard (partitioned windows):

* GeometricMeanScore.cpp:20-40 — attr / sqrt(nodeSum(u)*nodeSum(v)),
  nodeSum = sum of incident attrs;
* EdgeScoreNormalizer.cpp:15-45 — linear rescale to [lower, upper],
  optional inversion;
* EdgeScoreBlender.cpp:15-25 — per-edge select attr1/attr0 by a boolean;
* EdgeScoreAsWeight.cpp:15-38 — weight = offset + factor*score(^2),
  returning a reweighted Graph;
* MultiscaleScore.cpp:14-63 (Serrano et al. multiscale backbone) —
  p = attr/sum over each endpoint's incident attrs,
  probability = 1-(1-p)^(deg-1), score = max over the two endpoints;
* PrefixJaccardScore.cpp:20-120 — per edge, the MAX over dense-rank
  prefixes of Jaccard(top-rank neighbors of u, of v), each endpoint's
  neighbors ranked by attribute desc with ties sharing a rank and the
  other endpoint excluded. Cost is O(sum_e deg(u)+deg(v)) rows — the same
  hub-quadratic shape as triangle listing; cap hubs upstream when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _node_sums(scores: DataFrame) -> DataFrame:
    return (
        scores.select(F.col("u").alias("id"), "score")
        .unionByName(scores.select(F.col("v").alias("id"), "score"))
        .groupBy("id")
        .agg(F.sum("score").alias("nsum"), F.count(F.lit(1)).alias("ndeg"))
    )


def geometric_mean_score(scores: DataFrame) -> DataFrame:
    """(u, v, score) -> (u, v, gm_score)."""
    ns = _node_sums(scores)
    return (
        scores.join(ns.select(F.col("id").alias("u"), F.col("nsum").alias("su")), "u")
        .join(ns.select(F.col("id").alias("v"), F.col("nsum").alias("sv")), "v")
        .select(
            "u",
            "v",
            F.when(
                F.col("score") > 0,
                F.col("score") / F.sqrt(F.col("su") * F.col("sv")),
            )
            .otherwise(F.lit(0.0))
            .alias("gm_score"),
        )
    )


def edge_score_normalizer(
    scores: DataFrame,
    lower: float = 0.0,
    upper: float = 1.0,
    invert: bool = False,
    col: str = "score",
) -> DataFrame:
    """Linear rescale of ``col`` into [lower, upper] as ``norm_score``."""
    mm = scores.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    lo, hi = float(mm["lo"]), float(mm["hi"])
    factor = (upper - lower) / (hi - lo) if hi > lo else 0.0
    offset = lower - lo * factor
    if invert:
        factor = -factor
        offset = upper - lo * factor
    return scores.withColumn(
        "norm_score", F.lit(factor) * F.col(col) + F.lit(offset)
    )


def edge_score_blender(
    selection: DataFrame, scores1: DataFrame, scores0: DataFrame
) -> DataFrame:
    """selection(u, v, sel boolean) picks scores1.score else scores0.score."""
    return (
        selection.join(
            scores1.withColumnRenamed("score", "s1"), ["u", "v"]
        )
        .join(scores0.withColumnRenamed("score", "s0"), ["u", "v"])
        .select(
            "u", "v", F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0")).alias("score")
        )
    )


def edge_score_as_weight(
    graph: Graph,
    scores: DataFrame,
    squared: bool = False,
    offset: float = 1.0,
    factor: float = 1.0,
) -> Graph:
    """Reweighted Graph: weight = offset + factor * score (or score^2);
    the symmetrized edge table keeps both directions."""
    s = F.col("score") * F.col("score") if squared else F.col("score")
    w = (F.lit(offset) + F.lit(factor) * s).cast("float").alias("weight")
    canon = scores.select("u", "v", w)
    sym = canon.select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight").unionByName(
        canon.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("src"), F.col("u").alias("dst"), "weight"
        )
    )
    return Graph(graph.vertices, sym, directed=False, weighted=True)


def multiscale_score(scores: DataFrame) -> DataFrame:
    """(u, v, ms_score): max over both endpoints of
    1 - (1 - attr/endpoint_sum)^(endpoint_degree - 1)."""
    ns = _node_sums(scores)
    j = (
        scores.join(
            ns.select(F.col("id").alias("u"), F.col("nsum").alias("su"), F.col("ndeg").alias("du")),
            "u",
        ).join(
            ns.select(F.col("id").alias("v"), F.col("nsum").alias("sv"), F.col("ndeg").alias("dv")),
            "v",
        )
    )
    # zero endpoint sums (all incident attrs 0) contribute 0, matching the
    # reference's max(0, NaN) -> 0 behaviour (std::max keeps the first arg)
    pu = F.when(
        F.col("su") > 0,
        1.0 - F.pow(1.0 - F.col("score") / F.col("su"), F.col("du").cast("double") - 1.0),
    ).otherwise(F.lit(0.0))
    pv = F.when(
        F.col("sv") > 0,
        1.0 - F.pow(1.0 - F.col("score") / F.col("sv"), F.col("dv").cast("double") - 1.0),
    ).otherwise(F.lit(0.0))
    return j.select("u", "v", F.greatest(pu, pv).alias("ms_score"))


def prefix_jaccard_score(scores: DataFrame) -> DataFrame:
    """(u, v, pj_score): best prefix-Jaccard over dense attribute ranks."""
    # directed neighbor-attribute view: (node, nbr, a)
    d = scores.select(
        F.col("u").alias("node"), F.col("v").alias("nbr"), F.col("score").alias("a")
    ).unionByName(
        scores.select(
            F.col("v").alias("node"), F.col("u").alias("nbr"), F.col("score").alias("a")
        )
    )
    # 0-based rank per node, attribute DESC, ties share a rank and the
    # next rank jumps by the tie-group size: the reference assigns
    # rank = #strictly-greater attributes (PrefixJaccardScore.cpp:69-80),
    # i.e. SQL rank() - 1, NOT dense_rank (rank VALUES pair u's and v's
    # prefixes, so the gap structure matters)
    wr = Window.partitionBy("node").orderBy(F.col("a").desc())
    ranked = d.withColumn("rk", F.rank().over(wr) - 1)
    e = scores.select("u", "v")
    a_side = (
        e.join(ranked.withColumnRenamed("node", "u"), "u")
        .filter(F.col("nbr") != F.col("v"))
        .select("u", "v", "nbr", F.col("rk").alias("ru"))
    )
    b_side = (
        e.join(ranked.withColumnRenamed("node", "v"), "v")
        .filter(F.col("nbr") != F.col("u"))
        .select("u", "v", "nbr", F.col("rk").alias("rv"))
    )
    common = a_side.join(b_side, ["u", "v", "nbr"]).select(
        "u", "v", F.greatest("ru", "rv").alias("rc")
    )
    # per-rank counts for each of the three sets, full-outer-merged so one
    # partitioned cumulative sum yields all prefix sizes at every rank
    ga = a_side.groupBy("u", "v", F.col("ru").alias("r")).agg(
        F.count(F.lit(1)).alias("na")
    )
    gb = b_side.groupBy("u", "v", F.col("rv").alias("r")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    gc = common.groupBy("u", "v", F.col("rc").alias("r")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    allr = (
        ga.join(gb, ["u", "v", "r"], "full")
        .join(gc, ["u", "v", "r"], "full")
        .fillna(0, subset=["na", "nb", "nc"])
    )
    wc = (
        Window.partitionBy("u", "v")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    jac = allr.select(
        "u",
        "v",
        (
            F.sum("nc").over(wc)
            / (F.sum("na").over(wc) + F.sum("nb").over(wc) - F.sum("nc").over(wc)).cast(
                "double"
            )
        ).alias("j"),
    )
    best = jac.groupBy("u", "v").agg(F.max("j").alias("pj_score"))
    return e.join(best, ["u", "v"], "left").select(
        "u", "v", F.coalesce("pj_score", F.lit(0.0)).alias("pj_score")
    )


def quadrangle_edge_score(graph: Graph) -> DataFrame:
    """(u, v, quadrangles) — per canonical undirected edge (u < v), the
    number of (not necessarily induced) 4-cycles containing it
    (edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp:15-120; both GTest
    fixtures transliterated in tests/test_edgescores.py).

    quad(u,v) = #{(y,x) in E : y in N(u)\\{v}, x in N(v)\\{u}, y != x} —
    each 4-cycle u-y-x-v contributes exactly one such opposite-edge pair.
    Distributed shape: a 3-chain join anchored on the opposite edge
    (y,x) — intermediate rows are the length-3 paths, Sum deg(y)*deg(x)
    over edges — closed by one inner join against the edge set. The same
    exact-tier complexity class as the reference's Chiba-Nishizeki pass;
    wedge-ordered orientation (triangles.py) is the hub-bound route if a
    power-law graph ever needs this score at scale."""
    e = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    left = e.select(F.col("dst").alias("u"), F.col("src").alias("y"))
    mid = e.select(F.col("src").alias("y"), F.col("dst").alias("x"))
    right = e.select(F.col("src").alias("x"), F.col("dst").alias("v"))
    paths = (
        left.join(mid, "y")
        .join(right, "x")
        .filter(
            (F.col("u") != F.col("x"))
            & (F.col("y") != F.col("v"))
            & (F.col("u") != F.col("v"))
        )
    )
    closed = paths.join(
        e.select(F.col("src").alias("u"), F.col("dst").alias("v")), ["u", "v"]
    )
    return (
        closed.filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("quadrangles"))
    )


def edge_score_linearizer(
    scores: DataFrame, inverse: bool = False, seed: int = 42
) -> DataFrame:
    """(u, v, score) -> (u, v, lin_score): rank position / (m-1) under the
    total order (score, tiebreak) — ascending, or descending when
    ``inverse`` — i.e. EdgeScoreLinearizer.cpp:21-56.  m == 1 degenerates
    to 0.5 like the reference's special case.

    Documented deviation: the reference breaks score ties with
    Aux::Random::integer() (a fresh random per run); here the tiebreak is
    the md5 hash of (seed, u, v) — same uniform-tie role, deterministic
    and cluster-reproducible like every other derandomized draw in this
    engine.  The rank is computed with the range-partition + offset
    pattern (functions/ordering.py), never a single-task global window."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.functions.ordering import global_cumsum

    m = scores.count()
    if m == 1:
        return scores.select("u", "v", F.lit(0.5).alias("lin_score"))
    tb = F.expr(
        md5_long_sql(
            f"('{seed}:lin:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
        )
    )
    sign = -1.0 if inverse else 1.0
    base = (
        scores.withColumn("_s", F.col("score") * F.lit(sign))
        .withColumn("_t", tb * F.lit(sign))
        .withColumn("_one", F.lit(1))
    )
    ranked = global_cumsum(base, ["_s", "_t", "u", "v"], ["_one"])
    return ranked.select(
        "u",
        "v",
        ((F.col("cum__one") - 1).cast("double") / F.lit(float(m - 1))).alias(
            "lin_score"
        ),
    )
