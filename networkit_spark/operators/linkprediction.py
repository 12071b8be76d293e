"""Link-prediction indices (ref: networkit/cpp/linkprediction/ — 30+
`LinkPredictor` subclasses, each scoring a node pair from neighborhood
statistics; bindings networkit/linkprediction.pyx).

One distributed pass computes every neighborhood-overlap index at once for
all 2-hop candidate pairs (non-adjacent pairs with >=1 common neighbor —
the pairs every overlap index is nonzero for):

    common-neighbors path: e(u,w) ⋈ e(w,v), u<v  →  groupBy(u,v)
    cn  = count(w)                        (CommonNeighborsIndex.cpp)
    aa  = Σ 1/ln(deg(w))                  (AdamicAdarIndex.cpp)
    ra  = Σ 1/deg(w)                      (ResourceAllocationIndex.cpp)
    jac = cn / (deg u + deg v − cn)       (JaccardIndex.cpp)
    pa  = deg u · deg v                   (PreferentialAttachmentIndex.cpp)
    tn  = deg u + deg v − cn              (TotalNeighborsIndex.cpp)

The wedge join is the same shape as triangle counting's, with a hub-hinge
degree cap standing in for the orientation bound triangles enjoy.
Scores for ALREADY-ADJACENT pairs are excluded (the predictors' typical
training protocol drops known edges). Every index is a pure column
expression over one partial+final aggregation — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _simple_edges(graph: Graph) -> DataFrame:
    g = graph.to_undirected() if graph.directed else graph
    return (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def link_prediction_scores(
    graph: Graph, min_common: int = 1, max_hinge_degree: int | None = None
) -> DataFrame:
    """(u, v, cn, aa, ra, jaccard, pa, tn) for all non-adjacent 2-hop pairs
    with at least ``min_common`` common neighbors; u < v.

    ``max_hinge_degree`` caps the wedge explosion: a hinge vertex w
    contributes deg(w)^2 candidate rows, so one hub (the fork's RMAT sweep
    has Delta≈195k) alone yields ~4e10 pairs. Hubs are dropped as hinges —
    the same stop-key pattern as dedup's ``max_shingle_freq`` — which is
    also what AA/RA semantics want (their 1/log(deg) and 1/deg terms send
    hub contributions to ~0 anyway, AdamicAdarIndex.cpp). Pass None for the
    exact small-graph result."""
    e = _simple_edges(graph)
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # hinge-degree table joined BEFORE the wedge self-join so the hub cap
    # prunes the explosion at its source (no forced broadcast — deg is
    # vertex-sized; AQE promotes to broadcast when it fits)
    dw = deg.withColumnRenamed("id", "w").withColumnRenamed("deg", "wdeg")
    if max_hinge_degree is not None:
        dw = dw.filter(F.col("wdeg") <= max_hinge_degree)

    # wedge u - w - v (symmetric table: both directions present, so one
    # join over the hinge w enumerates each unordered pair twice; u<v keeps
    # one copy and drops w-centered duplicates)
    ew = e.select(F.col("dst").alias("w"), F.col("src").alias("u")).join(dw, "w")
    wv = e.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = ew.join(wv, "w").filter(F.col("u") < F.col("v"))
    # min_common pushed into the aggregation (HAVING — filters before the
    # anti-join and degree joins touch the pair set)
    overlap = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum(1.0 / F.log(F.col("wdeg"))).alias("aa"),
            F.sum(1.0 / F.col("wdeg")).alias("ra"),
        )
        .filter(F.col("cn") >= min_common)
    )
    # drop pairs that are already edges
    existing = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = overlap.join(existing, ["u", "v"], "anti")
    du = deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du")
    dv = deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv")
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            "aa",
            "ra",
            (F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn"))).alias("jaccard"),
            (F.col("du") * F.col("dv")).cast("long").alias("pa"),
            (F.col("du") + F.col("dv") - F.col("cn")).cast("long").alias("tn"),
        )
    )


def top_predicted_links(graph: Graph, k: int = 50, by: str = "aa") -> DataFrame:
    """Top-k candidate links by the given index, deterministic total order
    (score desc, u asc, v asc) — the KFoldCrossValidator-style ranking
    surface of the reference's prediction pipeline."""
    s = link_prediction_scores(graph)
    return s.orderBy(F.desc(by), F.asc("u"), F.asc("v")).limit(k)


def extended_link_prediction_scores(
    graph: Graph, min_common: int = 1, max_hinge_degree: int | None = None
) -> DataFrame:
    """(u, v, cn, nd, ari, u_deg, v_deg, nm) — the remaining neighborhood
    indices of the reference's predictor family, over the same candidate
    set as :func:`link_prediction_scores` (non-adjacent 2-hop pairs with
    >= ``min_common`` common neighbors, u < v):

    - nd  — NeighborhoodDistanceIndex.hpp:31-36: cn / sqrt(deg u · deg v)
    - ari — AdjustedRandIndex.cpp:15-41.  NOTE: the reference computes its
      b and c terms with std::set_union (not set_difference), so
      b = c = |N(u) ∪ N(v)|; this quirk is reproduced verbatim for parity
      (with a = cn, un = |N(u) ∪ N(v)| = deg u + deg v − cn on simple
      support, d = n − un, the score simplifies to
      (a·d − un²) / ((a + un)·(un + d)), 0 when the denominator is 0).
    - u_deg / v_deg — UDegreeIndex.hpp / VDegreeIndex.hpp: endpoint degrees
      of the canonical (u < v) pair.
    - nm  — NeighborsMeasureIndex.hpp:34-45: over all ordered pairs
      (a, b) ∈ N(u) × N(v), count a == b or (a, b) ∈ E; distributed as
      cn + the 3-path count u–a–b–v (the a == b cases are exactly the
      common neighbors; a ≠ b with an edge are exactly the 3-paths), so
      the shuffle carries paths, not the reference's du·dv probe pairs.

    ``max_hinge_degree`` caps both the wedge hinge w AND the 3-path inner
    hinge a (the same hub-explosion guard as the base indices — at hub
    vertices the path count through them is degree-quadratic)."""
    e = _simple_edges(graph)
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    n = graph.vertices.count()

    dw = deg.withColumnRenamed("id", "w").withColumnRenamed("deg", "wdeg")
    if max_hinge_degree is not None:
        dw = dw.filter(F.col("wdeg") <= max_hinge_degree)
    ew = e.select(F.col("dst").alias("w"), F.col("src").alias("u")).join(dw, "w")
    wv = e.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = ew.join(wv, "w").filter(F.col("u") < F.col("v"))
    overlap = (
        wedges.groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .filter(F.col("cn") >= min_common)
    )
    existing = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = overlap.join(existing, ["u", "v"], "anti")

    # 3-path count u-a-b-v restricted to the candidate set: expanding FROM
    # the (already aggregated, already capped) pairs bounds the join to
    # paths that can contribute, instead of materializing N(u) x N(v)
    ua = e.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    if max_hinge_degree is not None:
        ua = ua.join(
            deg.select(F.col("id").alias("a"), "deg")
            .filter(F.col("deg") <= max_hinge_degree)
            .select("a"),
            "a",
        )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    vb = e.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    paths = (
        cand.select("u", "v")
        .join(ua, "u")
        .join(ab, "a")
        .join(vb, ["v", "b"])  # membership probe: b in N(v); e is distinct
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("p3"))
    )

    du = deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du")
    dv = deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv")
    un = F.col("du") + F.col("dv") - F.col("cn")
    d = F.lit(float(n)) - un
    ari_den = (F.col("cn") + un) * (un + d)
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .join(paths, ["u", "v"], "left")
        .select(
            "u",
            "v",
            "cn",
            (F.col("cn") / F.sqrt(F.col("du") * F.col("dv"))).alias("nd"),
            F.when(ari_den != 0, (F.col("cn") * d - un * un) / ari_den)
            .otherwise(F.lit(0.0))
            .alias("ari"),
            F.col("du").cast("long").alias("u_deg"),
            F.col("dv").cast("long").alias("v_deg"),
            (F.col("cn") + F.coalesce(F.col("p3"), F.lit(0))).cast("long").alias("nm"),
        )
    )


def same_community_index(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Adds ``sc`` (1/0) to a (u, v, ...) pair table: whether both endpoints
    share a community label (SameCommunityIndex.cpp:28-30; the reference
    bakes in a PLM partition — here any (id, label) partition table works,
    so the detector choice stays composable)."""
    lu = labels.select(F.col("id").alias("u"), F.col("label").alias("_lu"))
    lv = labels.select(F.col("id").alias("v"), F.col("label").alias("_lv"))
    return (
        pairs.join(lu, "u")
        .join(lv, "v")
        .withColumn(
            "sc", (F.col("_lu") == F.col("_lv")).cast("int")
        )
        .drop("_lu", "_lv")
    )


def algebraic_distance_index(
    graph: Graph,
    pairs: DataFrame,
    num_systems: int = 4,
    num_iters: int = 5,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Adds ``adi`` to a (u, v, ...) pair table: Lp (or max, norm=0)
    distance between the endpoints' algebraic-distance load vectors
    (AlgebraicDistanceIndex.cpp:47-70; preprocess() is the shared smoothed
    load iteration, operators/algebraic.py — hash-seeded like the edge-score
    variant, NaN -> 0 like the reference)."""
    from networkit_spark.operators.algebraic import algebraic_loads
    from networkit_spark.plans.checkpoint import materialize

    cols = [f"x{j}" for j in range(num_systems)]
    loads = materialize(
        algebraic_loads(graph, num_systems, num_iters, omega, seed)
    )
    a = loads.select(
        F.col("id").alias("u"), *[F.col(c).alias(f"a_{c}") for c in cols]
    )
    b = loads.select(
        F.col("id").alias("v"), *[F.col(c).alias(f"b_{c}") for c in cols]
    )
    joined = pairs.join(a, "u").join(b, "v")
    diffs = [F.abs(F.col(f"a_{c}") - F.col(f"b_{c}")) for c in cols]
    if norm == 0:
        dist = F.greatest(*diffs) if len(diffs) > 1 else diffs[0]
    else:
        s = diffs[0] ** float(norm)
        for dcol in diffs[1:]:
            s = s + dcol ** float(norm)
        dist = s ** (1.0 / norm)
    out = joined.withColumn(
        "adi", F.coalesce(F.nanvl(dist, F.lit(0.0)), F.lit(0.0))
    )
    return out.drop(*[f"a_{c}" for c in cols], *[f"b_{c}" for c in cols])


def threshold_links_by_score(
    pred: DataFrame, by: str, min_score: float
) -> DataFrame:
    """(u, v) pairs whose ``by`` score is >= min_score, pair-ascending
    (LinkThresholder.cpp byScore:19-31 — keeps score >= minScore)."""
    return (
        pred.filter(F.col(by) >= F.lit(min_score))
        .select("u", "v")
        .orderBy("u", "v")
    )


def threshold_links_by_count(pred: DataFrame, by: str, num_links: int) -> DataFrame:
    """(u, v) pairs of the ``num_links`` highest-scored predictions under
    the reference's ranking order (score desc, then pair ascending —
    PredictionsSorter.cpp ScoreComp), returned pair-ascending
    (LinkThresholder.cpp byCount:33-48).  The top-k is a distributed
    TakeOrderedAndProject, never a global single-task sort."""
    total = pred.count()
    if num_links > total:
        raise ValueError("num_links > predictions count")
    return (
        pred.orderBy(F.desc(by), F.asc("u"), F.asc("v"))
        .limit(int(num_links))
        .select("u", "v")
        .orderBy("u", "v")
    )


def threshold_links_by_percentage(
    pred: DataFrame, by: str, percentage: float
) -> DataFrame:
    """byPercentage (LinkThresholder.cpp:50-57): byCount with
    floor(percentage * count) links; percentage must be in [0, 1]."""
    if percentage < 0 or percentage > 1:
        raise ValueError("percentage not in [0, 1]")
    total = pred.count()
    return threshold_links_by_count(pred, by, int(percentage * total))
