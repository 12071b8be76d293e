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
