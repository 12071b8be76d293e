"""Wedge-based exact triangle counting via degree-ordered orientation.

Reference technique (shared by TriangleEdgeScore, LocalClusteringCoefficient
and ClusteringCoefficient::exactGlobal): direct each undirected edge from the
higher-(degree, id) endpoint to the lower one — `isOutEdge` at
networkit/cpp/edgescores/TriangleEdgeScore.cpp:26-28 and
networkit/cpp/centrality/LocalClusteringCoefficient.cpp:21-23 — then close
wedges over the oriented adjacency so each triangle is found exactly once.

Spark-first plan: the orientation is a filter on the degree-joined edge table
(degree table broadcast when small); wedges are one self-equi-join of the
oriented table; closure is one more join against the oriented table. AQE
handles the skewed hub keys; there is no Python in the plan at all. This is
the canonical 2-join distributed triangle listing; the oriented table has
max out-degree O(sqrt(m)) regardless of hub degree, which is what bounds the
wedge explosion at 100 TB scale (same reason the reference orients).

Self-loops never form triangles here (src!=dst enforced); directed input is
treated as its undirected support, mirroring LocalClusteringCoefficient.cpp:7-9
which rejects directed graphs outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _oriented(graph: Graph) -> DataFrame:
    """One row per undirected edge, directed from higher (degree, id) to
    lower: (lo, hi) with rank(hi) > rank(lo). Returned columns (src, dst)
    where src is the HIGHER-ranked endpoint."""
    g = graph.to_undirected() if graph.directed else graph
    edges = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = g.degrees().select("id", "degree")
    # no forced broadcast: the degree table is vertex-sized (10^9+ rows at
    # target scale, a guaranteed OOM if hinted); AQE's runtime size stats
    # pick broadcast-hash automatically whenever it actually fits
    e = (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "sdeg")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("degree", "ddeg")
    )
    keep = (F.col("sdeg") > F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") > F.col("dst"))
    )
    return e.filter(keep).select("src", "dst")


def triangle_corners(graph: Graph) -> DataFrame:
    """(a, b, c) — one row per triangle, where edge orientation gives
    a -> b, a -> c, b -> c in oriented order (a highest-ranked)."""
    o = _oriented(graph).persist()
    # wedges centered at a: a->b and a->c with b != c (column-renamed copy
    # avoids the self-join ambiguity trap)
    oy = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    w = (
        o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(oy, "a")
        .filter(F.col("b") != F.col("c"))
    )
    # close: need oriented edge b->c (each unordered {b,c} appears once
    # as b->c or c->b across the two wedge rows, so the triangle is
    # counted exactly once)
    tri = w.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
        "semi",
    )
    return tri


def global_triangle_count(graph: Graph) -> int:
    return triangle_corners(graph).count()


def triangle_counts(graph: Graph) -> DataFrame:
    """(id, triangles: long) per node — union of the three corner roles
    (ref: LocalClusteringCoefficient.cpp:61-83 turbo path counts oriented
    wedges once then credits all three corners)."""
    tri = triangle_corners(graph)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    g = graph.to_undirected() if graph.directed else graph
    return (
        g.vertices.select("id")
        .join(counts, "id", "left")
        .fillna({"triangles": 0})
    )


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """(id, lcc: double) with c(u) = 2*tri(u) / (d(u)*(d(u)-1)); 0 when
    degree < 2 (ref: LocalClusteringCoefficient.cpp semantics; degree over
    the simple undirected support, self-loops excluded)."""
    g = graph.to_undirected() if graph.directed else graph
    simple_deg = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(graph)
    return (
        tri.join(simple_deg, "id", "left")
        .fillna({"degree": 0})
        .select(
            "id",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def global_transitivity(graph: Graph) -> float:
    """3*triangles / wedges (ref: ClusteringCoefficient::exactGlobal,
    global/ClusteringCoefficient.cpp:170-219 — triangles counted 6x over
    ordered wedges; equivalent closed form used here)."""
    g = graph.to_undirected() if graph.directed else graph
    tri = global_triangle_count(graph)
    wedges = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1)).alias("w"))
        .first()["w"]
        or 0
    )
    return (6.0 * tri / wedges) if wedges else 0.0


def approx_transitivity(
    graph: Graph, samples_per_vertex: int = 8, seed: int = 42
) -> float:
    """Sampled global clustering coefficient — the distributed, DETERMINISTIC
    analogue of ClusteringCoefficient::approxGlobal's wedge sampling
    (global/ClusteringCoefficient.cpp:135-283: draw a wedge ∝ per-vertex
    wedge count, test closure, average). Stratified reformulation: every
    vertex with deg >= 2 contributes ``samples_per_vertex`` hash-seeded
    neighbor pairs (with replacement); the estimate is the wedge-count-
    weighted closure rate  Σ_v w_v·ĉ_v / Σ_v w_v  — the same expectation,
    computed as one join + one aggregation instead of a sequential RNG loop.

    Pair selection is a pure function of (seed, vertex, trial) via the
    cross-engine 48-bit hash, so the DuckDB oracle reproduces it exactly.
    Cost: O(n·s) sampled wedges + one edge-existence join — the path you
    run when exact listing's O(m^1.5) is a luxury. Per-vertex neighbor
    arrays are degree-sized (the adjacency itself); hubs make wide rows,
    the cap being that a 10^8-degree hub should be tiered out first."""
    from networkit_spark.functions.hashing import md5_long_sql

    g = graph.to_undirected() if graph.directed else graph
    e = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    arr = (
        e.groupBy(F.col("src").alias("id"))
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).alias("deg"),
        )
        .filter(F.col("deg") >= 2)
    )
    samples = arr.select(
        "id",
        "nbrs",
        "deg",
        (F.col("deg") * (F.col("deg") - 1) / 2.0).alias("w"),
        F.explode(F.sequence(F.lit(0), F.lit(samples_per_vertex - 1))).alias("j"),
    )
    h1 = F.expr(
        md5_long_sql(f"('{seed}:' || CAST(id AS STRING) || ':' || CAST(j AS STRING) || ':0')")
    )
    h2 = F.expr(
        md5_long_sql(f"('{seed}:' || CAST(id AS STRING) || ':' || CAST(j AS STRING) || ':1')")
    )
    i1 = h1 % F.col("deg")
    r2 = h2 % (F.col("deg") - 1)
    i2 = r2 + F.when(r2 >= i1, F.lit(1)).otherwise(F.lit(0))
    picked = samples.select(
        "id",
        "w",
        F.element_at("nbrs", (i1 + 1).cast("int")).alias("b"),
        F.element_at("nbrs", (i2 + 1).cast("int")).alias("c"),
    )
    canon = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("b2"), F.col("dst").alias("c2")
    )
    checked = picked.join(
        canon,
        (F.least("b", "c") == F.col("b2")) & (F.greatest("b", "c") == F.col("c2")),
        "left",
    ).select("id", "w", F.col("b2").isNotNull().cast("double").alias("closed"))
    row = checked.agg(
        F.sum(F.col("w") * F.col("closed")).alias("num"),
        F.sum("w").alias("den"),
    ).first()
    num, den = row["num"] or 0.0, row["den"] or 0.0
    # den = S * Σ w_v (each vertex contributes S rows of weight w_v)
    return num / den if den > 0 else 0.0


def triangle_edge_scores(graph: Graph) -> DataFrame:
    """(src, dst, score: long) per canonical (src<dst) undirected edge: the
    number of triangles containing it (ref: TriangleEdgeScore.cpp:63-105)."""
    tri = triangle_corners(graph)
    e1 = tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = tri.select(F.col("a").alias("u"), F.col("c").alias("v"))
    e3 = tri.select(F.col("b").alias("u"), F.col("c").alias("v"))
    all_e = e1.unionByName(e2).unionByName(e3).select(
        F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
    )
    counted = all_e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("score"))
    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .distinct()
    )
    return canon.join(counted, ["src", "dst"], "left").fillna({"score": 0})
