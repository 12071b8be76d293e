"""Assortativity coefficients (ref: correlation/Assortativity.cpp).

Two modes, both single-pass aggregations over the edge table:

* ordinal (numeric attribute, e.g. degree): Pearson correlation of the
  endpoint attribute pairs over edges (Assortativity.cpp:66-93). The
  reference iterates each undirected edge once in storage orientation; we
  use the orientation-free symmetric form (every edge contributes both
  (x_u,x_v) and (x_v,x_u)), which is the standard Newman definition and
  independent of edge orientation — one groupBy-free aggregate, no shuffle
  beyond the attribute join.

* nominal (partition labels): r = (Σ_i e_ii − Σ_i a_i b_i)/(1 − Σ_i a_i b_i)
  over the label-pair edge fractions (Assortativity.cpp:30-62) — two joins
  against the label table plus two tiny aggregates.

Scale: the attribute/label table is vertex-sized — joined, never broadcast
(AQE decides); everything else is edge-partitioned aggregation with
map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _directed_simple(graph: Graph) -> DataFrame:
    """Both directions of every simple undirected edge."""
    g = graph.to_undirected() if graph.directed else graph
    return (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def ordinal_assortativity(graph: Graph, attr: DataFrame) -> float:
    """Pearson r of endpoint attribute pairs over the symmetric edge set.
    ``attr`` is (id, x). Assortativity.cpp:66-93 semantics in the
    orientation-free form (xMean == yMean by symmetry)."""
    e = _directed_simple(graph)
    pairs = (
        e.join(attr.select(F.col("id").alias("src"), F.col("x").alias("xs")), "src")
        .join(attr.select(F.col("id").alias("dst"), F.col("x").alias("xd")), "dst")
    )
    row = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("xs").alias("sx"),
        F.sum(F.col("xs") * F.col("xd")).alias("sxy"),
        F.sum(F.col("xs") * F.col("xs")).alias("sxx"),
    ).first()
    m, sx, sxy, sxx = row["m"], float(row["sx"]), float(row["sxy"]), float(row["sxx"])
    if m == 0:
        return 0.0
    mean = sx / m
    a = sxy - m * mean * mean
    b = sxx - m * mean * mean
    return a / b if b else 0.0


def degree_assortativity(graph: Graph) -> float:
    """Degree assortativity: ordinal assortativity with x = simple-support
    degree (the attribute NetworKit users pass most)."""
    e = _directed_simple(graph)
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    return ordinal_assortativity(graph, deg)


def nominal_assortativity(graph: Graph, labels: DataFrame) -> float:
    """r = (Σ e_ii − Σ a_i b_i)/(1 − Σ a_i b_i) over label-pair edge
    fractions (Assortativity.cpp:30-62). ``labels`` is (id, label). Uses the
    symmetric edge set, so a_i == b_i."""
    e = _directed_simple(graph)
    lab = (
        e.join(labels.select(F.col("id").alias("src"), F.col("label").alias("ls")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("label").alias("ld")), "dst")
    )
    cells = lab.groupBy("ls", "ld").agg(F.count(F.lit(1)).alias("c"))
    m = cells.agg(F.sum("c")).first()[0] or 0
    if m == 0:
        return 0.0
    diag = (
        cells.filter(F.col("ls") == F.col("ld")).agg(F.sum("c")).first()[0] or 0
    )
    a = cells.groupBy("ls").agg(F.sum("c").alias("ra"))
    b = cells.groupBy("ld").agg(F.sum("c").alias("rb"))
    # exact integer form: r = (diag·m − Σ ra·rb) / (m² − Σ ra·rb); counts are
    # < 2^53 so every term is exact in both engines regardless of sum order
    s = (
        a.join(b, a["ls"] == b["ld"])
        .agg(F.sum(F.col("ra") * F.col("rb")))
        .first()[0]
        or 0
    )
    denom = m * m - s
    if denom == 0:
        return 0.0
    return (diag * m - s) / denom
