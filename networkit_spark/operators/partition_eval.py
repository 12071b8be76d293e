"""Local partition / cover evaluation measures.

References:
- community/IntrapartitionDensity.cpp:5-75 — per cluster:
  intraEdges / C(size,2), defaulting to 1 when the cluster has no
  possible internal pair (size <= 1); forEdges counts each undirected
  edge once (self-loops included in intraEdges but not in C(size,2)).
- community/PartitionHubDominance.cpp:9-66 — per cluster:
  max internal degree / (size - 1), 1 for singletons; internal degree of
  u counts adjacency rows whose endpoint shares u's cluster.
- community/IsolatedInterpartitionConductance.cpp:5-62 — per cluster:
  inter-cluster cut weight / min(volume, totalVolume - volume); volume
  accumulates w per endpoint, so self-loops contribute 2w, and
  totalVolume = 2 * total edge weight.
- community/IsolatedInterpartitionExpansion.cpp — same cut, denominator
  min(size, n - size).
- community/CoverF1Similarity.cpp:10-100 — per cluster of C: the best F1
  = 2*overlap/(|C_i| + |R_s|) against any reference subset.

All of these are one or two joins of the edge table against the label
table plus label-sized aggregations — fully JVM-side, shuffling at most
m rows on the label key; at 10^9 vertices the per-cluster value tables
are bounded by the number of realized labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _for_edges(graph: Graph) -> DataFrame:
    """The reference's forEdges view: each undirected edge (and each
    self-loop) exactly once. Undirected storage holds both directions of
    non-loop edges, so src <= dst selects one canonical copy."""
    e = graph.edges.select("src", "dst", "weight")
    if not graph.directed:
        e = e.filter(F.col("src") <= F.col("dst"))
    return e


def _edge_labels(graph: Graph, labels: DataFrame) -> DataFrame:
    return (
        _for_edges(graph)
        .join(labels.select(F.col("id").alias("src"), F.col("label").alias("lu")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("label").alias("lv")), "dst")
    )


def intrapartition_density(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, size, density) — internal edge density per cluster."""
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    intra = (
        _edge_labels(graph, labels)
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    possible = F.col("size") * (F.col("size") - 1) / 2.0
    return (
        sizes.join(intra, "label", "left")
        .select(
            "label",
            "size",
            F.when(possible > 0, F.coalesce(F.col("m"), F.lit(0)) / possible)
            .otherwise(F.lit(1.0))
            .alias("density"),
        )
    )


def partition_hub_dominance(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, size, hub_dominance) — max internal degree / (size - 1)."""
    internal = (
        graph.edges.select("src", "dst")
        .join(labels.select(F.col("id").alias("src"), F.col("label").alias("lu")), "src")
        .join(labels.select(F.col("id").alias("dst"), F.col("label").alias("lv")), "dst")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    per_node = labels.join(internal, "id", "left").select(
        "label", F.coalesce(F.col("d"), F.lit(0)).alias("d")
    )
    agg = per_node.groupBy("label").agg(
        F.count(F.lit(1)).alias("size"), F.max("d").alias("hd")
    )
    return agg.select(
        "label",
        "size",
        F.when(F.col("size") > 1, F.col("hd") / (F.col("size") - 1))
        .otherwise(F.lit(1.0))
        .alias("hub_dominance"),
    )


def isolated_interpartition_values(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, size, iso_conductance, iso_expansion) — the per-cluster
    isolated cut quality pair; one edge-label join feeds both measures."""
    el = _edge_labels(graph, labels)
    ends = el.select(F.col("lu").alias("label"), "weight", (F.col("lu") != F.col("lv")).alias("x")).unionByName(
        el.select(F.col("lv").alias("label"), "weight", (F.col("lu") != F.col("lv")).alias("x"))
    )
    per_label = ends.groupBy("label").agg(
        F.sum(F.when(F.col("x"), F.col("weight")).otherwise(F.lit(0.0))).alias("cut"),
        F.sum("weight").alias("vol"),
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))
    n = labels.count()
    total = _for_edges(graph).agg((2.0 * F.sum("weight")).alias("tv")).first()["tv"] or 0.0
    cond_den = F.least(F.col("vol"), F.lit(float(total)) - F.col("vol"))
    exp_den = F.least(F.col("size"), F.lit(int(n)) - F.col("size"))
    return (
        sizes.join(per_label, "label", "left")
        .select(
            "label",
            "size",
            F.when(cond_den > 0, F.coalesce(F.col("cut"), F.lit(0.0)) / cond_den)
            .otherwise(F.lit(0.0))
            .alias("iso_conductance"),
            F.when(exp_den > 0, F.coalesce(F.col("cut"), F.lit(0.0)) / exp_den)
            .otherwise(F.lit(0.0))
            .alias("iso_expansion"),
        )
    )


def cover_f1_similarity(cover: DataFrame, reference: DataFrame) -> DataFrame:
    """(subset, f1) — best-match F1 of each cover subset against any
    reference subset (CoverF1Similarity.cpp: precision = ov/|C_i|,
    recall = ov/|R_s|, value = max F1; 0 when nothing overlaps). Both
    inputs are (id, subset) membership tables — the engine's Cover
    encoding (structures/Cover.hpp)."""
    csz = cover.groupBy("subset").agg(F.count(F.lit(1)).alias("cs"))
    rsz = reference.groupBy(F.col("subset").alias("rsub")).agg(
        F.count(F.lit(1)).alias("rs")
    )
    ov = (
        cover.join(reference.select("id", F.col("subset").alias("rsub")), "id")
        .groupBy("subset", "rsub")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    f1 = (
        ov.join(csz, "subset")
        .join(rsz, "rsub")
        .select(
            "subset",
            (2.0 * F.col("ov") / (F.col("cs") + F.col("rs"))).alias("f1"),
        )
        .groupBy("subset")
        .agg(F.max("f1").alias("f1"))
    )
    return (
        csz.join(f1, "subset", "left")
        .select("subset", F.coalesce(F.col("f1"), F.lit(0.0)).alias("f1"))
    )


def cover_hub_dominance(graph: Graph, cover: DataFrame) -> DataFrame:
    """(subset, size, hub_dominance) — the Cover generalization of hub
    dominance (community/CoverHubDominance.cpp:9-75): a member's internal
    degree inside subset c counts neighbors that ALSO hold membership c
    (overlapping memberships allowed); per subset the max internal degree
    over size-1, 1.0 for singletons. One membership-pair join per the
    partition variant, keyed by (edge, shared subset)."""
    mem = cover.select("id", "subset")
    internal = (
        graph.edges.select("src", "dst")
        .join(mem.select(F.col("id").alias("src"), "subset"), "src")
        .join(mem.select(F.col("id").alias("dst"), "subset"), ["dst", "subset"], "semi")
        .groupBy("src", "subset")
        .agg(F.count(F.lit(1)).alias("d"))
        .withColumnRenamed("src", "id")
    )
    per_member = mem.join(internal, ["id", "subset"], "left").select(
        "subset", F.coalesce("d", F.lit(0)).alias("d")
    )
    agg = per_member.groupBy("subset").agg(
        F.count(F.lit(1)).alias("size"), F.max("d").alias("hd")
    )
    return agg.select(
        "subset",
        "size",
        F.when(F.col("size") > 1, F.col("hd") / (F.col("size") - 1))
        .otherwise(F.lit(1.0))
        .alias("hub_dominance"),
    )


def partition_fragmentation(
    graph: Graph, labels: DataFrame, components: DataFrame | None = None
) -> DataFrame:
    """(label, size, fragmentation) — per cluster 1 - (largest piece of the
    cluster that lies in one GLOBAL connected component) / cluster size
    (community/PartitionFragmentation.cpp:7-62: global CC intersected with
    the partition, then the per-cluster min over members). 0 = cluster
    fully inside one component."""
    from networkit_spark.operators.components import connected_components

    comp = (
        components
        if components is not None
        else connected_components(graph)
    ).select("id", F.col("label").alias("clabel"))
    j = labels.select("id", "label").join(comp, "id")
    ints = j.groupBy("label", "clabel").agg(F.count(F.lit(1)).alias("isz"))
    agg = ints.groupBy("label").agg(
        F.sum("isz").alias("size"), F.max("isz").alias("big")
    )
    return agg.select(
        "label", "size",
        (F.lit(1.0) - F.col("big") / F.col("size")).alias("fragmentation"),
    )
