"""Partition coarsening, projection, and partition-quality measures.

References:
- ParallelPartitionCoarsening (coarsening/ParallelPartitionCoarsening.cpp:22-108):
  contract the graph by a partition — sum edge weights between parts, keep
  self-loops. In Spark this is literally two label joins + one groupBy-agg.
- ClusteringProjector (coarsening/ClusteringProjector.cpp): project a coarse
  partition back through the fine->coarse map (one join).
- Modularity (community/Modularity.cpp:26-88): mod = coverage - expCov with
  vol(C) = sum_{v in C} (weightedDegree(v) + w(v,v)) (self-loop twice),
  expCov = sum_C vol(C)^2 / (2*totalEdgeWeight)^2.
- Coverage (community/Coverage.cpp): intra-cluster edge weight (edges once,
  self-loops once) / totalEdgeWeight.
- EdgeCut (community/EdgeCut.cpp): total weight of inter-cluster edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def _labeled_edges(graph: Graph, labels: DataFrame) -> DataFrame:
    """edges with src/dst labels attached: (src, dst, weight, slabel, dlabel)."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("slabel"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dlabel"))
    return graph.edges.join(ls, "src").join(ld, "dst")


def coarsen(graph: Graph, labels: DataFrame) -> tuple[Graph, DataFrame]:
    """(coarse graph, fine_to_coarse map). Coarse vertex ids are dense,
    minted from label order; edge weights sum over contracted pairs;
    self-loops kept (intra-part edges collapse onto the part's loop)."""
    from networkit_spark.edges import mint_dense_ids

    dict_df = mint_dense_ids(
        labels.select(F.col("label").alias("key")), "key"
    ).withColumnRenamed("id", "coarse_id")
    # label-count-sized dictionary: often small, but a near-singleton
    # partition makes it vertex-sized — no forced broadcast, AQE decides
    fine_to_coarse = labels.join(
        dict_df, labels["label"] == dict_df["key"]
    ).select("id", "coarse_id")

    le = _labeled_edges(graph, labels)
    cmap_s = dict_df.withColumnRenamed("key", "slabel").withColumnRenamed(
        "coarse_id", "csrc"
    )
    cmap_d = dict_df.withColumnRenamed("key", "dlabel").withColumnRenamed(
        "coarse_id", "cdst"
    )
    contracted = (
        le.join(cmap_s, "slabel")
        .join(cmap_d, "dlabel")
        .select(
            F.col("csrc").alias("src"),
            F.col("cdst").alias("dst"),
            # fine self-loops are stored ONCE in the symmetric table while
            # non-loop edges appear twice — track the two contributions
            # separately so the coarse loop weight is loop_w + nonloop_w/2
            # (ParallelPartitionCoarsening.cpp:40-49: intra edges counted
            # once via the u >= v guard, self-loops once)
            F.when(F.col("src") == F.col("dst"), F.col("weight").cast("double"))
            .otherwise(0.0)
            .alias("loop_w"),
            F.when(F.col("src") != F.col("dst"), F.col("weight").cast("double"))
            .otherwise(0.0)
            .alias("nl_w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("loop_w").alias("loop_w"), F.sum("nl_w").alias("nl_w"))
    )
    if not graph.directed:
        # a fine self-loop always lands on a coarse (c, c) pair, so loop_w
        # is zero on off-diagonal coarse edges
        contracted = contracted.select(
            "src",
            "dst",
            F.when(
                F.col("src") == F.col("dst"),
                F.col("loop_w") + F.col("nl_w") / 2,
            )
            .otherwise(F.col("nl_w"))
            .alias("w"),
        )
    else:
        contracted = contracted.select(
            "src", "dst", (F.col("loop_w") + F.col("nl_w")).alias("w")
        )
    edges = contracted.select(
        "src", "dst", F.col("w").cast("float").alias("weight")
    )
    vertices = dict_df.select(F.col("coarse_id").alias("id"))
    return Graph(vertices, edges, graph.directed, True), fine_to_coarse


def matching_coarsening(
    graph: Graph, matching: DataFrame, no_self_loops: bool = False
) -> tuple[Graph, DataFrame]:
    """(coarse Graph, fine_to_coarse) — contract each matched pair to one
    coarse vertex (coarsening/MatchingCoarsening.cpp:17-57).

    The reference's sequential scan carries over exactly the vertices that
    are unmatched or the SMALLER endpoint of their matched edge, assigning
    dense ids in increasing fine-id order (MatchingCoarsening.cpp:26-41);
    labelling every vertex with min(v, mate(v)) and minting dense ids in
    ascending label order reproduces that numbering exactly. Edge weights
    sum over contracted pairs; the matched edge's own weight lands on the
    coarse self-loop (visited once under the v <= u guard, lines 43-51)
    unless ``no_self_loops``. Undirected only, like the reference ctor."""
    if graph.directed:
        raise ValueError("MatchingCoarsening is only defined for undirected graphs")
    mates = matching.select(
        F.greatest("u", "v").alias("id"), F.least("u", "v").alias("label")
    )
    labels = graph.vertices.join(mates, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )
    coarse, fine_to_coarse = coarsen(graph, labels)
    if no_self_loops:
        coarse = Graph(
            coarse.vertices,
            coarse.edges.filter(F.col("src") != F.col("dst")),
            directed=False,
            weighted=True,
        )
    return coarse, fine_to_coarse


def project_back(
    fine_to_coarse: DataFrame, coarse_labels: DataFrame
) -> DataFrame:
    """Fine labels from coarse labels (ClusteringProjector)."""
    cl = coarse_labels.withColumnRenamed("id", "coarse_id")
    return fine_to_coarse.join(cl, "coarse_id").select("id", "label")


def _intra_weight(graph: Graph, labels: DataFrame) -> float:
    le = _labeled_edges(graph, labels).filter(F.col("slabel") == F.col("dlabel"))
    row = le.agg(
        F.sum(F.col("weight").cast("double")).alias("w"),
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("weight").cast("double"))
        ).alias("lw"),
    ).first()
    w, lw = row["w"] or 0.0, row["lw"] or 0.0
    if graph.directed:
        return w
    return (w - lw) / 2.0 + lw


def coverage(graph: Graph, labels: DataFrame) -> float:
    tew = graph.total_edge_weight()
    if tew == 0.0:
        raise ValueError("Coverage undefined for graphs without edges")
    return _intra_weight(graph, labels) / tew


def modularity(graph: Graph, labels: DataFrame) -> float:
    """community/Modularity.cpp:26-88 exactly (see module docstring)."""
    tew = graph.total_edge_weight()
    if tew == 0.0:
        raise ValueError("Modularity undefined for graphs without edges")
    cov = coverage(graph, labels)
    vols = (
        graph.degrees()
        .join(labels, "id")
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
    )
    exp_cov = (
        vols.agg(
            F.sum((F.col("vol") / tew) * (F.col("vol") / tew) / 4.0).alias("e")
        ).first()["e"]
        or 0.0
    )
    return cov - exp_cov


def edge_cut(graph: Graph, labels: DataFrame) -> float:
    """Total inter-cluster edge weight (community/EdgeCut.cpp), undirected
    edges counted once."""
    le = _labeled_edges(graph, labels).filter(F.col("slabel") != F.col("dlabel"))
    w = le.agg(F.sum(F.col("weight").cast("double"))).first()[0] or 0.0
    return w if graph.directed else w / 2.0


def conductance_per_cluster(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, conductance: double) with conductance(C) =
    cut(C) / min(vol(C), vol(V) - vol(C)) — the per-cluster measure behind
    community/Conductance.cpp; vol counts self-loops twice (wdeg)."""
    le = _labeled_edges(graph, labels)
    cut = (
        le.filter(F.col("slabel") != F.col("dlabel"))
        .groupBy(F.col("slabel").alias("label"))
        .agg(F.sum(F.col("weight").cast("double")).alias("cut"))
    )
    vols = (
        graph.degrees()
        .join(labels, "id")
        .groupBy("label")
        .agg(F.sum("wdeg").alias("vol"))
    )
    total_vol = graph.degrees().agg(F.sum("wdeg")).first()[0] or 0.0
    return (
        vols.join(cut, "label", "left")
        .select(
            "label",
            F.when(
                F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")) > 0,
                F.coalesce("cut", F.lit(0.0))
                / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


def make_singleton_partition(graph: Graph) -> DataFrame:
    """Each node its own cluster (community/ClusteringGenerator.cpp
    makeSingletonClustering)."""
    return graph.vertices.select("id", F.col("id").alias("label"))


def make_one_partition(graph: Graph) -> DataFrame:
    """All nodes in cluster 0 (makeOneClustering)."""
    return graph.vertices.select("id", F.lit(0).cast("long").alias("label"))


def make_random_partition(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """k clusters, per-node deterministic hash assignment
    (makeRandomClustering; per-row xxhash so the result is identical at any
    parallelism)."""
    return graph.vertices.select(
        "id", F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(k)).cast("long").alias("label")
    )


def make_continuous_balanced_partition(graph: Graph, k: int) -> DataFrame:
    """k contiguous equal ranges of the id space
    (makeContinuousBalancedClustering)."""
    n = graph.num_nodes()
    size = max(1, (n + k - 1) // k)
    return graph.vertices.select(
        "id", (F.col("id") / size).cast("long").alias("label")
    )


def partition_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """Finest common refinement of two partitions
    (community/PartitionIntersection.cpp): nodes grouped by label pairs;
    result labels are dense ids over the observed pairs."""
    from networkit_spark.edges import mint_dense_ids

    joined = (
        a.withColumnRenamed("label", "la")
        .join(b.withColumnRenamed("label", "lb"), "id")
        .withColumn("key", F.format_string("%019d:%019d", "la", "lb"))
    )
    ids = mint_dense_ids(joined.select("key"), "key").withColumnRenamed("id", "label")
    return joined.join(ids, "key").select("id", "label")
