"""GraphClusteringTools utility family — community/GraphClusteringTools.cpp.

Each helper is a declarative DataFrame op over an (id, label) partition
table. Scalar predicates collect exactly one aggregate row; the
communication graph is a pure join+groupBy plan (one shuffle on the
cluster-pair key). Label compaction reuses the deterministic distributed
dictionary from edges.mint_dense_ids — no single-task global windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def imbalance(labels: DataFrame) -> float:
    """GraphClusteringTools.cpp:10-19: max cluster size divided by
    ceil(n_elements / n_subsets). The reference computes in float32; the
    values are small integers so double is bit-identical at gate scale."""
    row = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.max("sz").alias("mx"),
            F.sum("sz").alias("n"),
            F.count(F.lit(1)).alias("k"),
        )
        .first()
    )
    if row["k"] is None or row["k"] == 0:
        return 0.0
    avg = math.ceil(row["n"] / row["k"])
    return float(row["mx"]) / float(avg)


def compact_labels(labels: DataFrame) -> DataFrame:
    """(label, cid) dictionary with dense 0-based cids in ascending label
    order — Partition::compact's std::map iteration order. The key is the
    16-hex-digit encoding of (label XOR LONG_MIN): flipping the sign bit
    maps signed ordering onto unsigned bit ordering, so the lexicographic
    dictionary order is numeric for NEGATIVE labels too (a zero-padded
    decimal key embeds '-' mid-string and mis-sorts them)."""
    from networkit_spark.edges import mint_dense_ids

    keys = labels.select(
        F.lpad(
            F.hex(
                F.col("label").cast("long").bitwiseXOR(F.lit(-(1 << 63)))
            ),
            16,
            "0",
        ).alias("key"),
        "label",
    ).distinct()
    dct = mint_dense_ids(keys.select("key"))
    return keys.join(dct, "key").select("label", F.col("id").alias("cid"))


def communication_graph(graph: Graph, labels: DataFrame) -> DataFrame:
    """GraphClusteringTools.cpp:21-48: coarse undirected graph with one
    node per compacted cluster; edge weight = total weight of cut edges
    between the two clusters (edge count when the graph is unweighted).
    Self-pairs are excluded by construction (zeta[u] != zeta[v])."""
    cd = compact_labels(labels)
    lab = labels.join(cd, "label").select("id", "cid")
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") < F.col("dst")
    )
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    pairs = (
        e.join(lab.withColumnsRenamed({"id": "src", "cid": "cu"}), "src")
        .join(lab.withColumnsRenamed({"id": "dst", "cid": "cv"}), "dst")
        .filter(F.col("cu") != F.col("cv"))
        .select(
            F.least("cu", "cv").alias("src"),
            F.greatest("cu", "cv").alias("dst"),
            w.alias("w"),
        )
    )
    return pairs.groupBy("src", "dst").agg(F.sum("w").alias("weight"))


def cluster_weighted_degree(graph: Graph, labels: DataFrame) -> DataFrame:
    """GraphClusteringTools.cpp:50-69 as a table: for every node and every
    cluster its neighbors touch, the incident weight into that cluster
    (count when unweighted) — weightedDegreeWithCluster for all (u, cid)
    at once instead of one probe per call."""
    w = F.col("weight") if graph.weighted else F.lit(1.0)
    nb = graph.edges.join(
        labels.withColumnRenamed("id", "dst"), "dst"
    )
    return nb.groupBy(F.col("src").alias("id"), "label").agg(
        F.sum(w).alias("wdeg")
    )


def is_proper_clustering(graph: Graph, labels: DataFrame) -> bool:
    """cpp:71-92: every node carries a (non-null) cluster assignment."""
    n = graph.vertices.count()
    assigned = (
        graph.vertices.join(
            labels.filter(F.col("label").isNotNull()), "id"
        )
        .select("id")
        .distinct()
        .count()
    )
    return assigned == n


def is_one_clustering(graph: Graph, labels: DataFrame) -> bool:
    """cpp:84-85: exactly one subset."""
    return labels.select("label").distinct().count() == 1


def is_singleton_clustering(graph: Graph, labels: DataFrame) -> bool:
    """cpp:95-97: #subsets == #nodes."""
    return labels.select("label").distinct().count() == graph.vertices.count()


def equal_clusterings(
    zeta: DataFrame, eta: DataFrame, graph: Graph
) -> bool:
    """cpp:99-116: edge-level agreement — for every edge, the two
    partitions agree on whether its endpoints share a subset. (The
    reference checks edges only, not all pairs; reproduced as-is.)"""
    za = zeta.select(F.col("id"), F.col("label").alias("_za"))
    zb = eta.select(F.col("id"), F.col("label").alias("_zb"))
    j = (
        graph.edges.select("src", "dst")
        .join(za.withColumnRenamed("id", "src"), "src")
        .join(za.withColumnsRenamed({"id": "dst", "_za": "_za2"}), "dst")
        .join(zb.withColumnRenamed("id", "src"), "src")
        .join(zb.withColumnsRenamed({"id": "dst", "_zb": "_zb2"}), "dst")
    )
    mismatches = j.filter(
        (F.col("_za") == F.col("_za2")) != (F.col("_zb") == F.col("_zb2"))
    )
    return mismatches.limit(1).count() == 0
