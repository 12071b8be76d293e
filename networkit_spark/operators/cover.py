"""Cover — overlapping community assignments (a node may belong to many
subsets). Reference: include/networkit/structures/Cover.hpp (a vector of
subset-id sets per node). SURVEY §1.3 mapping: a DataFrame (id, label) WITH
DUPLICATE ids — every operation is a groupBy/join, so the structure scales
exactly like a partition table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def cover_from_partition(labels: DataFrame) -> DataFrame:
    """A partition IS a cover with one subset per node (Cover.hpp ctor
    from Partition)."""
    return labels.select("id", "label")


def add_to_subset(cover: DataFrame, members: DataFrame, label: int) -> DataFrame:
    """Cover::addToSubset for a whole member set at once (bulk — the
    distributed analogue of the per-node call)."""
    return cover.unionByName(
        members.select("id", F.lit(label).cast("long").alias("label"))
    ).distinct()


def subsets_of(cover: DataFrame, node_ids: DataFrame) -> DataFrame:
    """(id, labels: array<long>) — Cover::subsetsOf, batched."""
    return (
        cover.join(node_ids.select("id"), "id", "semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("label")).alias("labels"))
    )


def subset_sizes(cover: DataFrame) -> DataFrame:
    """(label, size) — Cover::subsetSizeMap."""
    return cover.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def number_of_subsets(cover: DataFrame) -> int:
    return cover.select("label").distinct().count()


def in_same_subset(cover: DataFrame, u: int, v: int) -> bool:
    """Cover::inSameSubset — do u and v share at least one subset?"""
    a = cover.filter(F.col("id") == int(u)).select("label")
    b = cover.filter(F.col("id") == int(v)).select("label")
    return a.join(b, "label", "semi").limit(1).count() > 0


def cover_coverage(graph: Graph, cover: DataFrame) -> float:
    """Fraction of nodes assigned to at least one subset (the cover-side
    analogue of Partition completeness; Cover.hpp numberOfElements)."""
    n = graph.num_nodes()
    if n == 0:
        return 1.0
    covered = cover.select("id").distinct().join(
        graph.vertices.select("id"), "id", "semi"
    ).count()
    return covered / n
