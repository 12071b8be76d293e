"""Profile-data tier: the DataFrame layer of the reference's plot /
profiling module.

Reference: networkit/plot.py:39-95 (degreeDistribution,
connectedComponentsSizes, clusteringPerDegree) and the stat tables the
profiling/ HTML report renders. The reference computes these vectors
driver-side and hands them to matplotlib/seaborn; rendering is out of
scope for an analytics engine, so this module emits the vectors
themselves as one unified (kind, x, y) DataFrame — three partial-agg
groupBys over operators that already exist, nothing driver-side.

100 TB shape: degree_dist is one groupBy on the (bounded-cardinality)
degree column of the cached degree table; component_size_dist adds one
groupBy over the CC label table then one over the size column;
lcc_by_degree joins the per-node LCC with the degree table (id-keyed)
and partial-aggregates by degree. Output cardinality is O(distinct
degrees + distinct component sizes) — a plot-axis-sized table at any
input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


def degree_distribution(graph: Graph) -> DataFrame:
    """(x = degree, y = node count) — plot.degreeDistribution's vector."""
    return (
        graph.degrees()
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("degree").cast("bigint").alias("x"),
            F.col("cnt").cast("double").alias("y"),
        )
    )


def component_size_distribution(graph: Graph, cc_iters: int = 12) -> DataFrame:
    """(x = component size, y = number of components) —
    plot.connectedComponentsSizes' vector."""
    from networkit_spark.operators.components import connected_components

    labels = connected_components(graph, max_iterations=cc_iters)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("sz").cast("bigint").alias("x"),
            F.col("cnt").cast("double").alias("y"),
        )
    )


def lcc_by_degree(graph: Graph) -> DataFrame:
    """(x = degree, y = mean local clustering coefficient, 6dp) —
    plot.clusteringPerDegree's groupby("deg").mean() vector."""
    from networkit_spark.operators.triangles import local_clustering_coefficient

    lcc = local_clustering_coefficient(graph)
    return (
        lcc.join(graph.degrees().select("id", "degree"), "id")
        .groupBy("degree")
        .agg(F.round(F.avg("lcc"), 6).alias("m"))
        .select(
            F.col("degree").cast("bigint").alias("x"),
            F.col("m").cast("double").alias("y"),
        )
    )


def profile_distributions(graph: Graph, cc_iters: int = 12) -> DataFrame:
    """(kind, x, y) — the three profile vectors stacked with a kind tag:
    'degree_dist', 'component_size_dist', 'lcc_by_degree'."""
    return (
        degree_distribution(graph)
        .select(F.lit("degree_dist").alias("kind"), "x", "y")
        .unionByName(
            component_size_distribution(graph, cc_iters).select(
                F.lit("component_size_dist").alias("kind"), "x", "y"
            )
        )
        .unionByName(
            lcc_by_degree(graph).select(
                F.lit("lcc_by_degree").alias("kind"), "x", "y"
            )
        )
    )
