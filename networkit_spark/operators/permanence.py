"""Permanence centrality — how firmly a vertex sits inside its community.

Reference semantics: networkit/cpp/centrality/PermanenceCentrality.cpp
(getPermanence, getIntraClustering; golden values at
centrality/test/CentralityGTest.cpp:1215-1275):

    perm(u) = I(u) / E_max(u) / deg(u) - (1 - cc_in(u))

where, given a partition P,
  * I(u)      = number of neighbors sharing P[u] (internal degree),
  * E_max(u)  = the largest neighbor count u has into any single
                *other* community, floored at 1 when u has no external
                neighbor (PermanenceCentrality.cpp:158),
  * cc_in(u)  = clustering coefficient among u's internal neighbors:
                0 when I(u) < 2, else the number of edges between
                internal neighbors / C(I(u), 2)
                (PermanenceCentrality.cpp:112-137).

The pair (y, z) counted by getIntraClustering has P[y] == P[z] == P[u],
i.e. the triangles it counts are exactly the per-node triangle counts of
the *intra-community edge subgraph* (every edge of the triangle joins two
same-label vertices).  That reduction is what makes the operator
distributed-friendly: one label join to carve the subgraph, then the same
degree-oriented 2-join triangle listing every other triangle consumer
here uses — no per-node neighborhood materialization, no Python.

Defined over the simple undirected support (self-loops dropped, as in
the triangle family); vertices with no incident edge are omitted
(deg(u) = 0 leaves the reference formula undefined).

Scale notes: every step is a key join or aggregation on the edge table;
the strength table is at most one row per (vertex, touched community),
bounded by m.  Nothing vertex-sized is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import triangle_counts


def permanence_centrality(graph: Graph, labels: DataFrame) -> DataFrame:
    """(id, permanence) for every non-isolated vertex, given a partition
    `labels` (id, label)."""
    g = graph.to_undirected() if graph.directed else graph
    neigh = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lsrc"))
    lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("ldst"))
    nl = neigh.join(lab_src, "src").join(lab_dst, "dst")

    # strength[c] = # neighbors of u inside community c
    strength = nl.groupBy("src", "lsrc", "ldst").agg(F.count(F.lit(1)).alias("s"))
    per_node = strength.groupBy(F.col("src").alias("id")).agg(
        F.sum("s").alias("deg"),
        F.sum(F.when(F.col("ldst") == F.col("lsrc"), F.col("s"))).alias("ideg_raw"),
        F.max(F.when(F.col("ldst") != F.col("lsrc"), F.col("s"))).alias("emax_raw"),
    )

    # triangles among same-label neighbors == per-node triangles of the
    # intra-community subgraph (see module docstring)
    intra_edges = (
        nl.filter(F.col("lsrc") == F.col("ldst"))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )
    intra_g = Graph(
        vertices=labels.select("id"), edges=intra_edges, directed=False, weighted=False
    )
    tri = triangle_counts(intra_g).withColumnRenamed("triangles", "tri")

    ideg = F.coalesce(F.col("ideg_raw"), F.lit(0))
    cc_in = F.when(
        ideg >= 2,
        F.coalesce(F.col("tri"), F.lit(0)) * 2.0 / (ideg * (ideg - 1)),
    ).otherwise(F.lit(0.0))
    emax = F.greatest(F.coalesce(F.col("emax_raw"), F.lit(0)), F.lit(1))
    return (
        per_node.join(tri, "id", "left")
        .select(
            "id",
            (ideg / emax / F.col("deg") - (F.lit(1.0) - cc_in)).alias("permanence"),
        )
    )


def local_partition_coverage(graph: Graph, labels: DataFrame) -> DataFrame:
    """(id, coverage) — fraction of each vertex's weighted degree that
    stays inside its own cluster (ref:
    centrality/LocalPartitionCoverage.cpp:12-30: numerator sums edge
    weights to same-cluster neighbors, self-loops included once;
    denominator is weightedDegree with self-loops once; isolated vertices
    score 0).  One label join + one per-vertex aggregation."""
    lab_src = labels.select(F.col("id").alias("src"), F.col("label").alias("lsrc"))
    lab_dst = labels.select(F.col("id").alias("dst"), F.col("label").alias("ldst"))
    per = (
        graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
        .join(lab_src, "src")
        .join(lab_dst, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("lsrc") == F.col("ldst"), F.col("w"))),
                F.lit(0.0),
            ).alias("num"),
            F.sum("w").alias("den"),
        )
    )
    return (
        graph.vertices.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.when(F.col("num") > 0, F.col("num") / F.col("den"))
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
    )
