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


def average_ranks(measures: DataFrame) -> DataFrame:
    """(id, measure, x, rnk) — 1-based average ranks of ``x`` within each
    measure, ties averaged: helpers.ranked semantics (helpers.pyx:12-40,
    consumed by profiling/stat.py's rank covariance).

    100 TB shape: one groupBy to distinct (measure, value) counts, ONE
    range-partitioned global cumsum over the composite (measure, value)
    order (functions.ordering.global_cumsum — no single-task window), a
    |measures|-row predecessor-offset broadcast to reset the cumsum per
    measure, and a join back on (measure, value). A value tied k times at
    position `less` ranks (less + (k+1)/2) for every holder."""
    from networkit_spark.functions.ordering import global_cumsum

    spark = measures.sparkSession
    cnt = measures.groupBy("measure", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cum = global_cumsum(cnt, ["measure", "x"], ["c"])
    totals = cnt.groupBy("measure").agg(F.sum("c").alias("tot")).collect()
    acc, offs = 0, []
    for r in sorted(totals, key=lambda r: r["measure"]):
        offs.append((r["measure"], acc))
        acc += int(r["tot"])
    off_df = spark.createDataFrame(offs, "measure string, _moff long")
    ranked = (
        cum.join(F.broadcast(off_df), "measure")
        .withColumn("less", F.col("cum_c") - F.col("c") - F.col("_moff"))
        .select(
            "measure",
            "x",
            (F.col("less") + (F.col("c") + F.lit(1)) / F.lit(2.0)).alias("rnk"),
        )
    )
    return measures.join(ranked, ["measure", "x"]).select("id", "measure", "x", "rnk")


def rank_correlation(measures: DataFrame) -> DataFrame:
    """(measure_a, measure_b, covariance, pearson, spearman, fechner) —
    the profiling report's pairwise correlation matrix between score
    vectors (profiling/stat.py Correlation.run:431-485): population
    covariance, Pearson over raw values, Spearman = Pearson over the
    average-rank vectors, and Fechner = mean concordance sign, with the
    reference's copysign(1, 0.0*y) zero-deviation edge reproduced exactly
    (a zero deviation concords with a nonnegative partner, discords with
    a negative one). Zero-variance measures yield NULL Pearson/Spearman
    (the reference emits NaN). All values rounded to 6dp.

    Input: long-form (id, measure, x) — every measure over the same id
    set. 100 TB shape: average_ranks (above) + one |measures|-row stats
    broadcast + one id-keyed self-join producing n·K(K-1)/2 pair rows +
    partial-agg groupBys; nothing n-sized driver-side."""
    ranked = average_ranks(measures)
    st = ranked.groupBy("measure").agg(
        F.avg("x").alias("mx"), F.avg("rnk").alias("mr")
    )
    dev = ranked.join(F.broadcast(st), "measure").select(
        "id",
        "measure",
        (F.col("x") - F.col("mx")).alias("dx"),
        (F.col("rnk") - F.col("mr")).alias("dr"),
    )
    sd = dev.groupBy("measure").agg(
        F.sqrt(F.sum(F.col("dx") * F.col("dx")) / F.count(F.lit(1))).alias("sx"),
        F.sqrt(F.sum(F.col("dr") * F.col("dr")) / F.count(F.lit(1))).alias("sr"),
    )
    a, b = dev.alias("a"), dev.alias("b")
    prod = F.col("a.dx") * F.col("b.dx")
    fsign = (
        F.when(prod > 0, F.lit(1.0))
        .when(prod < 0, F.lit(-1.0))
        .when((F.col("a.dx") == 0) & (F.col("b.dx") < 0), F.lit(-1.0))
        .when((F.col("b.dx") == 0) & (F.col("a.dx") < 0), F.lit(-1.0))
        .otherwise(F.lit(1.0))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.id") == F.col("b.id"))
            & (F.col("a.measure") < F.col("b.measure")),
        )
        .groupBy(
            F.col("a.measure").alias("measure_a"),
            F.col("b.measure").alias("measure_b"),
        )
        .agg(
            (F.sum(prod) / F.count(F.lit(1))).alias("cov"),
            (F.sum(F.col("a.dr") * F.col("b.dr")) / F.count(F.lit(1))).alias(
                "rcov"
            ),
            (F.sum(fsign) / F.count(F.lit(1))).alias("fech"),
        )
    )
    sa = sd.select(
        F.col("measure").alias("measure_a"),
        F.col("sx").alias("sxa"),
        F.col("sr").alias("sra"),
    )
    sb = sd.select(
        F.col("measure").alias("measure_b"),
        F.col("sx").alias("sxb"),
        F.col("sr").alias("srb"),
    )
    return (
        pairs.join(F.broadcast(sa), "measure_a")
        .join(F.broadcast(sb), "measure_b")
        .select(
            "measure_a",
            "measure_b",
            (F.round("cov", 6) + F.lit(0.0)).alias("covariance"),
            (
                F.round(
                    F.when(
                        F.col("sxa") * F.col("sxb") != 0,
                        F.col("cov") / (F.col("sxa") * F.col("sxb")),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("pearson"),
            (
                F.round(
                    F.when(
                        F.col("sra") * F.col("srb") != 0,
                        F.col("rcov") / (F.col("sra") * F.col("srb")),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("spearman"),
            (F.round("fech", 6) + F.lit(0.0)).alias("fechner"),
        )
        .orderBy("measure_a", "measure_b")
    )
