"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — PageRank top-20 entities of the
sf0.001 events-derived entity graph (the §7.2 end-to-end slice).

queries(): one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators); each callable (spark, sf_dir) -> DataFrame.

oracle_sql(): matching DuckDB SQL per query (generated in
networkit_spark.entrylib so both sides share constants and iteration counts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank top-20 entities on /root/testdata/sf0.001."""
    from pyspark.sql import functions as F

    from networkit_spark.entrylib import events_graph
    from networkit_spark.operators.pagerank import pagerank, ranking

    g, verts = events_graph(spark, "/root/testdata/sf0.001")
    scores = pagerank(g, damp=0.85, tol=1e-6)
    top = ranking(scores, k=20).join(verts, "id")
    return top.select("id", "key", F.round("score", 6).alias("score")).orderBy(
        F.desc("score"), F.asc("id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from networkit_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from networkit_spark.entry_queries import build_oracles

    return build_oracles()
