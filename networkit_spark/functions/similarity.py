"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the sign-LSH bucketed
variant is the scale path (bucket-join instead of cross-join). Dot products
are built-in JVM expressions (zip_with + aggregate fold — a sequential,
deterministic summation identical to DuckDB's list_reduce fold, so the
correctness gate can compare values bit-for-bit before rounding).

At 100 TB scale the brute-force path is only for re-ranking candidates:
queries broadcast, corpus streams, per-partition top-k via partial
aggregation before the global ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — exact top-k cosine neighbors for each
    query id, self excluded; ties broken by neighbor_id asc on the ROUNDED
    similarity so the ordering is engine-portable."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def sign_lsh_bucket(
    emb: DataFrame, nbits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, bucket) — bucket = sign pattern of the first nbits
    coordinates (deterministic hyperplanes = coordinate axes; swap in a
    seeded random-projection matrix on a real corpus)."""
    bucket = None
    for i in range(nbits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit(2 ** i)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col).alias("vec_id"), bucket.cast("bigint").alias("bucket"))


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — approximate top-k: candidates limited
    to the query's LSH bucket (bucket equi-join, no cross join), then exact
    cosine re-rank within the bucket."""
    b = sign_lsh_bucket(emb, nbits, id_col, vec_col).withColumnRenamed("vec_id", "nid")
    withb = (
        emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
        .join(b, "nid")
    )
    q = withb.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("nv").alias("qv"), "bucket"
    )
    cand = F.broadcast(q).join(withb, "bucket").filter(
        F.col("query_id") != F.col("nid")
    )
    sims = cand.select(
        "query_id",
        F.col("nid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )
