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


def hyperplanes(
    dim: int, nbits: int, n_tables: int, seed: int = 42
) -> list[list[list[float]]]:
    """[table][bit][dim] seeded Gaussian random-projection hyperplanes,
    rounded to 6 decimals so the SAME decimal literals embed into both the
    Spark expressions and the DuckDB oracle SQL (decimal text parses to the
    identical nearest double in both engines)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    h = rs.standard_normal((n_tables, nbits, dim))
    return [[[round(float(x), 6) for x in bit] for bit in tbl] for tbl in h]


def sign_lsh_buckets(
    emb: DataFrame,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, tbl, bucket) — one signature per hash table: bucket =
    Σ_i 2^i·[⟨v, h_ti⟩ > 0] over seeded Gaussian hyperplanes. Multi-table
    OR-amplification is the standard recall lever (candidates = union of
    per-table bucket matches); all JVM fold expressions, no Python."""
    planes = hyperplanes(dim, nbits, n_tables, seed)
    per_table = []
    for t, tbl in enumerate(planes):
        bucket = None
        for i, plane in enumerate(tbl):
            dot = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
            bit = F.when(dot > 0, F.lit(2 ** i)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        per_table.append(
            emb.select(
                F.col(id_col).alias("vec_id"),
                F.lit(t).alias("tbl"),
                bucket.cast("bigint").alias("bucket"),
            )
        )
    out = per_table[0]
    for p in per_table[1:]:
        out = out.unionByName(p)
    return out


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — approximate top-k: candidates =
    union over hash tables of same-(tbl, bucket) vectors (equi-join per
    table, never a cross join), deduplicated, then exact cosine re-rank."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).limit(1).first()
        dim = int(first["d"]) if first else 0
    b = sign_lsh_buckets(emb, dim, nbits, n_tables, seed, id_col, vec_col)
    b = b.withColumnRenamed("vec_id", "nid")
    qb = b.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), "tbl", "bucket"
    )
    # OR-amplification: a pair matching in ANY table is a candidate (once)
    cand_ids = (
        F.broadcast(qb)
        .join(b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("nid"))
        .select("query_id", "nid")
        .distinct()
    )
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    qv = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = cand_ids.join(F.broadcast(qv), "query_id").join(vecs, "nid")
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
