"""Hub-vertex skew handling: explicit salted two-stage aggregation.

The reference handles degree skew with guided OpenMP scheduling
(balancedParallelForNodes, Graph.hpp:1788; schedule(guided) in MPLP.cpp:98).
On Spark the equivalent problem is a groupBy/join key with millions of rows
(a hub vertex on a power-law graph: max degree 194,955 in the paper's
uk-2002-style inputs, Paper/IJPP/vectgraph.tex:634).

Spark's hash aggregate already partial-aggregates map-side, which removes
most sum/min skew; what it cannot fix is (a) a shuffle join whose build/probe
key is hot and (b) any agg whose per-key state is large. This module
provides the explicit remedy the north rule asks for:

  salted_agg(df, key, exprs, salt) — add salt = pmod(hash(other cols), S) to
  the grouping key, partially aggregate on (key, salt), then finish on key.
  The first stage fans a hot key out over S reducers; the second touches at
  most S rows per key.

Correctness requires the aggregate to be decomposable (sum/min/max/count —
everything the four north-star algorithms use). Tests assert salted ==
unsalted on a star graph much wider than the partition count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECOMPOSE = {
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    "count": (F.count, F.sum),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 32,
) -> DataFrame:
    """Two-stage decomposable aggregation.

    aggs: {out_col: (fn_name, in_col)} with fn_name in sum/min/max/count.
    Example: salted_agg(edges, ["dst"], {"mass": ("sum", "contrib")}).
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    stage1_exprs, stage2_exprs = [], []
    for out, (fn, col) in aggs.items():
        pre, post = _DECOMPOSE[fn]
        stage1_exprs.append(pre(col).alias(f"__p_{out}"))
        stage2_exprs.append(post(f"__p_{out}").alias(out))
    stage1 = df.withColumn("__salt", salt_col).groupBy(*keys, "__salt").agg(*stage1_exprs)
    return stage1.groupBy(*keys).agg(*stage2_exprs)


def top_degree_keys(edges: DataFrame, col: str, threshold: int) -> DataFrame:
    """Keys whose degree exceeds threshold — the hub set worth salting or
    broadcasting separately."""
    return (
        edges.groupBy(F.col(col).alias("key"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") > threshold)
        .select("key")
    )
