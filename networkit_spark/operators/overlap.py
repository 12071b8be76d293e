"""Partition combination by hashing — the reference's `overlap/` module.

Reference: overlap/HashingOverlapper.cpp:15-81. Combines k >= 1 partitions
of the same vertex set into one partition whose cells are (modulo djb2
collisions) the cells of the partition intersection:

- k == 2 (lines 45-64): per vertex, key = ((first ^ 0xffff) << 16) |
  (second ^ 0xffff) computed in the fork's uint32 `count` type
  (Globals.hpp:15-28), label = djb2(key);
- k >= 3 (lines 66-76): label starts at the 1-clustering's id and
  accumulates `djb2((c+2) * label_c) & 0xffff` per clustering c, again in
  uint32;
- djb2 (lines 19-27) reads the int64 key as a C STRING of its
  little-endian bytes — it stops at the first ZERO byte, so key=0x100
  hashes like 0 even though byte 1 is set. The numpy kernel reproduces
  that byte-exact (u64 wraparound arithmetic, `alive` mask).

The reference `compact()`s the hash labels before returning (line 79), so
only the CELL STRUCTURE is observable; this module canonicalizes each cell
to its min member id (the repo-wide canonical label form). Hash collisions
therefore merge cells exactly as the reference would.

The hashing runs as one Arrow-vectorized pandas UDF over the joined label
columns — per-vertex work with zero shuffle beyond the id-joins of the
input partitions themselves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_U32 = np.uint32
_U64 = np.uint64


def djb2_bytes(keys: np.ndarray) -> np.ndarray:
    """Vectorized djb2 over the little-endian bytes of ``keys`` (uint64),
    stopping at the first zero byte (HashingOverlapper.cpp:19-27)."""
    keys = keys.astype(_U64, copy=False)
    h = np.full(keys.shape, 5381, dtype=_U64)
    alive = np.ones(keys.shape, dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(8):
            b = (keys >> _U64(8 * i)) & _U64(0xFF)
            alive = alive & (b != 0)
            h = np.where(alive, h * _U64(33) + b, h)
    return h


@pandas_udf(LongType())
def _hash_pair(first: pd.Series, second: pd.Series) -> pd.Series:
    """k == 2 key + hash (HashingOverlapper.cpp:59-60), uint32 key space."""
    f = first.to_numpy(np.int64).astype(_U32)
    s = second.to_numpy(np.int64).astype(_U32)
    with np.errstate(over="ignore"):
        key = ((f ^ _U32(0xFFFF)) << _U32(16)) | (s ^ _U32(0xFFFF))
    return pd.Series(djb2_bytes(key.astype(_U64)).astype(np.int64))


@pandas_udf(LongType())
def _hash_contrib(label: pd.Series, cidx: pd.Series) -> pd.Series:
    """k >= 3 per-clustering contribution: djb2((c+2)*label) & 0xffff
    (HashingOverlapper.cpp:70-75), multiplication in uint32."""
    lab = label.to_numpy(np.int64).astype(_U32)
    c = cidx.to_numpy(np.int64).astype(_U32)
    with np.errstate(over="ignore"):
        key = (c + _U32(2)) * lab
    h = djb2_bytes(key.astype(_U64)) & _U64(0xFFFF)
    return pd.Series(h.astype(np.int64))


def _canonical(df: DataFrame) -> DataFrame:
    """(id, h) -> (id, label) with label = min member id of each h-cell."""
    rep = df.groupBy("h").agg(F.min("id").alias("label"))
    return df.join(rep, "h").select("id", "label")


def hashing_overlapper(
    vertices: DataFrame, clusterings: list[DataFrame]
) -> DataFrame:
    """(id, label) — the hashed overlap of ``clusterings`` (each an
    (id, label) DataFrame over ``vertices``), labels canonicalized to min
    member id. k == 0 degenerates to the 1-clustering like the reference's
    ERROR path (HashingOverlapper.cpp:36-40)."""
    if not clusterings:
        one = vertices.agg(F.min("id").alias("label"))
        return vertices.select("id").join(F.broadcast(one))
    if len(clusterings) == 1:
        df = clusterings[0].select("id", F.col("label").alias("h"))
        return _canonical(df)
    if len(clusterings) == 2:
        a = clusterings[0].select("id", F.col("label").alias("la"))
        b = clusterings[1].select("id", F.col("label").alias("lb"))
        df = a.join(b, "id").select(
            "id", _hash_pair(F.col("la"), F.col("lb")).alias("h")
        )
        return _canonical(df)
    # k >= 3: additive combination in uint32 (core[v] is the fork's uint32
    # index type); each contribution is <= 0xffff so the sum wraps only
    # beyond 65537 clusterings — pmod keeps the wrap faithful anyway
    total = None
    for c, zeta in enumerate(clusterings):
        part = zeta.select(
            "id",
            _hash_contrib(F.col("label"), F.lit(c).cast("long")).alias(f"h{c}"),
        )
        total = part if total is None else total.join(part, "id")
    hsum = sum(F.col(f"h{c}") for c in range(len(clusterings)))
    df = total.select(
        "id", F.pmod(hsum, F.lit(4294967296)).cast("long").alias("h")
    )
    return _canonical(df)
