"""Hash-partitioned CSR-style adjacency blocks + Arrow gather-scatter kernels.

The reference's fork kernels flatten NetworKit's adjacency-list Graph into
contiguous CSR-like arrays before vectorizing (MPLP grabs raw outEdges
pointers, networkit/cpp/community/MPLP.cpp:72-82; OVPL reformats into
sliced-ELLPACK blocks, networkit/cpp/community/OVPL.cpp:278-279 and
Paper/IJPP/vectgraph.tex:506-527). This module is the Spark-native analogue
demanded by the north star: the graph stored as hash-partitioned CSR blocks
inside a DataFrame, and each superstep executed as a sparse gather-scatter
in vectorized numpy/pandas over Arrow batches — never per-row Python.

Layout (one row per block, ``block = pmod(xxhash64(dst), P)``):

    blocks(block int,
           dst_ids array<long>,   -- distinct dsts in the block, ascending
           indptr  array<int>,    -- CSR row pointers into srcs/vals
           srcs    array<long>,   -- edge sources, grouped by dst
           vals    array<double>) -- per-edge payload (weight, frac, ...)

plus a routing table ``route(src long, block int)`` — the distinct
(block, src) pairs. A superstep ships the current per-vertex vector to the
blocks that need it (scores ⋈ route, the 2D-SpMV communication pattern:
each vertex value travels once per block containing one of its out-edges),
then a cogrouped ``applyInPandas`` runs the numpy kernel per block. Because
every dst lives in exactly ONE block, kernel output is already the final
per-vertex aggregate — no second aggregation shuffle. AVX-512 gather /
conflict-detect / reduce-scatter (ONLP.cpp:123-196) becomes np.searchsorted
gather + np.add.reduceat segment reduction.

The static side of the cogroup is cached pre-partitioned by ``block``
(hashpartitioning survives the shallow persisted scan), so per superstep
only the routed value rows shuffle — the cluster-scale bucketed layout,
realized on local mode too.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SCHEMA = (
    "block int, dst_ids array<long>, indptr array<int>, "
    "srcs array<long>, vals array<double>"
)


def _pack_block(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block CSR packing: sort edges by (dst, src), row-pointerize."""
    dst = pdf["dst"].to_numpy(np.int64)
    src = pdf["src"].to_numpy(np.int64)
    val = pdf["val"].to_numpy(np.float64)
    order = np.lexsort((src, dst))
    dst, src, val = dst[order], src[order], val[order]
    dst_ids, counts = np.unique(dst, return_counts=True)
    indptr = np.zeros(len(dst_ids) + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    return pd.DataFrame(
        {
            "block": [int(pdf["block"].iloc[0])],
            "dst_ids": [dst_ids],
            "indptr": [indptr],
            "srcs": [src],
            "vals": [val],
        }
    )


@dataclass
class CsrBlocks:
    """The persisted block + routing tables for one static edge payload."""

    blocks: DataFrame
    route: DataFrame
    num_blocks: int

    @staticmethod
    def build(edges: DataFrame, num_blocks: int, val_col: str = "weight") -> "CsrBlocks":
        """One shuffle by dst-block; blocks and route persist for the whole
        fixpoint loop (the analogue of MPLP's one-time CSR flattening)."""
        e = edges.select(
            "src", "dst", F.col(val_col).cast("double").alias("val")
        ).withColumn("block", F.pmod(F.xxhash64("dst"), F.lit(num_blocks)).cast("int"))
        # cut the packing plan, then cache the SHALLOW scan pre-partitioned
        # by block: the cogroup's required clustering is satisfied by the
        # cache's hashpartitioning(block, P), so the packed block rows stop
        # reshuffling into the cogroup every superstep (the bucketed-table
        # layout the module docstring promises, realized on local mode too)
        blocks = (
            e.groupBy("block")
            .applyInPandas(_pack_block, BLOCK_SCHEMA)
            .localCheckpoint(eager=True)
            .repartition(num_blocks, "block")
            .persist()
        )
        blocks.count()
        route = e.select("block", "src").distinct().localCheckpoint(eager=True)
        return CsrBlocks(blocks, route, num_blocks)

    def unpersist(self) -> None:
        self.blocks.unpersist()  # route is checkpoint-backed; freed by GC

    # ---- kernels ---------------------------------------------------------
    def _cogroup(self, values: DataFrame, kernel, out_schema: str) -> DataFrame:
        routed = values.join(self.route, "src")
        return (
            routed.groupby("block")
            .cogroup(self.blocks.groupby("block"))
            .applyInPandas(kernel, out_schema)
        )

    def gather_sum(self, values: DataFrame) -> DataFrame:
        """values(src, value) -> (id, mass): mass[d] = Σ_{(s→d)} vals*value[s].

        The PageRank pull superstep (PageRank.cpp:54-63) as one
        gather (searchsorted) + segment-sum (np.add.reduceat) per block.
        """
        return self._cogroup(values, _kernel_weighted_sum, "id long, mass double")

    def gather_min_label(self, labels: DataFrame) -> DataFrame:
        """labels(src, label) -> (id, cand): min neighbor label per dst —
        the hash-min CC candidate step (ParallelConnectedComponents.cpp:56-63).
        """
        return self._cogroup(labels, _kernel_min_label, "id long, cand long")

    def gather_heaviest_label(self, labels: DataFrame) -> DataFrame:
        """labels(src, label) -> (id, cand): per dst, the label with the
        largest incident weight sum, ties to the SMALLEST label id — the PLP
        sweep (PLP.cpp:80-92; tie-break MPLP.cpp:122-128) with the
        per-thread dense labelWeights scratch (MPLP.cpp:84-85) realized as a
        per-block pandas groupby reduction.
        """
        return self._cogroup(labels, _kernel_heaviest_label, "id long, cand long")


def _unpack(right: pd.DataFrame):
    dst_ids = np.asarray(right["dst_ids"].iloc[0], dtype=np.int64)
    indptr = np.asarray(right["indptr"].iloc[0], dtype=np.int64)
    srcs = np.asarray(right["srcs"].iloc[0], dtype=np.int64)
    vals = np.asarray(right["vals"].iloc[0], dtype=np.float64)
    return dst_ids, indptr, srcs, vals


def _lookup(srcs: np.ndarray, keys: np.ndarray, values: np.ndarray):
    """Gather values for ``srcs`` from the (key, value) pairs — the SIMD
    gather (_mm512_i32gather) analogue. Returns (values, present-mask);
    absent srcs (frontier-routed supersteps ship only changed vertices)
    carry mask False."""
    order = np.argsort(keys, kind="stable")
    keys_s, values_s = keys[order], values[order]
    pos = np.searchsorted(keys_s, srcs)
    pos = np.clip(pos, 0, max(len(keys_s) - 1, 0))
    present = keys_s[pos] == srcs if len(keys_s) else np.zeros(len(srcs), bool)
    out = values_s[pos] if len(keys_s) else np.zeros(len(srcs), values.dtype)
    return out, present


def _kernel_weighted_sum(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    if right.empty or left.empty:
        return pd.DataFrame({"id": pd.Series(dtype="int64"), "mass": pd.Series(dtype="float64")})
    dst_ids, indptr, srcs, vals = _unpack(right)
    score, present = _lookup(
        srcs,
        left["src"].to_numpy(np.int64),
        left["value"].to_numpy(np.float64),
    )
    contrib = np.where(present, vals * score, 0.0)
    mass = np.add.reduceat(contrib, indptr[:-1]) if len(dst_ids) else np.empty(0)
    return pd.DataFrame({"id": dst_ids, "mass": mass})


_NO_LABEL = np.iinfo(np.int64).max


def _kernel_min_label(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    if right.empty or left.empty:
        return pd.DataFrame({"id": pd.Series(dtype="int64"), "cand": pd.Series(dtype="int64")})
    dst_ids, indptr, srcs, _ = _unpack(right)
    lbl, present = _lookup(
        srcs,
        left["src"].to_numpy(np.int64),
        left["label"].to_numpy(np.int64),
    )
    lbl = np.where(present, lbl, _NO_LABEL)
    cand = np.minimum.reduceat(lbl, indptr[:-1]) if len(dst_ids) else np.empty(0, np.int64)
    keep = cand != _NO_LABEL  # dst none of whose in-neighbors were routed
    return pd.DataFrame({"id": dst_ids[keep], "cand": cand[keep].astype(np.int64)})


def _kernel_heaviest_label(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    if right.empty or left.empty:
        return pd.DataFrame({"id": pd.Series(dtype="int64"), "cand": pd.Series(dtype="int64")})
    dst_ids, indptr, srcs, vals = _unpack(right)
    lbl, present = _lookup(
        srcs,
        left["src"].to_numpy(np.int64),
        left["label"].to_numpy(np.int64),
    )
    row = np.repeat(np.arange(len(dst_ids), dtype=np.int64), np.diff(indptr))
    agg = (
        pd.DataFrame({"row": row[present], "label": lbl[present], "w": vals[present]})
        .groupby(["row", "label"], sort=False, as_index=False)["w"]
        .sum()
    )
    # heaviest weight first, then smallest label — first row per dst wins
    agg = agg.sort_values(["row", "w", "label"], ascending=[True, False, True])
    win = agg.drop_duplicates("row", keep="first")
    return pd.DataFrame(
        {"id": dst_ids[win["row"].to_numpy()], "cand": win["label"].to_numpy(np.int64)}
    )
