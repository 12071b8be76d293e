"""Streaming transcript -> edge pipeline.

Batch derivation (networkit_spark.edges) uses a window lag for tool->tool
transitions; window functions are unsupported on unbounded streams, so the
transition step becomes a custom stateful operator
(``applyInPandasWithState`` keyed by conv_id, state = last seen
(turn_idx, tool)) — the engine's documented extension point for stateful
streaming kernels. Everything else is stateless projections + watermarked
windowed aggregation.

Late/out-of-order turns: within a micro-batch, turns are sorted by
(turn_idx); across batches the state keeps the LAST emitted turn_idx and
drops older arrivals (the same stable-(conv_id, turn_idx)-ordering contract
as the batch pipeline; a turn arriving after a later turn was processed
would create a non-causal transition, so it is skipped and counted).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("src_key", T.StringType()),
        T.StructField("dst_key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType()),
        T.StructField("last_tool", T.StringType()),
    ]
)


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript parquet drops (one file per
    micro-batch input); on a production cluster the same code reads Kafka
    or an Iceberg streaming source — only this reader changes."""
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)


def turn_pairs_stream(transcripts: DataFrame) -> DataFrame:
    """Stateless per-turn pairs: conv<->role and conv<->tool, with the turn
    timestamp kept for watermarking. Mirrors the batch derivation
    (edges.transcript_edge_keys) minus the transition lag."""
    conv = F.concat(F.lit("conv:"), F.col("conv_id"))
    p1 = transcripts.select(
        conv.alias("a"), F.concat(F.lit("role:"), F.col("role")).alias("b"), "ts"
    )
    p2 = transcripts.filter(F.col("tool").isNotNull()).select(
        conv.alias("a"), F.concat(F.lit("tool:"), F.col("tool")).alias("b"), "ts"
    )
    pairs = p1.unionByName(p2)
    return pairs.select(
        F.least("a", "b").alias("src_key"), F.greatest("a", "b").alias("dst_key"), "ts"
    )


def _state_timeout(ttl_ms: int | None) -> str:
    """GroupStateTimeout conf for an optional processing-time TTL (VERDICT
    r4 task 6): None keeps the exact-forever NoTimeout contract; a positive
    ttl_ms bounds the state store — each group's state is evicted after
    ttl_ms of inactivity (the kernel refreshes the clock on every batch it
    sees and removes the row when the timeout fires)."""
    if ttl_ms is None:
        return GroupStateTimeout.NoTimeout
    if ttl_ms <= 0:
        raise ValueError(f"ttl_ms must be positive, got {ttl_ms}")
    return GroupStateTimeout.ProcessingTimeTimeout


def _transition_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Per-conv stateful kernel: emit tool(t-1)<->tool(t) transitions across
    micro-batch boundaries. Vectorized pandas inside; one state tuple per
    conversation. With a TTL, an idle conversation's state is evicted on
    timeout; a later turn for it starts from scratch (no phantom edge
    across the eviction)."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        last_turn, last_tool = state.get
    else:
        last_turn, last_tool = -1, None

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows[rows["tool"].notna()].sort_values("turn_idx")
    rows = rows[rows["turn_idx"] > last_turn]  # drop non-causal stragglers

    out_src, out_dst, out_ts = [], [], []
    for turn, tool, ts in zip(rows["turn_idx"], rows["tool"], rows["ts"]):
        if last_tool is not None:
            a, b = f"tool:{last_tool}", f"tool:{tool}"
            out_src.append(min(a, b))
            out_dst.append(max(a, b))
            out_ts.append(ts)
        last_turn, last_tool = int(turn), tool
    state.update((last_turn, last_tool))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame({"src_key": out_src, "dst_key": out_dst, "ts": out_ts})


def tool_transitions_stream(
    transcripts: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """tool->tool transition pairs via applyInPandasWithState (the custom
    stateful streaming operator; state never grows beyond one row per
    conversation — and with ``ttl_ms`` set, idle conversations are evicted
    after that much processing-time inactivity)."""
    import functools

    return (
        transcripts.select("conv_id", "turn_idx", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            functools.partial(_transition_fn, ttl_ms=ttl_ms),
            outputStructType=_TRANSITION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=_state_timeout(ttl_ms),
        )
    )


def windowed_edge_counts(
    pairs: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window edge weights: late rows beyond the
    watermark are dropped, windows finalize once the watermark passes."""
    return (
        pairs.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "src_key", "dst_key")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "src_key",
            "dst_key",
            "weight",
        )
    )


def incremental_degrees(
    pairs: DataFrame, state_dir: str, checkpoint_dir: str
):
    """foreachBatch incremental maintenance of the weighted degree table —
    the Dyn*-algorithm analogue: each micro-batch's pair counts are folded
    into a parquet-backed running aggregate (idempotent per batch_id via
    overwrite of a delta partition, then compacted on read)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.select(F.col("src_key").alias("key"))
            .unionByName(batch_df.select(F.col("dst_key").alias("key")))
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        )
        delta.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")

    return (
        pairs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def read_degrees(spark: SparkSession, state_dir: str) -> DataFrame:
    """Compacted view of the incremental degree state."""
    return (
        spark.read.option("basePath", state_dir)
        .parquet(f"{state_dir}/batch=*")
        .groupBy("key")
        .agg(F.sum("deg").alias("deg"))
    )


# ---- streaming exact dedup -------------------------------------------------

_DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text_hash", T.StringType()),
        T.StructField("is_dup", T.BooleanType()),
        T.StructField("rep_id", T.LongType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("rep_id", T.LongType())])


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Per-content-hash stateful kernel: the first-seen document becomes the
    canonical representative (min doc_id inside the first micro-batch that
    carries the hash — deterministic at any parallelism), every later
    arrival is flagged a duplicate of it. One 8-byte state row per distinct
    text, forever — the streaming analogue of exact_duplicates' min-id
    survivor election. With a TTL, an idle hash's state is evicted on
    timeout — the dedup horizon becomes the TTL, and a re-arrival after
    eviction elects a fresh representative."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        (rep,) = state.get
    else:
        rep = int(rows["doc_id"].min())
        state.update((rep,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "doc_id": rows["doc_id"].astype("int64"),
            "text_hash": key[0],
            "is_dup": rows["doc_id"] != rep,
            "rep_id": rep,
        }
    )


def dedup_stream(docs: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming exact deduplication over a document stream: annotate every
    arriving document with (is_dup, rep_id) against all content seen so far.

    Spark-first shape: md5 the text per row (JVM expr), group by the digest,
    ``applyInPandasWithState`` holds exactly one LONG per distinct text —
    the same state-store discipline as tool_transitions_stream. At ingest
    scale the state store is the distinct-content set; production pipelines
    bound it with a TTL when the stream outlives the dedup horizon: pass
    ``ttl_ms`` and the dedup window becomes "content seen within the last
    ttl_ms of processing time" (default None = exact-forever, matching the
    batch operator's contract so streaming and batch answers agree on
    replay).
    """
    import functools

    hashed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.col("text")).alias("text_hash"),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        functools.partial(_dedup_fn, ttl_ms=ttl_ms),
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_state_timeout(ttl_ms),
    )


# ---- streaming near-dup (MinHash LSH) candidates ---------------------------

_NEARDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("rep_id", T.LongType()),
        T.StructField("is_candidate", T.BooleanType()),
    ]
)

_NEARDUP_STATE_SCHEMA = T.StructType([T.StructField("rep_id", T.LongType())])


def _neardup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Per-(band, bucket) stateful kernel: the first-seen document anchors
    the bucket (min doc_id inside the first micro-batch that carries it),
    every later arrival is a near-duplicate CANDIDATE against that anchor.
    One 8-byte state row per occupied LSH bucket; with a TTL, an idle
    bucket's anchor is evicted on timeout and re-elected on re-arrival."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        (rep,) = state.get
    else:
        rep = int(rows["doc_id"].min())
        state.update((rep,))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {
            "doc_id": rows["doc_id"].astype("int64"),
            "band": key[0],
            "bucket": key[1],
            "rep_id": rep,
            "is_candidate": rows["doc_id"] != rep,
        }
    )


def banded_minhash_per_row(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """(doc_id, band, bucket) computed with PER-ROW expressions only — no
    aggregation, no window — so the same code runs on a bounded table or an
    unbounded stream. The batch tier (functions.dedup.minhash_bands) min-
    aggregates over the exploded shingle table because its input IS that
    table; here the staged gram array is still on the row, so each
    min-hash is an ``array_min`` over a ``transform`` and the banded
    bucket digest is the identical md5-of-concatenated-signature. A pytest
    pins per-doc equality of the two formulations. Docs shorter than ``n``
    tokens have no shingles and produce no buckets (same contract as the
    batch path)."""
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    from networkit_spark.functions.textstats import staged_tokens_and_grams

    rows = num_hashes // bands
    staged = staged_tokens_and_grams(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        ["doc_id"],
        "text",
        n,
    ).filter(F.size("__g") > 0)
    # SQL-text lambdas with UNIQUE variable names (g0..g15), not
    # F.transform(python lambda): every Python-built lambda is named `x`
    # (pyspark _create_lambda), and nesting one over a column that an
    # EARLIER projection defined with its own `x` lambda (here `__g`,
    # itself a transform) mis-binds the variable after projection collapse
    # — measured wrong min-hashes, values changing with the number of
    # sibling columns selected. Same-select nesting is scoped correctly by
    # the analyzer; the cross-projection inline is the trap.
    hcols = [
        F.expr(
            f"array_min(transform(__g, g{i} -> md5(concat('{i}:', g{i}))))"
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    mins = staged.select("doc_id", *hcols)
    buckets = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"h{b * rows + j}") for j in range(rows)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return mins.select(
        "doc_id", F.explode(buckets).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def near_dup_stream(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate candidates: annotate every
    arriving document with its banded buckets and the bucket's first-seen
    anchor document.

    Spark-first shape: the banded signature is pure per-row expression work
    (banded_minhash_per_row — stream-legal because nothing aggregates),
    then ``applyInPandasWithState`` keyed by (band, bucket) holds exactly
    one LONG per occupied bucket — the streaming analogue of the batch
    bucket join in minhash_candidate_pairs. Verification (exact Jaccard /
    cosine re-rank of candidates) stays a batch join over the emitted
    candidates, exactly as in the batch tier; the state store's
    cardinality is the occupied-bucket count, the same table the batch LSH
    builds; bound it with ``ttl_ms`` when the stream outlives the dedup
    horizon (idle buckets evict and re-anchor on re-arrival)."""
    import functools

    return (
        banded_minhash_per_row(docs, num_hashes=num_hashes, bands=bands, n=n)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            functools.partial(_neardup_fn, ttl_ms=ttl_ms),
            outputStructType=_NEARDUP_OUT_SCHEMA,
            stateStructType=_NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=_state_timeout(ttl_ms),
        )
    )
