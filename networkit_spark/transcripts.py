"""Deterministic synthetic multi-turn transcripts source.

Produces the BASELINE input_hint schema:

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string /*nullable*/, ts timestamp)

Generation is fully distributed and per-row deterministic: every field is a
pure function of (seed, conv_id, turn_idx) via xxhash64, so the table is
identical regardless of parallelism, partitioning, or cluster size — the
property that lets the same generator produce the 10^12-turn bench input on
a 1000-executor cluster and the 200-conv pytest fixture locally.

Tool choice is Zipf-skewed (FIXTURES.md §1) so tool entities become hub
vertices and exercise the skew path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOOL_NAMES = [
    "search", "python", "browser", "sql", "editor", "bash",
    "calculator", "email", "calendar", "files", "maps", "translate",
]

_WORDS = [
    "plan", "check", "run", "fix", "query", "build", "read", "write",
    "scan", "merge", "sort", "join", "graph", "node", "edge", "rank",
]


def _zipf_cdf(n: int, s: float) -> list[float]:
    w = [1.0 / (k ** s) for k in range(1, n + 1)]
    tot = sum(w)
    acc, out = 0.0, []
    for x in w:
        acc += x
        out.append(acc / tot)
    return out


def _h(seed: int, *cols: Column | str) -> Column:
    """Non-negative deterministic 63-bit hash of the given columns."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    n_tools: int = 12,
    zipf_s: float = 1.3,
    seed: int = 42,
    min_turns: int = 3,
    max_turns: int = 40,
    tool_prob: float = 0.6,
) -> DataFrame:
    """Deterministic transcripts table; see module docstring."""
    n_tools = max(1, n_tools)
    tools = [
        TOOL_NAMES[i] if i < len(TOOL_NAMES) else f"tool{i:03d}"
        for i in range(n_tools)
    ]
    cdf = _zipf_cdf(n_tools, zipf_s)

    convs = spark.range(n_convs).select(
        F.format_string("conv-%06d", F.col("id").cast("int")).alias("conv_id")
    )
    span = max_turns - min_turns + 1
    convs = convs.withColumn(
        "n_turns",
        (F.lit(min_turns) + _h(seed, F.col("conv_id")) % F.lit(span)).cast("int"),
    )
    t = convs.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    hrole = _h(seed + 1, "conv_id", "turn_idx")
    htool = _h(seed + 2, "conv_id", "turn_idx")
    hpick = _h(seed + 3, "conv_id", "turn_idx")
    htext = _h(seed + 4, "conv_id", "turn_idx")
    hts = _h(seed + 5, "conv_id", "turn_idx")

    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .when(hrole % 10 < 2, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    # Zipf draw: u in [0,1) -> first tool index whose CDF bound >= u.
    u = (hpick % F.lit(1_000_000)) / F.lit(1_000_000.0)
    pick = F.lit(tools[-1])
    for i in range(n_tools - 2, -1, -1):
        pick = F.when(u < F.lit(cdf[i]), F.lit(tools[i])).otherwise(pick)
    has_tool = (htool % 1000 < int(tool_prob * 1000)) & (F.col("turn_idx") > 0)
    tool = F.when(has_tool, pick).otherwise(F.lit(None).cast("string"))

    words = F.concat_ws(
        " ",
        *[
            F.element_at(
                F.array(*[F.lit(w) for w in _WORDS]),
                (_h(seed + 10 + i, "conv_id", "turn_idx") % len(_WORDS) + 1).cast("int"),
            )
            for i in range(6)
        ],
    )
    text = F.format_string(
        "[%s#%d] %s :: %016x", "conv_id", "turn_idx", words, htext
    )

    # strictly increasing per conv: stride 1000s dominates jitter <900s
    conv_off = (_h(seed + 6, "conv_id") % F.lit(86_400)).cast("long")
    ts = F.timestamp_seconds(
        F.lit(1_704_067_200)  # 2024-01-01T00:00:00Z
        + conv_off
        + F.col("turn_idx").cast("long") * 1000
        + (hts % 900).cast("long")
    )

    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
