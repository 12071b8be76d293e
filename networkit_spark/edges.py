"""Transcripts -> weighted undirected entity graph (FIXTURES.md §1, SURVEY.md §7.1).

Entity keys:  ``conv:<conv_id>``, ``tool:<tool>``, ``role:<role>``.
Edges per turn: conv<->role (every turn), conv<->tool (non-null tool), and
tool(t-1)<->tool(t) transitions between consecutive tool-bearing turns of a
conversation under the stable (conv_id, turn_idx) ordering (window lag).
Weight = occurrence count, symmetrized; self-loops (tool==tool transition)
stored once, mirroring the reference Graph which stores undirected edges in
both adjacency lists but a self-loop once (graph/Graph.cpp:562-610).

Dense ids are minted the way GraphTools::getContinuousNodeIds does
(networkit/cpp/graph/GraphTools.cpp:438) but distribution-friendly: a
range-partitioned sort by key + per-partition row_number + cumulative
partition offsets. No global single-partition window, so it scales to
billions of keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transcript_edge_keys(transcripts: DataFrame) -> DataFrame:
    """Undirected (src_key, dst_key, weight) pairs, canonicalized src<=dst.

    Pure DataFrame ops: two projections + one window lag + groupBy count.
    The filters/projections reach the parquet scan (only conv_id, turn_idx,
    role, tool are read — predicate pushdown + column pruning).
    """
    t = transcripts.select("conv_id", "turn_idx", "role", "tool")

    conv = F.concat(F.lit("conv:"), F.col("conv_id"))

    conv_role = t.select(
        conv.alias("a"), F.concat(F.lit("role:"), F.col("role")).alias("b")
    )
    conv_tool = t.filter(F.col("tool").isNotNull()).select(
        conv.alias("a"), F.concat(F.lit("tool:"), F.col("tool")).alias("b")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tool_seq = (
        t.filter(F.col("tool").isNotNull())
        .withColumn("prev_tool", F.lag("tool").over(w))
        .filter(F.col("prev_tool").isNotNull())
        .select(
            F.concat(F.lit("tool:"), F.col("prev_tool")).alias("a"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("b"),
        )
    )

    pairs = conv_role.unionByName(conv_tool).unionByName(tool_seq)
    return (
        pairs.select(
            F.least("a", "b").alias("src_key"),
            F.greatest("a", "b").alias("dst_key"),
        )
        .groupBy("src_key", "dst_key")
        .agg(F.count(F.lit(1)).cast("float").alias("weight"))
    )


def mint_dense_ids(keys: DataFrame, key_col: str = "key", partitions: int | None = None) -> DataFrame:
    """Dictionary DF (id: long, <key_col>: string) — dense 0-based ids in
    lexicographic key order, deterministically, at any scale.

    Equivalent to ``row_number() over (order by key) - 1`` without the
    single-reducer global window. The range boundaries are NOT taken from
    Spark's range partitioner (its reservoir sample depends on shuffle
    fetch order, so recomputations can shift boundaries between the
    offset-collect job and downstream jobs — minting colliding ids; this
    bit at 2M+ keys). Instead:

    1. deterministic sample: keys with ``xxhash64(key) % rate == 0`` —
       a pure function of the key set, ~64 samples per target partition;
    2. boundaries = every k-th sorted sample (driver-side, tiny);
    3. bucket(key) = #boundaries < key (broadcast array + filter expr);
    4. row_number within bucket ordered by key; per-bucket counts ->
       cumulative offsets (one B-row collect); id = offset + rn - 1.

    Every step is a pure function of the key set, so the mapping is
    identical across recomputations, parallelism levels, and cluster sizes.
    """
    distinct = keys.select(key_col).distinct()
    total = distinct.count()
    if total == 0:
        return distinct.select(F.lit(0).cast("long").alias("id"), F.col(key_col))
    if partitions is None:
        sess = keys.sparkSession
        partitions = max(1, min(int(sess.conf.get("spark.sql.shuffle.partitions")),
                                total // 4096 + 1))
    # never rank in one global bucket when there are >= 2 keys: a single
    # bucket makes `pid` a foldable literal, Catalyst folds the partition
    # spec away, and the rank becomes a single-task global window (the ids
    # themselves are partition-independent, so this changes no output)
    if partitions == 1 and total >= 2:
        partitions = 2

    if partitions > 1:
        # deterministic ~64-samples-per-partition hash sample
        rate = max(1, total // (64 * partitions))
        sample = sorted(
            r[0]
            for r in distinct.filter(
                F.pmod(F.xxhash64(F.col(key_col)), F.lit(rate)) == 0
            ).collect()
        )
        step = max(1, len(sample) // partitions)
        boundaries = sample[step::step][: partitions - 1]
    else:
        boundaries = []

    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        bucket = F.size(F.filter(barr, lambda b: b <= F.col(key_col)))
    else:
        bucket = F.lit(0)

    df = distinct.withColumn("pid", bucket).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("pid").orderBy(key_col)) - 1,
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in df.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("pid"),
    )
    return df.select(
        (F.col("rn") + off_expr).cast("long").alias("id"), F.col(key_col)
    )


def derive_edges(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) for the symmetrized transcript entity graph.

    vertices(id: long, key: string); edges(src: long, dst: long,
    weight: float) with both directions present, self-loops once.
    """
    pairs = transcript_edge_keys(transcripts)
    keys = pairs.select(F.col("src_key").alias("key")).unionByName(
        pairs.select(F.col("dst_key").alias("key"))
    )
    vertices = mint_dense_ids(keys)

    dict_a = vertices.withColumnRenamed("key", "src_key").withColumnRenamed("id", "src")
    dict_b = vertices.withColumnRenamed("key", "dst_key").withColumnRenamed("id", "dst")
    # no forced broadcast: the dictionary is vertex-sized (one row per
    # entity) — usually small relative to edges but unbounded; AQE promotes
    # the join to broadcast-hash at runtime when the dictionary fits
    half = (
        pairs.join(dict_a, "src_key")
        .join(dict_b, "dst_key")
        .select("src", "dst", "weight")
    )
    sym = half.unionByName(
        half.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return vertices, sym
