"""Structured Streaming layer: watermarked windowed aggregation, stateful
tool transitions (applyInPandasWithState), foreachBatch incremental degrees,
and GraphEvent batch-incremental updates."""

import os

from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.streaming.graph_events import (
    EVENT_SCHEMA,
    apply_events,
    update_components_incremental,
)
from networkit_spark.streaming.transcripts_stream import (
    incremental_degrees,
    read_degrees,
    read_transcript_stream,
    tool_transitions_stream,
    turn_pairs_stream,
    windowed_edge_counts,
)
from networkit_spark.transcripts import synth_transcripts


def _write_batches(spark, base, n_batches=3):
    """Split a synthetic transcript table into per-conv-range parquet drops
    (each drop = one micro-batch input file)."""
    t = synth_transcripts(spark, n_convs=30, seed=11)
    for b in range(n_batches):
        part = t.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(n_batches)) == b
        )
        part.coalesce(1).write.mode("append").parquet(base)
    return t


def test_windowed_counts_match_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    t = _write_batches(spark, src)
    stream = read_transcript_stream(spark, src)
    # batches are split by conv hash (not by event time), so run with a wide
    # watermark and COMPLETE output (append only emits watermark-finalized
    # windows); late-drop behavior has its own test below
    q = (
        windowed_edge_counts(turn_pairs_stream(stream), "60 minutes", "3650 days")
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select src_key, dst_key, cast(sum(weight) as long) n from wincounts group by 1,2"
    )
    # batch equivalent (no windows, total counts)
    conv = F.concat(F.lit("conv:"), F.col("conv_id"))
    p1 = t.select(conv.alias("a"), F.concat(F.lit("role:"), F.col("role")).alias("b"))
    p2 = t.filter(F.col("tool").isNotNull()).select(
        conv.alias("a"), F.concat(F.lit("tool:"), F.col("tool")).alias("b")
    )
    want = (
        p1.unionByName(p2)
        .select(F.least("a", "b").alias("src_key"), F.greatest("a", "b").alias("dst_key"))
        .groupBy("src_key", "dst_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_windowed_counts_watermark_advances_and_finalizes(spark, tmp_path):
    """The watermark advances to (max event time - delay) across
    micro-batches, and append mode emits exactly the finalized windows.
    (Dropping data later than the delay is documented as best-effort in
    Spark, so this asserts the guaranteed side: watermark progression +
    append-mode finalization.)"""
    import datetime

    src = os.path.join(str(tmp_path), "late_in")
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    batch1 = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, base),
         ("c1", 1, "assistant", "yo", None, base + datetime.timedelta(hours=2))],
        schema,
    )
    # 2h - watermark(30m) => watermark passed 10:00; this 9:00 row is late
    batch2 = spark.createDataFrame(
        [("c2", 0, "user", "late", None, base - datetime.timedelta(hours=3))], schema
    )
    import time as _time

    batch1.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.5)  # file source orders micro-batches by mtime
    batch2.coalesce(1).write.mode("append").parquet(src)
    # two files -> maxFilesPerTrigger makes them separate micro-batches
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_edge_counts(turn_pairs_stream(stream), "60 minutes", "30 minutes")
        .writeStream.format("memory")
        .queryName("latecounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # watermark reached max(ts) - 30min = 13:30 by the last batch
    marks = [
        p["eventTime"].get("watermark")
        for p in q.recentProgress
        if p["eventTime"].get("watermark")
    ]
    assert any(m.startswith("2026-01-01T13:30") for m in marks), marks
    rows = spark.sql("select * from latecounts").collect()
    keys = {r["src_key"] for r in rows} | {r["dst_key"] for r in rows}
    assert any("conv:c1" in k for k in keys)
    # only windows whose end <= watermark are emitted in append mode:
    # c1's 14:00 turn sits in [14:00, 15:00), past the 13:30 watermark
    ends = {r["window_end"].isoformat() for r in rows}
    assert all(e <= "2026-01-01T13:30:00" for e in ends), ends


def test_stateful_tool_transitions(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    t = _write_batches(spark, src, n_batches=2)
    stream = read_transcript_stream(spark, src)
    q = (
        tool_transitions_stream(stream)
        .writeStream.format("memory")
        .queryName("transitions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select src_key, dst_key, count(*) n from transitions group by 1,2"
    )
    # batch oracle: lag over (conv_id, turn_idx)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    want = (
        t.filter(F.col("tool").isNotNull())
        .withColumn("prev", F.lag("tool").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.concat(F.lit("tool:"), F.col("prev")).alias("a"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("b"),
        )
        .select(F.least("a", "b").alias("src_key"), F.greatest("a", "b").alias("dst_key"))
        .groupBy("src_key", "dst_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_incremental_degrees(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    state = os.path.join(str(tmp_path), "state")
    cp = os.path.join(str(tmp_path), "cp")
    t = _write_batches(spark, src)
    stream = read_transcript_stream(spark, src)
    q = incremental_degrees(turn_pairs_stream(stream), state, cp).start()
    q.awaitTermination(120)
    got = {r["key"]: r["deg"] for r in read_degrees(spark, state).collect()}
    assert len(got) > 0
    # degree of each key == its appearances across all pairs (batch oracle)
    conv = F.concat(F.lit("conv:"), F.col("conv_id"))
    pairs = (
        t.select(conv.alias("a"), F.concat(F.lit("role:"), F.col("role")).alias("b"))
        .unionByName(
            t.filter(F.col("tool").isNotNull()).select(
                conv.alias("a"), F.concat(F.lit("tool:"), F.col("tool")).alias("b")
            )
        )
    )
    want = {
        r["key"]: r["deg"]
        for r in pairs.select(F.col("a").alias("key"))
        .unionByName(pairs.select(F.col("b").alias("key")))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("deg"))
        .collect()
    }
    assert got == want


def test_apply_events(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2)])
    ev = spark.createDataFrame(
        [
            ("NODE_ADD", 3, None, None),
            ("EDGE_ADD", 2, 3, 2.0),
            ("EDGE_REMOVE", 0, 1, None),
            ("EDGE_WEIGHT_UPDATE", 1, 2, 5.0),
        ],
        EVENT_SCHEMA,
    )
    g2 = apply_events(g, ev)
    assert g2.num_nodes() == 4
    edges = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert (0, 1) not in edges and (1, 0) not in edges
    assert edges[(2, 3)] == 2.0 and edges[(3, 2)] == 2.0
    assert edges[(1, 2)] == 5.0 and edges[(2, 1)] == 5.0


def test_apply_events_duplicate_weight_updates_no_multigraph(spark):
    # two EDGE_WEIGHT_UPDATEs for the same edge in ONE batch: the left join
    # must not duplicate the edge row (batch = simultaneous set; max wins)
    g = from_edge_rows(spark, [(0, 1), (1, 2)])
    ev = spark.createDataFrame(
        [
            ("EDGE_WEIGHT_UPDATE", 0, 1, 3.0),
            ("EDGE_WEIGHT_UPDATE", 0, 1, 7.0),
        ],
        EVENT_SCHEMA,
    )
    g2 = apply_events(g, ev)
    rows = g2.edges.filter("src = 0 AND dst = 1").collect()
    assert len(rows) == 1 and rows[0]["weight"] == 7.0
    assert g2.num_edges() == 2


def test_fold_events_weight_updates_last_wins_by_t(spark):
    # non-stepwise fold honors stream order for weight updates: the
    # latest t in the folded prefix survives (GEXF multi-attvalue case)
    from networkit_spark.sources.dynamic_generators import fold_events

    ev = spark.createDataFrame(
        [
            (0, "NODE_ADD", 0, None, None),
            (0, "NODE_ADD", 1, None, None),
            (1, "EDGE_ADD", 0, 1, 1.0),
            (2, "EDGE_WEIGHT_UPDATE", 0, 1, 4.0),
            (3, "EDGE_WEIGHT_UPDATE", 0, 1, 9.0),
        ],
        "t long, etype string, u long, v long, w float",
    )
    g = fold_events(spark, ev)
    rows = g.edges.filter("src = 0 AND dst = 1").collect()
    assert len(rows) == 1 and rows[0]["weight"] == 9.0
    # prefix fold up to t=2 keeps the t=2 update, not the later one
    g2 = fold_events(spark, ev, up_to=2)
    assert g2.edges.filter("src = 0 AND dst = 1").collect()[0]["weight"] == 4.0


def test_incremental_cc_merge(spark):
    from networkit_spark.operators.components import connected_components

    g = from_edge_rows(spark, [(0, 1), (2, 3)], num_nodes=4)
    labels0 = connected_components(g)
    ev = spark.createDataFrame([("EDGE_ADD", 1, 2, 1.0)], EVENT_SCHEMA)
    g2 = apply_events(g, ev)
    added = spark.createDataFrame([(1, 2)], "src long, dst long")
    labels1 = update_components_incremental(g2, labels0, added)
    got = {r["id"]: r["label"] for r in labels1.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}
    # matches a from-scratch recompute
    fresh = {r["id"]: r["label"] for r in connected_components(g2).collect()}
    assert got == fresh


def test_incremental_bfs_shortcut_and_new_reach(spark):
    from networkit_spark.operators.centrality import bfs_hops
    from networkit_spark.streaming.graph_events import update_bfs_incremental

    # path 0-1-2-3-4 plus an isolated pair 5-6; then add shortcut 0-3 and
    # bridge 4-5 (makes 5,6 newly reachable and shortens 3,4)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], num_nodes=7)
    dist0 = bfs_hops(g, 0)
    ev = spark.createDataFrame(
        [("EDGE_ADD", 0, 3, 1.0), ("EDGE_ADD", 4, 5, 1.0)], EVENT_SCHEMA
    )
    g2 = apply_events(g, ev)
    added = spark.createDataFrame([(0, 3), (4, 5)], "src long, dst long")
    got = {r["id"]: r["dist"] for r in update_bfs_incremental(g2, dist0, added).collect()}
    fresh = {r["id"]: r["dist"] for r in bfs_hops(g2, 0).collect()}
    assert got == fresh
    assert got[3] == 1 and got[4] == 2 and got[5] == 3 and got[6] == 4


def test_incremental_bfs_directed(spark):
    from networkit_spark.operators.centrality import bfs_hops
    from networkit_spark.streaming.graph_events import update_bfs_incremental

    g = from_edge_rows(
        spark, [(0, 1), (1, 2), (2, 3)], num_nodes=5, directed=True
    )
    dist0 = bfs_hops(g, 0)
    ev = spark.createDataFrame([("EDGE_ADD", 3, 0, 1.0), ("EDGE_ADD", 1, 4, 1.0)], EVENT_SCHEMA)
    g2 = apply_events(g, ev)
    added = spark.createDataFrame([(3, 0), (1, 4)], "src long, dst long")
    got = {r["id"]: r["dist"] for r in update_bfs_incremental(g2, dist0, added).collect()}
    fresh = {r["id"]: r["dist"] for r in bfs_hops(g2, 0).collect()}
    assert got == fresh
    # 3->0 is a back-edge: must NOT change dist of 0; 4 newly reachable at 2
    assert got[0] == 0 and got[4] == 2


def test_graph_difference_roundtrip(spark):
    from networkit_spark.streaming.graph_events import graph_difference

    g1 = from_edge_rows(spark, [(0, 1, 1.0), (1, 2, 2.0), (3, 4, 1.0)], num_nodes=5)
    g2 = from_edge_rows(spark, [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 1.0)], num_nodes=4)
    # g2 drops node 4 (and edge 3-4), reweights 1-2, adds 2-3
    diff = graph_difference(g1, g2)
    got = {(r["etype"], r["u"], r["v"]) for r in diff.collect()}
    assert got == {
        ("NODE_REMOVE", 4, None),
        ("EDGE_REMOVE", 3, 4),
        ("EDGE_ADD", 2, 3),
        ("EDGE_WEIGHT_UPDATE", 1, 2),
    }
    # applying the edits reproduces g2 exactly
    g3 = apply_events(g1, diff)
    assert {r["id"] for r in g3.vertices.collect()} == {0, 1, 2, 3}
    e3 = {(r["src"], r["dst"]): r["weight"] for r in g3.edges.collect()}
    e2 = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert e3 == e2


def test_graph_difference_identical(spark):
    from networkit_spark.streaming.graph_events import graph_difference

    g = from_edge_rows(spark, [(0, 1), (1, 2)], num_nodes=3)
    assert graph_difference(g, g).count() == 0


def test_incremental_sssp_weight_decrease_and_add(spark):
    from networkit_spark.operators.centrality import sssp_weighted
    from networkit_spark.streaming.graph_events import update_sssp_incremental

    g = from_edge_rows(
        spark,
        [(0, 1, 4.0), (1, 2, 4.0), (0, 3, 1.0), (3, 4, 1.0), (5, 6, 1.0)],
        num_nodes=7,
    )
    d0 = sssp_weighted(g, 0)
    # decrease 1-2 to 0.5, add shortcut 4-2 (w 0.5) and bridge 2-5 (w 2)
    ev = spark.createDataFrame(
        [
            ("EDGE_WEIGHT_UPDATE", 1, 2, 0.5),
            ("EDGE_ADD", 4, 2, 0.5),
            ("EDGE_ADD", 2, 5, 2.0),
        ],
        EVENT_SCHEMA,
    )
    g2 = apply_events(g, ev)
    added = spark.createDataFrame(
        [(1, 2, 0.5), (4, 2, 0.5), (2, 5, 2.0)], "src long, dst long, weight double"
    )
    got = {
        r["id"]: r["dist"]
        for r in update_sssp_incremental(g2, d0, added).collect()
    }
    fresh = {r["id"]: r["dist"] for r in sssp_weighted(g2, 0).collect()}
    assert got == fresh
    assert got[2] == 2.5 and got[5] == 4.5 and got[6] == 5.5


def test_incremental_apsp(spark):
    from networkit_spark.operators.distance import multi_source_hops
    from networkit_spark.streaming.graph_events import update_apsp_incremental

    # two chains 0-1-2 and 3-4-5; adds bridge 2-3 and shortcut 0-5 —
    # shortcuts must CHAIN through both new edges
    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4), (4, 5)], num_nodes=6)
    apsp0 = multi_source_hops(g)
    ev = spark.createDataFrame(
        [("EDGE_ADD", 2, 3, 1.0), ("EDGE_ADD", 0, 5, 1.0)], EVENT_SCHEMA
    )
    g2 = apply_events(g, ev)
    added = spark.createDataFrame([(2, 3), (0, 5)], "src long, dst long")
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in update_apsp_incremental(g2, apsp0, added).collect()
    }
    fresh = {
        (r["s"], r["id"]): r["dist"] for r in multi_source_hops(g2).collect()
    }
    assert got == fresh
    assert got[(1, 4)] == 3  # 1-0-5-4 via the new shortcut


def _er_rows(seed, n, m):
    import numpy as np

    rng = np.random.RandomState(seed)
    es = set()
    while len(es) < m:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es.add((min(a, b), max(a, b)))
    return [(a, b, 1.0) for a, b in sorted(es)]


def test_dyn_katz_incremental_matches_recompute(spark):
    from networkit_spark.streaming.graph_events import (
        katz_levels,
        update_katz_incremental,
    )

    rows = _er_rows(11, 12, 18)
    extra = [(0, 11, 1.0), (3, 9, 1.0)]
    extra = [e for e in extra if (e[0], e[1]) not in {(a, b) for a, b, _ in rows}]
    g0 = from_edge_rows(spark, rows, num_nodes=12, weighted=True)
    g1 = from_edge_rows(spark, rows + extra, num_nodes=12, weighted=True)
    K, A, B = 6, 0.05, 0.1
    lv0 = katz_levels(g0, A, B, K)
    add = spark.createDataFrame(extra, "src long, dst long, weight double")
    _, scores = update_katz_incremental(g1, lv0, add, A, B, K)
    got = {r["id"]: r["score"] for r in scores.collect()}
    lvf = katz_levels(g1, A, B, K)
    import math

    final = {r["id"]: r["x"] for r in lvf.filter("k = %d" % K).collect()}
    norm = math.sqrt(sum(v * v for v in final.values()))
    for i, v in final.items():
        assert abs(got[i] - v / norm) < 1e-9, i


def test_dyn_betweenness_incremental_matches_recompute(spark):
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.streaming.graph_events import (
        update_betweenness_incremental,
    )

    rows = _er_rows(13, 11, 16)
    have = {(a, b) for a, b, _ in rows}
    extra = [e for e in [(0, 10, 1.0), (2, 7, 1.0)] if (e[0], e[1]) not in have]
    g0 = from_edge_rows(spark, rows, num_nodes=11, weighted=True)
    g1 = from_edge_rows(spark, rows + extra, num_nodes=11, weighted=True)
    bc0 = betweenness(g0)
    add = spark.createDataFrame(extra, "src long, dst long, weight double")
    upd = {r["id"]: r["score"]
           for r in update_betweenness_incremental(g0, g1, bc0, add).collect()}
    want = {r["id"]: r["score"] for r in betweenness(g1).collect()}
    for i in want:
        assert abs(upd[i] - want[i]) < 1e-9, (i, upd[i], want[i])


def test_dyn_harmonic_incremental_matches_recompute(spark):
    from networkit_spark.operators.distance import multi_source_hops
    from networkit_spark.streaming.graph_events import (
        update_apsp_incremental,
        update_harmonic_incremental,
    )

    rows = _er_rows(17, 10, 12)
    have = {(a, b) for a, b, _ in rows}
    extra = [e for e in [(1, 8, 1.0)] if (e[0], e[1]) not in have]
    g0 = from_edge_rows(spark, rows, num_nodes=10, weighted=True)
    g1 = from_edge_rows(spark, rows + extra, num_nodes=10, weighted=True)
    apsp0 = multi_source_hops(g0)
    add = spark.createDataFrame(extra, "src long, dst long, weight double")
    apsp1 = update_apsp_incremental(g1, apsp0, add)
    from pyspark.sql import functions as F

    old_scores = (
        apsp0.filter(F.col("dist") > 0)
        .groupBy(F.col("s").alias("id"))
        .agg(F.sum(1.0 / F.col("dist")).alias("score"))
    )
    got = {r["id"]: r["score"]
           for r in update_harmonic_incremental(
               apsp0.withColumnRenamed("id", "t"),
               apsp1,
               old_scores,
           ).collect()}
    fresh = multi_source_hops(g1)
    want = {r["id"]: r["score"]
            for r in fresh.filter(F.col("dist") > 0)
            .groupBy(F.col("s").alias("id"))
            .agg(F.sum(1.0 / F.col("dist")).alias("score"))
            .collect()}
    for i in want:
        assert abs(got.get(i, 0.0) - want[i]) < 1e-9, i


def test_affected_nodes_exact_set(spark):
    from networkit_spark.streaming.graph_events import affected_nodes

    # path 0-1-2-3-4; adding (0,4) affects everyone except the middle (2):
    # for q=2, d(2,0)=2 and d(2,4)=2 -> neither side shortcuts (2+1 > 2)
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=5, weighted=True)
    add = spark.createDataFrame([(0, 4, 1.0)], "src long, dst long, weight double")
    got = sorted(r["id"] for r in affected_nodes(g, add).collect())
    assert got == [0, 1, 3, 4]


def test_incremental_weakly_cc_on_directed_events(spark):
    """DynWeaklyConnectedComponents role (components/
    DynWeaklyConnectedComponents.cpp): weakly-CC maintenance on a DIRECTED
    graph under edge additions — update_components_incremental symmetrizes
    internally, so the directed case is the same superstep with the event
    endpoints as the frontier.  Checked against a from-scratch recompute."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.components import connected_components
    from networkit_spark.streaming.graph_events import (
        apply_events,
        update_components_incremental,
    )

    # directed: 0->1, 2->3, 4->5 (three weak components)
    g = from_edge_rows(spark, [(0, 1), (2, 3), (4, 5)], directed=True)
    labels0 = connected_components(g).select("id", "label")
    ev = spark.createDataFrame(
        [("EDGE_ADD", 3, 0, 1.0)], EVENT_SCHEMA
    )
    g2 = apply_events(g, ev)
    assert g2.directed
    added = ev.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    got = {
        r["id"]: r["label"]
        for r in update_components_incremental(g2, labels0, added).collect()
    }
    fresh = {
        r["id"]: r["label"] for r in connected_components(g2).collect()
    }
    assert got == fresh
    # 0,1,2,3 merged weakly; 4,5 untouched
    assert len({got[i] for i in (0, 1, 2, 3)}) == 1
    assert got[4] == got[5] != got[0]


def test_affected_nodes_large_event_batch(spark):
    """A 10^3-edge EVENT batch must stay distributed end-to-end (the
    endpoint set is passed as a DataFrame, never a driver-side Python
    list) and still match a BFS referee on the affectedness criterion."""
    import random
    from collections import deque

    from networkit_spark.streaming.graph_events import affected_nodes

    rng = random.Random(99)
    n = 120
    base = set()
    while len(base) < 240:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            base.add((min(u, v), max(u, v)))
    adds = set()
    while len(adds) < 1000:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v and (min(u, v), max(u, v)) not in base:
            adds.add((min(u, v), max(u, v)))
    g = from_edge_rows(spark, [(u, v, 1.0) for u, v in sorted(base)],
                       num_nodes=n, weighted=True)
    add = spark.createDataFrame(
        [(u, v, 1.0) for u, v in sorted(adds)],
        "src long, dst long, weight double",
    )
    got = sorted(r["id"] for r in affected_nodes(g, add).collect())

    adj = {i: [] for i in range(n)}
    for u, v in base:
        adj[u].append(v)
        adj[v].append(u)

    def hops(src):
        d = {src: 0}
        dq = deque([src])
        while dq:
            x = dq.popleft()
            for y in adj[x]:
                if y not in d:
                    d[y] = d[x] + 1
                    dq.append(y)
        return d

    dist = {e: hops(e) for e in {x for uv in adds for x in uv}}
    BIG = 2 ** 62
    want = sorted(
        q for q in range(n)
        if any(
            dist[u].get(q, BIG) + 1 <= dist[v].get(q, BIG)
            or dist[v].get(q, BIG) + 1 <= dist[u].get(q, BIG)
            for u, v in adds
        )
    )
    assert got == want


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    """First-seen content election must survive micro-batch boundaries: a
    LOWER doc_id arriving in a later batch is still flagged as a duplicate
    of the first batch's representative."""
    import time

    from networkit_spark.streaming.transcripts_stream import dedup_stream

    src = os.path.join(str(tmp_path), "docs_in")
    schema = "doc_id long, text string"
    batch1 = [(11, "same text"), (10, "same text"), (12, "other text")]
    batch2 = [(1, "same text"), (2, "third text")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # order the file mtimes so batch1 is the first trigger
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("select * from dedup_out").collect()}
    assert set(rows) == {1, 2, 10, 11, 12}
    # batch-1 election: min id IN THE FIRST BATCH (10), not the global min
    assert rows[10]["is_dup"] is False and rows[10]["rep_id"] == 10
    assert rows[11]["is_dup"] is True and rows[11]["rep_id"] == 10
    # cross-batch: id 1 carries the same text but arrives after -> duplicate
    assert rows[1]["is_dup"] is True and rows[1]["rep_id"] == 10
    # singletons are their own representatives
    assert rows[12]["is_dup"] is False and rows[12]["rep_id"] == 12
    assert rows[2]["is_dup"] is False and rows[2]["rep_id"] == 2
    # exactly one representative per content hash
    import collections

    per_hash = collections.Counter(
        r["text_hash"] for r in rows.values() if not r["is_dup"]
    )
    assert all(v == 1 for v in per_hash.values())


def test_update_approx_betweenness_incremental_matches_recompute(spark):
    """DynApproxBetweenness (centrality/DynApproxBetweenness.cpp:119-178):
    after an EDGE_ADD batch, replaying only the affected md5-pinned walks
    equals the full RK recompute on the new graph — exactly."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.betweenness import approx_betweenness_rk
    from networkit_spark.streaming.graph_events import (
        apply_events,
        update_approx_betweenness_incremental,
    )

    # path 0-1-2-3-4-5 plus a tail; the added chord 0-4 reroutes walks
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    g = from_edge_rows(spark, rows, weighted=False)
    old = approx_betweenness_rk(g, num_samples=24, max_depth=8)
    events = spark.createDataFrame(
        [("EDGE_ADD", 0, 4, 1.0)], "etype string, u long, v long, w float"
    )
    g2 = apply_events(g, events)
    added = spark.createDataFrame([(0, 4), (4, 0)], "src long, dst long")
    got = {
        r["id"]: r["score"]
        for r in update_approx_betweenness_incremental(
            g, g2, old, added, num_samples=24, max_depth=8
        ).collect()
    }
    want = {
        r["id"]: r["score"]
        for r in approx_betweenness_rk(g2, num_samples=24, max_depth=8).collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])


def test_update_approx_betweenness_no_affected_early_return(spark):
    """Re-adding an existing edge changes no distances or path counts —
    the affected set is empty and the old scores come back untouched."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.betweenness import approx_betweenness_rk
    from networkit_spark.streaming.graph_events import (
        update_approx_betweenness_incremental,
    )

    rows = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = from_edge_rows(spark, rows, weighted=False)
    old = approx_betweenness_rk(g, num_samples=16, max_depth=6)
    added = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = update_approx_betweenness_incremental(
        g, g, old, added, num_samples=16, max_depth=6
    )
    a = {(r["id"], r["score"]) for r in old.collect()}
    b = {(r["id"], r["score"]) for r in got.collect()}
    assert a == b


def test_banded_minhash_per_row_matches_batch(spark):
    """The stream-legal per-row banded signature must equal the batch
    formulation (shingle explode + min-aggregate) doc for doc — same
    hashes, same band digests, same no-shingle drop contract."""
    from networkit_spark.functions.dedup import minhash_bands, shingles
    from networkit_spark.streaming.transcripts_stream import banded_minhash_per_row

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
            (4, "too short"),          # < n tokens: no shingles, no buckets
            (5, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        ],
        "doc_id long, text string",
    )
    batch = {
        (r["id"], r["band"]): r["bucket"]
        for r in minhash_bands(shingles(docs), num_hashes=8, bands=4).collect()
    }
    perrow = {
        (r["doc_id"], r["band"]): r["bucket"]
        for r in banded_minhash_per_row(docs, num_hashes=8, bands=4).collect()
    }
    assert perrow == batch
    assert not any(k[0] == 4 for k in perrow)
    # identical docs share every band bucket
    assert all(perrow[(1, b)] == perrow[(5, b)] for b in range(4))


def test_streaming_near_dup_candidates_across_batches(spark, tmp_path):
    """Bucket anchors survive micro-batch boundaries: a near-duplicate
    arriving in a later batch is flagged against the FIRST batch's anchor,
    and unrelated content shares no bucket."""
    import time

    from networkit_spark.streaming.transcripts_stream import near_dup_stream

    src = os.path.join(str(tmp_path), "neardup_in")
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again"
    batch1 = [(20, base), (30, "completely different words entirely here now")]
    batch2 = [(7, base)]  # lower id, later arrival -> still the candidate
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        near_dup_stream(stream, num_hashes=8, bands=4)
        .writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from neardup_out").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc occupies exactly `bands` buckets
    assert {d: len(v) for d, v in by_doc.items()} == {20: 4, 30: 4, 7: 4}
    # batch-1 docs anchor their own buckets; disjoint texts never collide
    assert all(not r["is_candidate"] and r["rep_id"] == r["doc_id"]
               for r in by_doc[20] + by_doc[30])
    # identical text arriving later is a candidate of the original anchor
    # in EVERY band despite its lower id
    assert all(r["is_candidate"] and r["rep_id"] == 20 for r in by_doc[7])


def test_streaming_dedup_ttl_evicts_idle_state(spark, tmp_path):
    """ttl_ms (VERDICT r4 task 6): with a processing-time TTL, an idle
    content-hash's state row is evicted, so the same text re-arriving
    after the horizon elects a FRESH representative (is_dup=False) instead
    of pointing at the long-gone one — the bounded-state production mode.
    ttl_ms=1 makes the timeout due by the next micro-batch regardless of
    host speed; batch 2's unrelated doc forces a batch so the timeout
    fires before batch 3 re-delivers the text."""
    import time

    from networkit_spark.streaming.transcripts_stream import dedup_stream

    src = os.path.join(str(tmp_path), "docs_ttl_in")
    schema = "doc_id long, text string"
    for batch in ([(10, "same text")], [(20, "unrelated")], [(30, "same text")]):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # order file mtimes -> one file per trigger

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_stream(stream, ttl_ms=1)
        .writeStream.format("memory")
        .queryName("dedup_ttl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.sql("select * from dedup_ttl_out").collect()}
    assert set(rows) == {10, 20, 30}
    assert rows[10]["is_dup"] is False and rows[10]["rep_id"] == 10
    # state for "same text" idled past the TTL and was evicted -> doc 30 is
    # NOT a duplicate of 10; it anchors a fresh representative row
    assert rows[30]["is_dup"] is False and rows[30]["rep_id"] == 30


def test_streaming_ttl_rejects_nonpositive():
    from networkit_spark.streaming.transcripts_stream import _state_timeout

    import pytest

    with pytest.raises(ValueError, match="ttl_ms"):
        _state_timeout(0)
    from pyspark.sql.streaming.state import GroupStateTimeout

    assert _state_timeout(None) == GroupStateTimeout.NoTimeout
    assert _state_timeout(500) == GroupStateTimeout.ProcessingTimeTimeout


def test_streaming_neardup_ttl_evicts_idle_buckets(spark, tmp_path):
    """near_dup_stream ttl_ms: an idle LSH bucket's anchor is evicted, so
    the same content re-arriving after the horizon anchors a fresh bucket
    (is_candidate=False) instead of pairing with the long-gone anchor."""
    import time

    from networkit_spark.streaming.transcripts_stream import near_dup_stream

    src = os.path.join(str(tmp_path), "nd_ttl_in")
    schema = "doc_id long, text string"
    text = "the quick brown fox jumps over the lazy dog again and again"
    for batch in ([(10, text)], [(20, "entirely different words here ok")],
                  [(30, text)]):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        near_dup_stream(stream, ttl_ms=1)
        .writeStream.format("memory")
        .queryName("nd_ttl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from nd_ttl_out").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 30 re-anchors every one of its buckets: no candidate pair survives
    assert all(not r["is_candidate"] and r["rep_id"] == 30 for r in by_doc[30])
    assert all(not r["is_candidate"] and r["rep_id"] == 10 for r in by_doc[10])


def test_streaming_transitions_ttl_no_phantom_edge(spark, tmp_path):
    """tool_transitions_stream ttl_ms: a conversation idle past the TTL is
    evicted; its next turn starts a fresh chain instead of emitting a
    phantom transition from the pre-eviction tool."""
    import time

    from networkit_spark.streaming.transcripts_stream import (
        tool_transitions_stream,
    )

    src = os.path.join(str(tmp_path), "tt_ttl_in")
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    batches = (
        [("c1", 0, "assistant", "x", "grep", t0)],
        [("c2", 0, "assistant", "x", "ls", t0)],  # forces a batch; c1 idles out
        [("c1", 1, "assistant", "x", "edit", t0)],
    )
    for batch in batches:
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        tool_transitions_stream(stream.select("conv_id", "turn_idx", "tool", "ts"), ttl_ms=1)
        .writeStream.format("memory")
        .queryName("tt_ttl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tt_ttl_out").collect()
    # with NoTimeout this stream emits grep<->edit; with the TTL, c1's state
    # evicted between batch 1 and batch 3 -> no transition rows at all
    assert rows == []
