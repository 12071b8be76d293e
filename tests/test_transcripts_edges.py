"""Input layer: synthetic transcripts + edge derivation (FIXTURES.md §1)."""

from pyspark.sql import functions as F

from networkit_spark.edges import derive_edges, mint_dense_ids, transcript_edge_keys
from networkit_spark.graph import Graph
from networkit_spark.transcripts import synth_transcripts


def test_schema_and_invariants(spark):
    t = synth_transcripts(spark, n_convs=50)
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    rows = t.count()
    # (conv_id, turn_idx) unique and dense
    assert t.select("conv_id", "turn_idx").distinct().count() == rows
    dense = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"), (F.max("turn_idx") + 1).alias("m")
    )
    assert dense.filter(F.col("n") != F.col("m")).count() == 0
    # ts strictly monotone per conv
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = t.withColumn("prev", F.lag("ts").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev"))
    )
    assert bad.count() == 0


def test_determinism_across_partitioning(spark):
    a = synth_transcripts(spark, n_convs=30).orderBy("conv_id", "turn_idx").collect()
    b = (
        synth_transcripts(spark, n_convs=30)
        .repartition(13)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert a == b


def test_per_turn_text_preserved_through_pipeline(spark):
    # the per-row invariant vs the reference: deriving edges must not
    # perturb the transcript rows (BASELINE input_hint)
    t = synth_transcripts(spark, n_convs=20).persist()
    before = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    derive_edges(t)[1].count()  # run the pipeline
    after = t.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert before == after
    t.unpersist()


def test_edge_derivation_matches_python_reimplementation(spark):
    t = synth_transcripts(spark, n_convs=25)
    rows = t.orderBy("conv_id", "turn_idx").collect()

    # independent single-threaded rederivation of FIXTURES.md §1 semantics
    from collections import Counter, defaultdict

    pairs = Counter()
    last_tool = {}
    for r in rows:
        conv = f"conv:{r['conv_id']}"
        pairs[tuple(sorted((conv, f"role:{r['role']}")))] += 1
        if r["tool"] is not None:
            tk = f"tool:{r['tool']}"
            pairs[tuple(sorted((conv, tk)))] += 1
            if r["conv_id"] in last_tool:
                pairs[tuple(sorted((last_tool[r["conv_id"]], tk)))] += 1
            last_tool[r["conv_id"]] = tk

    got = {
        (r["src_key"], r["dst_key"]): r["weight"]
        for r in transcript_edge_keys(t).collect()
    }
    assert got == {k: float(v) for k, v in pairs.items()}


def test_dense_ids_lexicographic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], "key string")
    ids = {r["key"]: r["id"] for r in mint_dense_ids(df).collect()}
    assert ids == {"a": 0, "b": 1, "c": 2}


def test_graph_is_symmetric_and_consistent(spark):
    t = synth_transcripts(spark, n_convs=40)
    vertices, edges = derive_edges(t)
    g = Graph(vertices, edges)
    g.check_consistency()
    # dense ids 0..n-1
    n = g.num_nodes()
    assert vertices.agg(F.min("id"), F.max("id")).first() == (0, n - 1)
