"""mint_dense_ids determinism at scale (regression: the range-partitioner
sampling depended on shuffle fetch order, so two branches of the same plan
could mint DIFFERENT ids for the same key at ~1M keys — corrupting the
graph silently)."""

from pyspark.sql import functions as F

from networkit_spark.edges import mint_dense_ids


def _keys(spark, n):
    # adversarial mix: heavy shared prefixes + skew, like real entity keys
    return spark.range(n).select(
        F.concat(
            F.lit("conv:"),
            F.format_string("%09d", F.pmod(F.xxhash64("id"), F.lit(n)).cast("int")),
        ).alias("key")
    )


def test_ids_dense_unique_lexicographic(spark):
    keys = _keys(spark, 30_000)
    ids = mint_dense_ids(keys)
    n = keys.distinct().count()
    assert ids.count() == n
    row = ids.agg(
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.count_distinct("id").alias("u"),
    ).first()
    assert (row["lo"], row["hi"], row["u"]) == (0, n - 1, n)
    # id order == key order
    bad = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.key") < F.col("b.key"))
        .filter(F.col("a.id") >= F.col("b.id"))
    )
    # pairwise check is O(n^2) — do it on a deterministic 200-key slice
    sub = ids.filter(F.pmod(F.xxhash64("key"), F.lit(150)) == 0)
    bad = (
        sub.alias("a")
        .join(sub.alias("b"), F.col("a.key") < F.col("b.key"))
        .filter(F.col("a.id") >= F.col("b.id"))
    )
    assert bad.count() == 0


def test_two_plan_branches_mint_identical_ids(spark):
    """The corruption mode: the same dictionary DF consumed twice in one
    plan (src join + dst join) must resolve each key to ONE id even though
    each branch recomputes independently."""
    keys = _keys(spark, 400_000)
    ids = mint_dense_ids(keys)
    a = ids.withColumnRenamed("id", "id_a")
    b = ids.withColumnRenamed("id", "id_b")
    mismatch = a.join(b, "key").filter(F.col("id_a") != F.col("id_b"))
    assert mismatch.count() == 0
    # and the id space stays dense under recomputation
    n = keys.distinct().count()
    row = ids.agg(F.max("id").alias("hi"), F.count_distinct("id").alias("u")).first()
    assert row["hi"] == n - 1 and row["u"] == n


def test_derived_graph_integrity_at_scale(spark):
    """derive_edges on a ~200k-entity transcript table: every edge endpoint
    resolves to a vertex, no vertex exceeds the dense range, no orphans."""
    from networkit_spark.edges import derive_edges
    from networkit_spark.transcripts import synth_transcripts

    t = synth_transcripts(spark, n_convs=150_000, n_tools=64, seed=42)
    vertices, edges = derive_edges(t)
    n = vertices.count()
    assert vertices.agg(F.max("id")).first()[0] == n - 1
    assert vertices.select("id").distinct().count() == n
    orphan_src = edges.join(vertices.select("id").withColumnRenamed("id", "src"), "src", "anti")
    assert orphan_src.count() == 0
    # symmetric table: every vertex has at least one out-edge
    deg0 = vertices.select("id").join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "anti"
    )
    assert deg0.count() == 0
