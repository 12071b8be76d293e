"""SGNS trainer (operators/sgns.py — embedding/LearnEmbedding.cpp role):
pair generation, grid invariants, parallelism determinism, and that the
objective actually trains (linked nodes drift together in cosine space)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.node2vec import biased_random_walks
from networkit_spark.operators.sgns import skipgram_pairs, train_sgns

TWO_RINGS = [
    (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0),
    (4, 5, 1.0), (5, 6, 1.0), (6, 7, 1.0), (7, 4, 1.0),
    (0, 4, 1.0),
]


def _walks(spark, walks_per_node=4, seed=7):
    g = from_edge_rows(spark, TWO_RINGS, weighted=True)
    return g, biased_random_walks(
        g, walk_length=5, walks_per_node=walks_per_node, seed=seed
    )


def test_skipgram_pairs_window(spark):
    walks = spark.createDataFrame(
        [(0, s, 10 + s) for s in range(4)], "walk_id long, step int, node long"
    )
    got = {
        (r["cs"], r["os"]) for r in skipgram_pairs(walks, window=2).collect()
    }
    want = {
        (a, b) for a in range(4) for b in range(4)
        if a != b and abs(a - b) <= 2
    }
    assert got == want


def test_sgns_grid_and_determinism(spark):
    g, w = _walks(spark)
    emb = train_sgns(w, g.vertices, dim=8, window=2, negatives=2,
                     lr=4.0, epochs=3, seed=7)
    rows = {r["id"]: list(r["emb"]) for r in emb.collect()}
    assert set(rows) == set(range(8))
    # the bit-exact protocol keeps every weight an exact multiple of 2^-30
    for vec in rows.values():
        for x in vec:
            assert x * (1 << 30) == int(x * (1 << 30))
    # identical at different parallelism (the whole point of synchronous
    # full-batch + grid-exact sums)
    emb2 = train_sgns(
        w.repartition(3), g.vertices.repartition(2), dim=8, window=2,
        negatives=2, lr=4.0, epochs=3, seed=7,
    )
    rows2 = {r["id"]: list(r["emb"]) for r in emb2.collect()}
    assert rows == rows2


def test_sgns_linked_nodes_drift_together(spark):
    g, w = _walks(spark, walks_per_node=8)

    def gap(epochs):
        emb = train_sgns(w, g.vertices, dim=8, window=2, negatives=2,
                         lr=8.0, epochs=epochs, seed=7)
        rows = {r["id"]: r["emb"] for r in emb.collect()}

        def cos(a, b):
            da = sum(x * x for x in a) ** 0.5
            db = sum(x * x for x in b) ** 0.5
            return sum(x * y for x, y in zip(a, b)) / (da * db) if da * db else 0.0

        linked = [(u, v) for u, v, _ in TWO_RINGS]
        unlinked = [(0, 6), (1, 5), (2, 7), (3, 4), (1, 7), (2, 4)]
        lm = sum(cos(rows[a], rows[b]) for a, b in linked) / len(linked)
        um = sum(cos(rows[a], rows[b]) for a, b in unlinked) / len(unlinked)
        return lm - um

    g0, g12 = gap(0), gap(12)
    assert g12 > g0 + 0.3, (g0, g12)


def test_sgns_untrained_vertices_keep_init(spark):
    # an isolated vertex never appears in a walk pair: its vector must be
    # exactly the (deterministic) init vector at any epoch count
    g = from_edge_rows(spark, [(0, 1, 1.0)], num_nodes=3, weighted=True)
    w = biased_random_walks(g, walk_length=3, walks_per_node=2, seed=5)
    e0 = train_sgns(w, g.vertices, dim=4, epochs=0, seed=5)
    e3 = train_sgns(w, g.vertices, dim=4, epochs=3, seed=5)
    init = {r["id"]: list(r["emb"]) for r in e0.collect()}
    out = {r["id"]: list(r["emb"]) for r in e3.collect()}
    assert out[2] == init[2]
    assert out[0] != init[0]


def test_unigram_table_apportionment(spark):
    """unigram_table: T = 8x vocab slots, contiguous 0..T-1, and every
    node's slot count within 1 of its exact cnt^0.75 share (integer
    largest-remainder apportionment)."""
    from networkit_spark.operators.sgns import unigram_table

    rows = []
    counts = {1: 16, 2: 81, 3: 1, 4: 256}  # distinct ^0.75 masses
    wid = 0
    for node, c in counts.items():
        for k in range(c):
            rows.append((wid, 0, node))
            wid += 1
    walks = spark.createDataFrame(rows, "walk_id long, step int, node long")
    table, T = unigram_table(walks)
    tb = table.toPandas()
    assert T == 8 * len(counts)
    assert len(tb) == T
    assert sorted(tb["slot"]) == list(range(T))
    import math

    weights = {n: math.sqrt(math.sqrt(c**3)) for n, c in counts.items()}
    tot = sum(weights.values())
    got = tb.groupby("node").size().to_dict()
    for n, w in weights.items():
        exact = T * w / tot
        assert abs(got.get(n, 0) - exact) < 1.0, (n, got.get(n), exact)


def test_unigram_negative_draws_follow_power_law(spark):
    """md5 % T over the table reproduces the quantized unigram^0.75
    distribution: the heavy node's draw share matches its slot share."""
    from pyspark.sql import functions as F

    from networkit_spark.operators.sgns import unigram_table

    rows = []
    wid = 0
    for node, c in {7: 200, 8: 10, 9: 10}.items():
        for _ in range(c):
            rows.append((wid, 0, node))
            wid += 1
    walks = spark.createDataFrame(rows, "walk_id long, step int, node long")
    table, T = unigram_table(walks)
    share = {
        r["node"]: r["c"] / T
        for r in table.groupBy("node").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    draws = (
        spark.range(20000)
        .withColumn("slot", F.pmod(F.xxhash64("id"), F.lit(T)))
        .join(table, "slot")
    )
    n_draws = draws.count()
    got = {
        r["node"]: r["c"] / n_draws
        for r in draws.groupBy("node").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for node in share:
        assert abs(got[node] - share[node]) < 0.02, (node, got[node], share[node])
    # 200^0.75 / (200^0.75 + 2*10^0.75) ~ 0.825 -> heavy node dominates but
    # far below its raw-count share (0.91): the 0.75 power flattens
    assert 0.78 < share[7] < 0.87


def test_unigram_table_overflow_guard(spark):
    from networkit_spark.operators.sgns import unigram_table

    walks = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2)], "walk_id long, step int, node long"
    )
    import pytest

    with pytest.raises(ValueError, match="overflows int64"):
        unigram_table(walks, table_size=2**62)
