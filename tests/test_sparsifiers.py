"""Composed backbone sparsifiers (sparsification/Sparsifiers.cpp) and the
one-pass target-ratio selection (sparsification.pyx:696-786 role)."""

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.sparsifiers import (
    local_similarity_sparsifier,
    multiscale_sparsifier,
    random_sparsifier,
    simmelian_multiscale_sparsifier,
    simmelian_sparsifier_non_parametric,
    simmelian_sparsifier_parametric,
    sparsify_to_ratio,
)


def _canon_edges(g):
    return {
        (r["src"], r["dst"])
        for r in g.edges.filter(F.col("src") < F.col("dst")).collect()
    }


def _rand_graph(spark, seed, n=12, m=30):
    rng = np.random.RandomState(seed)
    es = {}
    while len(es) < m:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es[(min(a, b), max(a, b))] = float(rng.randint(1, 9))
    rows = [(u, v, w) for (u, v), w in sorted(es.items())]
    return from_edge_rows(spark, rows), rows


def _md5_long(s, n=12):
    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


def test_sparsify_to_ratio_exact_topk(spark):
    g, rows = _rand_graph(spark, 11)
    scores = spark.createDataFrame(
        [(u, v, w) for u, v, w in rows], "src long, dst long, score double"
    )
    m = len(rows)
    for ratio in (0.25, 0.5, 1.0):
        k = math.ceil(ratio * m)
        got = _canon_edges(sparsify_to_ratio(g, scores, ratio, seed=42))
        order = sorted(
            rows,
            key=lambda t: (
                -t[2],
                _md5_long(f"42:ratio:{t[0]}:{t[1]}"),
                t[0],
                t[1],
            ),
        )
        want = {(u, v) for u, v, _ in order[:k]}
        assert got == want, (ratio, got ^ want)


def test_sparsify_to_ratio_nested(spark):
    # a smaller ratio keeps a subset of a larger ratio's edges
    g, rows = _rand_graph(spark, 12)
    scores = spark.createDataFrame(rows, "src long, dst long, score double")
    small = _canon_edges(sparsify_to_ratio(g, scores, 0.2))
    big = _canon_edges(sparsify_to_ratio(g, scores, 0.7))
    assert small < big


def test_random_sparsifier_threshold_semantics(spark):
    g, rows = _rand_graph(spark, 13)
    all_edges = _canon_edges(g)
    # ratio 0 keeps everything (score >= 0 always); ratio 1 keeps nothing
    assert _canon_edges(random_sparsifier(g, 0.0)) == all_edges
    assert _canon_edges(random_sparsifier(g, 1.0)) == set()
    kept = _canon_edges(random_sparsifier(g, 0.4))
    # reference keeps score >= ratio, i.e. ~(1-ratio) of the edges
    assert set() < kept < all_edges
    # determinism
    assert kept == _canon_edges(random_sparsifier(g, 0.4))


def test_simmelian_nonparametric_bounds(spark):
    g, _rows = _rand_graph(spark, 14, n=10, m=28)
    all_edges = _canon_edges(g)
    assert _canon_edges(simmelian_sparsifier_non_parametric(g, 0.0)) == all_edges
    assert _canon_edges(simmelian_sparsifier_non_parametric(g, 1.1)) == set()
    mid = _canon_edges(simmelian_sparsifier_non_parametric(g, 0.5))
    assert mid <= all_edges


def test_simmelian_parametric_matches_score_filter(spark):
    from networkit_spark.operators.sparsification import simmelian_overlap_score

    g, _rows = _rand_graph(spark, 15, n=10, m=28)
    kept = _canon_edges(simmelian_sparsifier_parametric(g, max_rank=5, min_overlap=1))
    want = {
        (r["src"], r["dst"])
        for r in simmelian_overlap_score(g, max_rank=5).collect()
        if r["score"] >= 1.0
    }
    assert kept == want


def test_multiscale_sparsifiers_run_and_bound(spark):
    g, _rows = _rand_graph(spark, 16, n=10, m=26)
    all_edges = _canon_edges(g)
    # alpha 0 keeps everything (probability >= 0), alpha > 1 keeps nothing
    assert _canon_edges(multiscale_sparsifier(g, 0.0)) == all_edges
    assert _canon_edges(multiscale_sparsifier(g, 1.01)) == set()
    assert _canon_edges(simmelian_multiscale_sparsifier(g, 1.01)) == set()
    mid = _canon_edges(simmelian_multiscale_sparsifier(g, 0.3))
    assert mid <= all_edges


def test_local_similarity_sparsifier_matches_score_filter(spark):
    from networkit_spark.operators.sparsification import local_similarity_score

    g, _rows = _rand_graph(spark, 17, n=10, m=26)
    kept = _canon_edges(local_similarity_sparsifier(g, 0.6))
    want = {
        (r["src"], r["dst"])
        for r in local_similarity_score(g).collect()
        if r["score"] >= 0.6
    }
    assert kept == want
