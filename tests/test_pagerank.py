"""PageRank parity tests (FIXTURES.md §2.2, §2.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.pagerank import pagerank, ranking
from networkit_spark.oracle import pagerank_oracle

# 8-node weighted graph checked against Matlab in the reference
# (networkit/cpp/centrality/test/CentralityGTest.cpp:583-623)
GOLDEN_EDGES = [
    (0, 2, 3.0), (1, 2, 2.0), (2, 3, 3.0), (2, 4, 2.0), (2, 5, 1.5),
    (3, 5, 3.0), (4, 5, 2.0), (5, 6, 3.0), (5, 7, 2.0),
]
GOLDEN_SCORES = [0.0753, 0.0565, 0.2552, 0.1319, 0.0942, 0.2552, 0.0753, 0.0565]


def _scores_array(df, n):
    out = np.zeros(n)
    for r in df.collect():
        out[r["id"]] = r["score"]
    return out


def test_golden_8node(spark):
    g = from_edge_rows(spark, GOLDEN_EDGES)
    got = _scores_array(pagerank(g, damp=0.85, tol=1e-8), 8)
    assert np.allclose(got, GOLDEN_SCORES, atol=1e-4)
    assert abs(got.sum() - 1.0) < 1e-9


def test_golden_vs_numpy_oracle_1e6(spark):
    g = from_edge_rows(spark, GOLDEN_EDGES)
    got = _scores_array(pagerank(g, tol=1e-6), 8)
    sym = GOLDEN_EDGES + [(v, u, w) for u, v, w in GOLDEN_EDGES]
    want = pagerank_oracle(8, sym, tol=1e-6)
    assert np.allclose(got, want, atol=1e-6)


def test_dangling_sink_directed(spark):
    # directed star 0->1, 2->1, 3->1: node 1 is a sink; reference does NOT
    # redistribute sink mass during iteration, normalizes at the end
    # (PageRank.cpp:54-78)
    edges = [(0, 1, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    g = from_edge_rows(spark, edges, directed=True)
    got = _scores_array(pagerank(g, tol=1e-10), 4)
    want = pagerank_oracle(4, edges, tol=1e-10)
    assert np.allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9
    assert got[1] > got[0] == got[2] == got[3]


def test_l1_norm_and_max_iterations(spark):
    g = from_edge_rows(spark, GOLDEN_EDGES)
    got = _scores_array(pagerank(g, norm="l1", max_iterations=5, tol=0.0), 8)
    sym = GOLDEN_EDGES + [(v, u, w) for u, v, w in GOLDEN_EDGES]
    want = pagerank_oracle(8, sym, norm="l1", max_iterations=5, tol=0.0)
    assert np.allclose(got, want, atol=1e-12)


def test_normalized_variant(spark):
    edges = [(0, 1, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    g = from_edge_rows(spark, edges, directed=True)
    got = _scores_array(pagerank(g, tol=1e-10, normalized=True), 4)
    want = pagerank_oracle(4, edges, tol=1e-10, normalized=True)
    assert np.allclose(got, want, atol=1e-9)


def test_self_loop_degree_semantics(spark):
    # self-loop weight counts twice toward weightedDegree on undirected
    # graphs (Graph.cpp:552-558)
    edges = [(0, 0, 2.0), (0, 1, 1.0), (1, 2, 1.0)]
    g = from_edge_rows(spark, edges)
    got = _scores_array(pagerank(g, tol=1e-10), 3)
    sym = edges + [(v, u, w) for u, v, w in edges if u != v]
    want = pagerank_oracle(3, sym, tol=1e-10)
    assert np.allclose(got, want, atol=1e-9)


def test_ranking_order(spark):
    g = from_edge_rows(spark, GOLDEN_EDGES)
    top = ranking(pagerank(g, tol=1e-8), k=3).collect()
    # scores 2 and 5 tie at 0.2552 -> id asc breaks the tie
    assert [r["id"] for r in top] == [2, 5, 3]


def test_isolated_vertices_get_teleport(spark):
    g = from_edge_rows(spark, [(0, 1, 1.0)], num_nodes=4)
    got = _scores_array(pagerank(g, tol=1e-12), 4)
    sym = [(0, 1, 1.0), (1, 0, 1.0)]
    want = pagerank_oracle(4, sym, tol=1e-12)
    assert np.allclose(got, want, atol=1e-10)
    assert got[2] == got[3] > 0


def test_hub_salted_fast_path_matches_oracle(spark):
    """Force the hub-salt plan (north-star skew handling) on a star-plus-ring
    fixture and assert exact agreement with the unsalted plan and the numpy
    oracle — salting must only change the physical layout, never the sums."""
    # hub 0 -> everyone (out-rows 40) plus a ring among 1..40
    edges = [(0, v, 1.0 + (v % 3)) for v in range(1, 41)]
    edges += [(v, 1 + (v % 40), 1.0) for v in range(1, 41)]
    g = from_edge_rows(spark, edges, directed=True)
    salted = _scores_array(
        pagerank(g, tol=0.0, max_iterations=12, hub_salt_threshold=5), 41
    )
    plain = _scores_array(pagerank(g, tol=0.0, max_iterations=12), 41)
    want = pagerank_oracle(41, edges, tol=0.0, max_iterations=12)
    assert np.allclose(salted, plain, atol=1e-12)
    assert np.allclose(salted, want, atol=1e-9)


def test_hub_salted_broadcast_branch_matches(spark):
    """Salted layout under broadcast_scores=True (the small-n branch)."""
    edges = [(0, v, 1.0) for v in range(1, 31)] + [(v, 0, 1.0) for v in range(1, 31)]
    g = from_edge_rows(spark, edges, directed=True)
    salted = _scores_array(
        pagerank(
            g, tol=0.0, max_iterations=8, hub_salt_threshold=4,
            broadcast_scores=True,
        ),
        31,
    )
    want = pagerank_oracle(31, edges, tol=0.0, max_iterations=8)
    assert np.allclose(salted, want, atol=1e-9)
