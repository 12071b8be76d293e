"""Centrality family (operators.centrality) vs numpy oracles on small
fixtures — the layer-1 golden-value pattern of the reference
(centrality/test/CentralityGTest.cpp)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.centrality import (
    bfs_hops,
    core_decomposition,
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
    sssp_weighted,
)

EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]


def _adj(n, edges, weights=None):
    A = np.zeros((n, n))
    for i, (u, v) in enumerate(edges):
        w = weights[i] if weights else 1.0
        A[u, v] += w
        A[v, u] += w
    return A


def test_degree_centrality(spark):
    g = from_edge_rows(spark, EDGES)
    got = {r["id"]: r["score"] for r in degree_centrality(g).collect()}
    assert got == {0: 2.0, 1: 2.0, 2: 3.0, 3: 2.0, 4: 3.0, 5: 2.0, 6: 2.0}
    norm = {r["id"]: r["score"] for r in degree_centrality(g, normalized=True).collect()}
    assert norm[2] == pytest.approx(3.0 / 6.0)


def test_eigenvector_vs_numpy(spark):
    g = from_edge_rows(spark, EDGES)
    got = {r["id"]: r["score"] for r in eigenvector_centrality(g, tol=1e-12).collect()}
    A = _adj(7, EDGES)
    w, V = np.linalg.eigh(A)
    lead = np.abs(V[:, np.argmax(w)])
    lead = lead / np.linalg.norm(lead)
    for i in range(7):
        assert got[i] == pytest.approx(lead[i], abs=1e-6)


def test_katz_vs_numpy(spark):
    g = from_edge_rows(spark, EDGES)
    alpha, beta = 0.1, 0.1
    got = {r["id"]: r["score"] for r in katz_centrality(g, alpha=alpha, beta=beta, tol=1e-14).collect()}
    A = _adj(7, EDGES)
    x = np.linalg.solve(np.eye(7) - alpha * A, beta * np.ones(7) - beta * np.linalg.solve(np.eye(7), np.zeros(7)))
    # closed form: x = (I - alpha*A)^-1 * beta*1 ... minus the beta applied to x0=0 start:
    # fixed point of x = alpha*A*x + beta*1
    x = np.linalg.solve(np.eye(7) - alpha * A, beta * np.ones(7))
    x = x / np.linalg.norm(x)
    for i in range(7):
        assert got[i] == pytest.approx(x[i], abs=1e-6)


def test_core_decomposition(spark):
    # two triangles bridged via node 3 (deg 2): min degree over the whole
    # graph is 2, so every node is 2-core
    g = from_edge_rows(spark, EDGES)
    got = {r["id"]: r["core"] for r in core_decomposition(g).collect()}
    assert got == {i: 2 for i in range(7)}
    # pendant chain hanging off a triangle: chain peels at 1, triangle at 2
    g2 = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    got2 = {r["id"]: r["core"] for r in core_decomposition(g2).collect()}
    assert got2 == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_core_star(spark):
    g = from_edge_rows(spark, [(0, i) for i in range(1, 6)])
    got = {r["id"]: r["core"] for r in core_decomposition(g).collect()}
    assert got == {i: 1 for i in range(6)}


def test_bfs_hops(spark):
    g = from_edge_rows(spark, EDGES, num_nodes=8)  # node 7 isolated
    got = {r["id"]: r["dist"] for r in bfs_hops(g, source=0).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4}
    assert 7 not in got  # unreachable -> absent


def test_reverse_bfs_hops(spark):
    from networkit_spark.operators.centrality import reverse_bfs_hops

    # directed chain 0->1->2 plus 3->2: reverse BFS from 2 walks IN-edges
    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 2)], directed=True)
    got = {r["id"]: r["dist"] for r in reverse_bfs_hops(g, source=2).collect()}
    assert got == {2: 0, 1: 1, 3: 1, 0: 2}
    # undirected: identical to forward BFS (ReverseBFS.cpp degenerates too)
    gu = from_edge_rows(spark, [(0, 1), (1, 2)])
    fwd = {r["id"]: r["dist"] for r in bfs_hops(gu, source=2).collect()}
    rev = {r["id"]: r["dist"] for r in reverse_bfs_hops(gu, source=2).collect()}
    assert fwd == rev


def test_sssp_weighted(spark):
    g = from_edge_rows(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0)]
    )
    got = {r["id"]: r["dist"] for r in sssp_weighted(g, source=0).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_ranking_order(spark):
    from networkit_spark.operators.pagerank import ranking

    g = from_edge_rows(spark, EDGES)
    top = ranking(degree_centrality(g), k=3).collect()
    # (score desc, id asc): 2 and 4 tie at 3.0 -> 2 first
    assert [r["id"] for r in top] == [2, 4, 0]
