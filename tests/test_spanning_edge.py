"""Spanning-edge centrality: the engine's hash-derandomized JL sketch +
damped-Jacobi solve vs an exact numpy replica of the SAME iteration
(signs, rhs, superstep count — bit-for-bit semantics, 1e-9 tolerance),
plus estimator-quality checks (Foster's theorem, tracking of exact
effective resistance) on the converged numpy replica.
"""

import hashlib

import numpy as np
import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.electrical import spanning_edge_scores


def _sign(seed, j, u, v, k):
    h = int(
        hashlib.md5(f"{seed}:sec:{j}:{u}:{v}".encode()).hexdigest()[:12], 16
    )
    return (1.0 if h % 2 == 0 else -1.0) / k ** 0.5


def _numpy_replica(edges, n, k, seed, num_iters, omega):
    """Exact replica of spanning_edge_scores: same signs, same damped
    Jacobi x' = (1-w)x + w (b + A x) / d, same superstep count."""
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] += 1
        A[v, u] += 1
    d = A.sum(axis=1)
    has = d > 0
    B = np.zeros((n, k))
    for j in range(k):
        for u, v in edges:
            r = _sign(seed, j, u, v, k)
            B[u, j] += r
            B[v, j] -= r
    X = np.zeros((n, k))
    for _ in range(num_iters):
        Xn = X.copy()
        Xn[has] = (1 - omega) * X[has] + omega * (
            (B[has] + (A @ X)[has]) / d[has, None]
        )
        X = Xn
    return {
        (u, v): float(((X[u] - X[v]) ** 2).sum()) for u, v in edges
    }


def _exact_resistance(edges, n):
    L = np.zeros((n, n))
    for u, v in edges:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    Lp = np.linalg.pinv(L)
    return {(u, v): Lp[u, u] + Lp[v, v] - 2 * Lp[u, v] for u, v in edges}


def _random_connected(n, extra, rng):
    # ring + random chords: well-connected so Jacobi converges quickly
    edges = {(i, (i + 1) % n) for i in range(n)}
    edges = {(min(u, v), max(u, v)) for u, v in edges}
    while len(edges) < n + extra:
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((int(min(u, v)), int(max(u, v))))
    return sorted(edges)


def test_spanning_edge_matches_numpy_replica(spark):
    rng = np.random.default_rng(3)
    n, k, seed = 24, 6, 42
    edges = _random_connected(n, 28, rng)
    g = from_edge_rows(spark, edges, num_nodes=n)
    got = {
        (r["src"], r["dst"]): r["sec"]
        for r in spanning_edge_scores(
            g, num_systems=k, num_iters=25, omega=0.5, seed=seed
        ).collect()
    }
    want = _numpy_replica(edges, n, k, seed, num_iters=25, omega=0.5)
    assert set(got) == set(want)
    for e, w in want.items():
        assert got[e] == pytest.approx(w, abs=1e-9), e


def test_spanning_edge_estimator_quality():
    """The converged sketch (numpy replica, many iters) should satisfy
    Foster's theorem (sum over edges = n - 1 for a connected unweighted
    graph) and track exact effective resistance."""
    rng = np.random.default_rng(11)
    n = 20
    edges = _random_connected(n, 24, rng)
    est = _numpy_replica(edges, n, k=64, seed=7, num_iters=400, omega=0.7)
    exact = _exact_resistance(edges, n)
    assert sum(est.values()) == pytest.approx(n - 1, rel=0.2)
    for e, r_exact in exact.items():
        assert est[e] == pytest.approx(r_exact, rel=0.8, abs=0.06), e
