"""Commute-time distance vs the numpy pseudo-inverse ground truth."""

import math

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.electrical import commute_time_distance
from networkit_spark.oracle import commute_time_oracle


def test_commute_time_path_graph_exact(spark):
    # path 0-1-2: effective resistance(0,2)=2, vol=4 -> ctd = sqrt(2*4)
    g = from_edge_rows(spark, [(0, 1), (1, 2)], num_nodes=3)
    got = commute_time_distance(g, [(0, 2), (0, 1)], num_iters=40, omega=0.5)
    vals = {(r["u"], r["v"]): r["ctd"] for r in got.collect()}
    assert abs(vals[(0, 2)] - math.sqrt(8.0)) < 1e-3
    assert abs(vals[(0, 1)] - math.sqrt(4.0)) < 1e-3


def test_commute_time_matches_pinv(spark):
    rows = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.0), (0, 2, 1.0),
        (3, 4, 2.0), (4, 5, 1.0), (5, 3, 1.0),
    ]
    pairs = [(0, 3), (1, 5), (2, 4)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    got = commute_time_distance(g, pairs, num_iters=80, omega=0.5)
    vals = {(r["u"], r["v"]): r["ctd"] for r in got.collect()}
    want = commute_time_oracle(6, [(u, v, w) for u, v, w in rows], pairs)
    for (p, expect) in zip(pairs, want):
        assert abs(vals[p] - expect) < 1e-4, (p, vals[p], expect)


def test_approx_electrical_closeness_tracks_pinv(spark):
    from networkit_spark.operators.electrical import approx_electrical_closeness

    rng = np.random.RandomState(8)
    n = 10
    es = set()
    while len(es) < 16:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es.add((min(a, b), max(a, b)))
    # ensure connected: chain backbone
    for i in range(n - 1):
        es.add((i, i + 1))
    rows = [(a, b, 1.0) for a, b in sorted(es)]
    g = from_edge_rows(spark, rows, num_nodes=n, weighted=True)
    got = {r["id"]: r["score"]
           for r in approx_electrical_closeness(
               g, num_systems=48, num_iters=60, omega=0.5).collect()}
    # exact referee: farness(v) = n*L+_vv + tr(L+)  (zero row sums)
    L = np.zeros((n, n))
    for a, b in es:
        L[a, a] += 1; L[b, b] += 1; L[a, b] -= 1; L[b, a] -= 1
    Lp = np.linalg.pinv(L)
    exact = {v: (n - 1) / (n * Lp[v, v] + np.trace(Lp)) for v in range(n)}
    # JL with k=48 sketches: relative error within ~45%
    for v in range(n):
        assert abs(got[v] - exact[v]) / exact[v] < 0.45, (v, got[v], exact[v])
    # deterministic up to float aggregation order (gate rounds to 1e-6)
    got2 = {r["id"]: r["score"]
            for r in approx_electrical_closeness(
                g, num_systems=48, num_iters=60, omega=0.5).collect()}
    assert all(abs(got[v] - got2[v]) < 1e-9 for v in got)
