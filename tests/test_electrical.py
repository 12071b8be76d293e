"""Commute-time distance vs the numpy pseudo-inverse ground truth."""

import math

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
