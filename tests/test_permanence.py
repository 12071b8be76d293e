"""Permanence centrality vs the reference goldens and a numpy brute force.

Golden graph + partition transliterated from
centrality/test/CentralityGTest.cpp:1215-1275 (testSimplePermanence).
"""

import numpy as np
import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.permanence import permanence_centrality

GTEST_EDGES = [
    (0, 1), (1, 2), (2, 0), (2, 3),
    (4, 0), (4, 1), (4, 2),
    (5, 3), (5, 2), (5, 0),
    (6, 7), (7, 8),
    (5, 6), (5, 7), (5, 8),
    (4, 6), (4, 7),
    (9, 10), (10, 11),
    (5, 9), (4, 10), (4, 11),
    (12, 13), (13, 14), (12, 14),
    (4, 12), (4, 14),
]
GTEST_PART = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0,
              6: 1, 7: 1, 8: 1, 9: 2, 10: 2, 11: 2,
              12: 3, 13: 3, 14: 3}


def _labels_df(spark, part):
    return spark.createDataFrame(
        [(int(k), int(v)) for k, v in part.items()], "id long, label long"
    )


def _brute_permanence(edges, part):
    """Direct transliteration of PermanenceCentrality.cpp semantics over
    the simple undirected support."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for u, nbrs in adj.items():
        C = part[u]
        strength = {}
        for y in nbrs:
            strength[part[y]] = strength.get(part[y], 0) + 1
        emax = max((s for c, s in strength.items() if c != C), default=0) or 1
        internal = [y for y in nbrs if part[y] == C]
        k = len(internal)
        tri = sum(
            1
            for i, y in enumerate(internal)
            for z in internal[i + 1:]
            if z in adj[y]
        )
        cc = 0.0 if k < 2 else tri / (0.5 * k * (k - 1))
        out[u] = strength.get(C, 0) / emax / len(nbrs) - (1.0 - cc)
    return out


def test_permanence_gtest_goldens(spark):
    g = from_edge_rows(spark, GTEST_EDGES)
    labels = _labels_df(spark, GTEST_PART)
    got = {
        r["id"]: r["permanence"]
        for r in permanence_centrality(g, labels).collect()
    }
    # CentralityGTest.cpp:1273-1274
    assert got[5] == pytest.approx(-0.19048, abs=0.0005)
    assert got[4] == pytest.approx(0.167, abs=0.0005)


def test_permanence_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    n = 40
    edges = sorted(
        {
            (int(min(u, v)), int(max(u, v)))
            for u, v in rng.integers(0, n, size=(160, 2))
            if u != v
        }
    )
    part = {i: int(i % 5) for i in range(n)}
    g = from_edge_rows(spark, edges, num_nodes=n)
    labels = _labels_df(spark, part)
    got = {
        r["id"]: r["permanence"]
        for r in permanence_centrality(g, labels).collect()
    }
    want = _brute_permanence(edges, part)
    assert set(got) == set(want)
    for u, w in want.items():
        assert got[u] == pytest.approx(w, abs=1e-9), u


def test_local_partition_coverage(spark):
    from networkit_spark.operators.permanence import local_partition_coverage

    # triangle {0,1,2} in cluster A, pair {3,4} in B, bridge 2-3,
    # isolated 5, self-loop on 0
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (0, 0)]
    g = from_edge_rows(spark, edges, num_nodes=6)
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 2)], "id long, label long"
    )
    got = {
        r["id"]: r["coverage"]
        for r in local_partition_coverage(g, labels).collect()
    }
    # node 0: nbrs 1,2 same + self-loop once -> num 3, den 3 -> 1.0
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(1.0)
    # node 2: nbrs 0,1 same, 3 other -> 2/3
    assert got[2] == pytest.approx(2 / 3)
    # node 3: nbr 4 same, 2 other -> 1/2
    assert got[3] == pytest.approx(0.5)
    assert got[4] == pytest.approx(1.0)
    assert got[5] == 0.0
