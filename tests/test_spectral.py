"""Spectral bisection (networkit/partitioning.py SpectralPartitioner role)
vs numpy eigendecomposition referees."""

import numpy as np
from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.spectral import fiedler_vector, spectral_bisection

BARBELL = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]


def _numpy_fiedler(rows, n):
    W = np.zeros((n, n))
    for u, v, *w in rows:
        wt = float(w[0]) if w else 1.0
        W[u, v] += wt
        W[v, u] += wt
    L = np.diag(W.sum(axis=1)) - W
    vals, vecs = np.linalg.eigh(L)
    f = vecs[:, 1]
    # canonical sign: first nonzero coordinate positive
    nz = np.nonzero(np.abs(f) > 1e-9)[0]
    if len(nz) and f[nz[0]] < 0:
        f = -f
    return f


def test_fiedler_matches_numpy_barbell(spark):
    g = from_edge_rows(spark, BARBELL)
    got = {r["id"]: r["f"] for r in fiedler_vector(g, num_iters=60).collect()}
    want = _numpy_fiedler(BARBELL, 6)
    for i in range(6):
        assert abs(got[i] - want[i]) < 1e-4, (i, got[i], want[i])


def test_fiedler_matches_numpy_random(spark):
    rng = np.random.RandomState(5)
    n = 10
    rows = []
    seen = set()
    while len(rows) < 18:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            rows.append((min(a, b), max(a, b), float(rng.randint(1, 5))))
    # ensure connectivity via a path backbone
    rows += [(i, i + 1, 1.0) for i in range(n - 1)
             if (i, i + 1) not in seen]
    g = from_edge_rows(spark, rows)
    got = {r["id"]: r["f"] for r in fiedler_vector(g, num_iters=120).collect()}
    f = np.array([got[i] for i in range(n)])
    # validate by the defining properties rather than coordinates (a tight
    # lambda_2/lambda_3 gap slows coordinate convergence): unit norm,
    # orthogonal to ones, Rayleigh quotient within 2% of numpy's lambda_2
    W = np.zeros((n, n))
    for u, v, *w in rows:
        wt = float(w[0]) if w else 1.0
        W[u, v] += wt
        W[v, u] += wt
    L = np.diag(W.sum(axis=1)) - W
    lam2 = np.linalg.eigvalsh(L)[1]
    assert abs(np.linalg.norm(f) - 1.0) < 1e-9
    assert abs(f.sum()) < 1e-9
    rq = float(f @ L @ f)
    assert rq <= lam2 * 1.02 + 1e-12, (rq, lam2)


def test_bisection_separates_barbell(spark):
    g = from_edge_rows(spark, BARBELL)
    got = {r["id"]: r["label"] for r in spectral_bisection(g, num_iters=60).collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_bisection_balanced_split_sizes(spark):
    # path of 8: balanced split -> 4 + 4
    g = from_edge_rows(spark, [(i, i + 1) for i in range(7)])
    labels = [r["label"] for r in spectral_bisection(g, num_iters=80).collect()]
    assert sorted([labels.count(0), labels.count(1)]) == [4, 4]


def test_spectral_coloring_is_proper(spark):
    """networkit/coloring.py:6-58 — the recursive sign-split must end with
    every color class an independent set (no monochromatic edge)."""
    import itertools

    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.spectral import spectral_coloring

    cases = {
        "triangle": [(0, 1), (1, 2), (2, 0)],
        "c4": [(0, 1), (1, 2), (2, 3), (3, 0)],
        "barbell": list(itertools.combinations(range(4), 2))
        + [(u + 4, v + 4) for u, v in itertools.combinations(range(4), 2)]
        + [(3, 4)],
        "weighted_path": [(0, 1, 2.5), (1, 2, 0.5)],
    }
    for name, rows in cases.items():
        g = from_edge_rows(spark, rows, weighted=(name == "weighted_path"))
        col = {r["id"]: r["color"] for r in spectral_coloring(g).collect()}
        assert set(col) == {r["id"] for r in g.vertices.collect()}, name
        for e in rows:
            u, v = e[0], e[1]
            assert col[u] != col[v], (name, u, v)
    # triangle needs >= 3 colors; determinism across calls
    tri = from_edge_rows(spark, cases["triangle"])
    c1 = {r["id"]: r["color"] for r in spectral_coloring(tri).collect()}
    c2 = {r["id"]: r["color"] for r in spectral_coloring(tri).collect()}
    assert len(set(c1.values())) >= 3 and c1 == c2
    # the dense-spectrum guard
    with pytest.raises(ValueError, match="max_n"):
        spectral_coloring(tri, max_n=2)
