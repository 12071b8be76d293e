"""GraphBLAS semiring layer (algebraic/ counterpart): MxV vs a numpy
referee over every semiring, and the four algebraic algorithms vs the
engine's native operators / hand-computed references."""

import math

import numpy as np
import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.graphblas import (
    SEMIRINGS,
    adjacency,
    algebraic_bellman_ford,
    algebraic_bfs,
    algebraic_pagerank,
    algebraic_triangle_counting,
    mxv,
)

INF = float("inf")

_NP_SEMIRINGS = {
    "arithmetic": (0.0, lambda a, b: a + b, lambda a, b: a * b),
    "min_plus": (INF, min, lambda a, b: a + b),
    "max_plus": (-INF, max, lambda a, b: a + b),
    "min_max": (INF, min, max),
    "max_min": (-INF, max, min),
    "int_logical": (
        0.0,
        lambda a, b: float(bool(a) or bool(b)),
        lambda a, b: float(bool(a) and bool(b)),
    ),
}


@pytest.mark.parametrize("name", sorted(SEMIRINGS))
def test_mxv_matches_numpy_referee(spark, name):
    rng = np.random.default_rng(7)
    n = 6
    dense = rng.integers(0, 3, size=(n, n)).astype(float)  # 0 = structural zero
    vec = rng.integers(1, 5, size=n).astype(float)
    A = spark.createDataFrame(
        [
            (i, j, float(dense[i, j]))
            for i in range(n)
            for j in range(n)
            if dense[i, j] != 0
        ],
        "row long, col long, val double",
    )
    v = spark.createDataFrame(
        [(i, float(vec[i])) for i in range(n)], "id long, value double"
    )
    verts = spark.range(n).select("id")
    got = {
        r["id"]: r["value"]
        for r in mxv(A, v, name, vertices=verts).collect()
    }
    zero, add, mult = _NP_SEMIRINGS[name]
    for i in range(n):
        want = zero
        for j in range(n):
            if dense[i, j] != 0:
                want = add(want, mult(dense[i, j], vec[j]))
        assert got[i] == want, (name, i)


def test_mxv_accumulate_overload(spark):
    # c' = add(c, A (x) v) — GraphBLAS.hpp:100-129
    A = spark.createDataFrame([(0, 1, 2.0)], "row long, col long, val double")
    v = spark.createDataFrame([(1, 3.0)], "id long, value double")
    c = spark.createDataFrame([(0, 10.0), (2, 4.0)], "id long, value double")
    got = {r["id"]: r["value"] for r in mxv(A, v, "min_plus", accumulate=c).collect()}
    assert got == {0: 5.0, 2: 4.0}  # min(10, 2+3), untouched row carried


def test_algebraic_bfs_matches_bfs_hops(spark):
    from networkit_spark.operators.centrality import bfs_hops

    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 1.0), (4, 5, 1.0)]
    g = from_edge_rows(spark, rows, directed=False, weighted=True)
    alg = {r["id"]: r["dist"] for r in algebraic_bfs(g, source=0).collect()}
    ref = {r["id"]: float(r["dist"]) for r in bfs_hops(g, source=0).collect()}
    for i, d in ref.items():
        assert alg[i] == d, i
    assert alg[4] == INF and alg[5] == INF  # unreachable = Vector's inf init


def test_algebraic_bellman_ford_weighted_and_negative_cycle(spark):
    # weighted distances on a DAG-ish directed graph
    rows = [(0, 1, 4.0), (0, 2, 1.0), (2, 1, 1.0), (1, 3, 2.0)]
    g = from_edge_rows(spark, rows, directed=True, weighted=True)
    d, neg = algebraic_bellman_ford(g, source=0)
    got = {r["id"]: r["dist"] for r in d.collect()}
    assert not neg
    assert got[0] == 0.0 and got[2] == 1.0 and got[1] == 2.0 and got[3] == 4.0

    # negative cycle reachable from the source flips the verdict
    rows = [(0, 1, 1.0), (1, 2, -3.0), (2, 1, 1.0)]
    g = from_edge_rows(spark, rows, directed=True, weighted=True)
    _, neg = algebraic_bellman_ford(g, source=0)
    assert neg


def test_algebraic_pagerank_matches_native_on_loop_free_graph(spark):
    from networkit_spark.operators.pagerank import pagerank

    rows = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.0), (1, 3, 1.0)]
    g = from_edge_rows(spark, rows, directed=False, weighted=True)
    alg = {
        r["id"]: r["score"]
        for r in algebraic_pagerank(g, damp=0.85, tol=1e-12).collect()
    }
    ref = {
        r["id"]: r["score"] for r in pagerank(g, damp=0.85, tol=1e-12).collect()
    }
    for i in ref:
        assert math.isclose(alg[i], ref[i], rel_tol=0, abs_tol=1e-9), i


def test_algebraic_triangle_counting_matches_oriented_join(spark):
    from networkit_spark.operators.triangles import triangle_counts

    rows = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),  # triangle
        (2, 3, 1.0), (3, 4, 1.0), (2, 4, 1.0),  # triangle
        (4, 5, 1.0),  # tail
    ]
    g = from_edge_rows(spark, rows, directed=False, weighted=True)
    alg = {r["id"]: r["score"] for r in algebraic_triangle_counting(g).collect()}
    ref = {r["id"]: r["triangles"] for r in triangle_counts(g).collect()}
    assert alg == {i: int(ref.get(i, 0)) for i in range(6)}
