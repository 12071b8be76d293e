"""Triangle-counting parity tests (FIXTURES.md §2.4)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.triangles import (
    global_transitivity,
    global_triangle_count,
    local_clustering_coefficient,
    triangle_counts,
    triangle_edge_scores,
)
from networkit_spark.oracle import triangles_oracle


def _arr(df, n, col):
    out = np.zeros(n)
    for r in df.collect():
        out[r["id"]] = r[col]
    return out


def test_3clique_plus_pendant(spark):
    # networkit/cpp/edgescores/test/ChibaNishizekiTriangleEdgeScoreGTest.cpp:18-55
    g = from_edge_rows(spark, [(0, 1), (0, 2), (1, 2)], num_nodes=5)
    assert global_triangle_count(g) == 1
    per = _arr(triangle_counts(g), 5, "triangles")
    assert per.tolist() == [1, 1, 1, 0, 0]
    lcc = _arr(local_clustering_coefficient(g), 5, "lcc")
    assert np.allclose(lcc, [1.0, 1.0, 1.0, 0.0, 0.0])
    scores = {
        (r["src"], r["dst"]): r["score"] for r in triangle_edge_scores(g).collect()
    }
    assert scores == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


def test_6node_extension(spark):
    # same file lines 57-70: add (0,4)(0,3)(3,4)(0,5)(4,5); node 0 in 3 triangles
    rows = [(0, 1), (0, 2), (1, 2), (0, 4), (0, 3), (3, 4), (0, 5), (4, 5)]
    g = from_edge_rows(spark, rows, num_nodes=6)
    per = _arr(triangle_counts(g), 6, "triangles")
    assert per[0] == 3
    assert global_triangle_count(g) == 3
    want_per, want_total = triangles_oracle(
        6, [(a, b, 1.0) for a, b in rows] + [(b, a, 1.0) for a, b in rows]
    )
    assert per.tolist() == want_per.tolist()
    assert want_total == 3


def test_global_transitivity_k4(spark):
    # K4: 4 triangles, every wedge closed -> transitivity 1
    rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = from_edge_rows(spark, rows)
    assert global_triangle_count(g) == 4
    assert abs(global_transitivity(g) - 1.0) < 1e-12


def test_matches_oracle_random(spark):
    rng = np.random.default_rng(11)
    n = 60
    rows = list(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, n, size=(250, 2))
            if a != b
        }
    )
    g = from_edge_rows(spark, rows, num_nodes=n)
    per = _arr(triangle_counts(g), n, "triangles")
    sym = [(a, b, 1.0) for a, b in rows] + [(b, a, 1.0) for a, b in rows]
    want_per, want_total = triangles_oracle(n, sym)
    assert per.tolist() == want_per.tolist()
    assert global_triangle_count(g) == want_total


def test_multi_edges_and_loops_ignored(spark):
    # duplicate edges + self-loop must not inflate counts (distinct() in the
    # orientation; src!=dst filter)
    rows = [(0, 1), (0, 1), (1, 2), (0, 2), (1, 1)]
    g = from_edge_rows(spark, rows, num_nodes=3)
    assert global_triangle_count(g) == 1


def test_approx_transitivity_close_to_exact(spark):
    from networkit_spark.operators.triangles import (
        approx_transitivity,
        global_transitivity,
    )
    from networkit_spark.sources.generators import erdos_renyi

    g = erdos_renyi(spark, n=120, p=0.15, seed=5)
    exact = global_transitivity(g)
    approx = approx_transitivity(g, samples_per_vertex=16, seed=7)
    assert abs(approx - exact) < 0.08
    # deterministic in seed
    assert approx == approx_transitivity(g, samples_per_vertex=16, seed=7)
