"""AllSimplePaths + AlgebraicDistance contract tests."""

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.algebraic import (
    algebraic_distance_edge_scores,
    algebraic_loads,
)
from networkit_spark.operators.reachability import all_simple_paths


def paths_set(g, s, t, cutoff):
    return {
        tuple(r["path"]) for r in all_simple_paths(g, s, t, cutoff).collect()
    }


def test_diamond_paths(spark):
    g = from_edge_rows(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True)
    assert paths_set(g, 0, 3, 3) == {(0, 1, 3), (0, 2, 3)}


def test_cutoff_prunes_long_paths(spark):
    # 0->3 direct plus 0->1->2->3
    g = from_edge_rows(spark, [(0, 3), (0, 1), (1, 2), (2, 3)], directed=True)
    assert paths_set(g, 0, 3, 1) == {(0, 3)}
    assert paths_set(g, 0, 3, 3) == {(0, 3), (0, 1, 2, 3)}


def test_simple_paths_skip_cycles(spark):
    # cycle 0->1->2->0 plus exit 2->3: the only simple path visits each once
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=True)
    assert paths_set(g, 0, 3, 5) == {(0, 1, 2, 3)}


def test_paths_do_not_pass_through_target(spark):
    # 0->1->2: path to 1 must not continue; (0,1) only
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 1)], directed=True)
    assert paths_set(g, 0, 1, 4) == {(0, 1)}


def test_algebraic_distance_deterministic_and_bounded(spark):
    edges = [(i, i + 1) for i in range(9)]
    g = from_edge_rows(spark, edges)
    a = {(r["src"], r["dst"]): r["ad"] for r in algebraic_distance_edge_scores(g).collect()}
    b = {(r["src"], r["dst"]): r["ad"] for r in algebraic_distance_edge_scores(g).collect()}
    assert a == b
    assert len(a) == 9
    assert all(0.0 <= v <= 2.0 for v in a.values())  # k=4, norm=2 -> max sqrt(4)


def test_algebraic_loads_normalized(spark):
    g = from_edge_rows(spark, [(i, i + 1) for i in range(5)])
    import pandas as pd

    df = algebraic_loads(g, num_systems=2, num_iters=3).toPandas()
    for c in ("x0", "x1"):
        assert df[c].min() == pytest.approx(0.0)
        assert df[c].max() == pytest.approx(1.0)
        assert ((df[c] >= 0) & (df[c] <= 1)).all()


def test_algebraic_max_norm_is_componentwise_max(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2)])
    loads = {r["id"]: (r["x0"], r["x1"]) for r in algebraic_loads(g, 2, 3).collect()}
    got = {
        (r["src"], r["dst"]): r["ad"]
        for r in algebraic_distance_edge_scores(g, num_systems=2, num_iters=3, norm=0).collect()
    }
    for (u, v), ad in got.items():
        expect = max(abs(loads[u][0] - loads[v][0]), abs(loads[u][1] - loads[v][1]))
        assert ad == pytest.approx(expect)
