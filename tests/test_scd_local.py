"""Fixture-tier heap-sequential SCD expansions (scd/TCE.cpp,
LocalTightnessExpansion.cpp, LocalT.cpp, TwoPhaseL.cpp)."""

import itertools

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.scd_local import (
    local_t,
    local_tightness_expansion,
    tce,
    two_phase_l,
)


def barbell(spark):
    # two 5-cliques bridged by a single edge (4,5)
    a = list(itertools.combinations(range(5), 2))
    b = list(itertools.combinations(range(5, 10), 2))
    return from_edge_rows(spark, a + b + [(4, 5)])


def ids(df):
    return sorted(r["id"] for r in df.collect())


# ---- TCE -------------------------------------------------------------------


def test_tce_recovers_clique(spark):
    g = barbell(spark)
    # hand-derived trace (TCE.cpp:172-226): conductance falls while
    # absorbing clique A, adding bridge node 5 would raise it (4/26 > 1/21)
    assert ids(tce(g, seeds=[0])) == [0, 1, 2, 3, 4]


def test_tce_jaccard_recovers_clique(spark):
    g = barbell(spark)
    assert ids(tce(g, seeds=[0], use_jaccard=True)) == [0, 1, 2, 3, 4]


def test_tce_refine_keeps_good_community(spark):
    g = barbell(spark)
    # refine removes nothing from an already-optimal clique community
    assert ids(tce(g, seeds=[0], refine=True)) == [0, 1, 2, 3, 4]


def test_tce_contains_seeds_and_is_deterministic(spark):
    g = barbell(spark)
    a = ids(tce(g, seeds=[4, 5]))
    b = ids(tce(g, seeds=[4, 5]))
    assert a == b
    assert {4, 5} <= set(a)


def test_tce_weighted_prefers_heavy_side(spark):
    # triangle 0-1-2 heavy, node 3 lightly attached but with outside
    # pull: absorbing 3 would raise conductance (2/64 > 1/61) -> rejected
    g = from_edge_rows(
        spark,
        [(0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
         (2, 3, 1.0), (3, 4, 1.0), (3, 5, 1.0)],
        weighted=True,
    )
    assert ids(tce(g, seeds=[0])) == [0, 1, 2]


def test_tce_isolated_seed_stays_alone(spark):
    # vertex 7 exists (0..9 id range) but has no edges: empty shell,
    # community == seeds (TCE.cpp:79 degree-0 guard)
    g = from_edge_rows(spark, [(0, 9), (1, 2)])
    assert ids(tce(g, seeds=[7])) == [7]


def test_tce_rejects_directed(spark):
    g = from_edge_rows(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        tce(g, seeds=[0])


# ---- LocalTightnessExpansion ------------------------------------------------


def test_lte_recovers_clique(spark):
    g = barbell(spark)
    assert ids(local_tightness_expansion(g, seeds=[0])) == [0, 1, 2, 3, 4]


def test_lte_alpha_large_is_conservative(spark):
    g = barbell(spark)
    # larger alpha penalizes external similarity harder -> never a bigger
    # community than the default
    small = set(ids(local_tightness_expansion(g, seeds=[0], alpha=4.0)))
    base = set(ids(local_tightness_expansion(g, seeds=[0], alpha=1.0)))
    assert small <= base
    assert 0 in small


def test_lte_deterministic(spark):
    g = barbell(spark)
    a = ids(local_tightness_expansion(g, seeds=[4]))
    assert a == ids(local_tightness_expansion(g, seeds=[4]))
    assert 4 in a


# ---- LocalT -----------------------------------------------------------------


def test_local_t_clique_seed_is_stable(spark):
    g = barbell(spark)
    # hand-derived (LocalT.cpp:156-191): from the full clique A the best
    # candidate 5 scores 10*(10-6)=40 < 100, so nothing is admitted
    assert ids(local_t(g, seeds=[0, 1, 2, 3, 4])) == [0, 1, 2, 3, 4]


def test_local_t_expands_within_triangles(spark):
    g = barbell(spark)
    got = set(ids(local_t(g, seeds=[0])))
    assert 0 in got
    # triangle-driven expansion never crosses the triangle-free bridge
    assert got <= {0, 1, 2, 3, 4}


def test_local_t_triangle_free_graph_stays_seeded(spark):
    # a path has no triangles: score stays 0 = max(0, 0*(0-e)) and every
    # candidate has new_ext == 0, so the first (smallest-id) shell node
    # is admitted each round until the component is absorbed
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)])
    got = ids(local_t(g, seeds=[1]))
    assert set(got) == {0, 1, 2, 3}


# ---- TwoPhaseL --------------------------------------------------------------


def test_two_phase_l_barbell(spark):
    g = barbell(spark)
    # hand-derived (TwoPhaseL.cpp:52-105): phase 1 grows {0}->{0..4};
    # phase 2's ascending sweep drops 4 (removal does not strictly
    # violate the keep condition: n_lex == cur_lex)
    assert ids(two_phase_l(g, seeds=[0])) == [0, 1, 2, 3]


def test_two_phase_l_removed_seed_yields_empty(spark):
    g = barbell(spark)
    # hand-derived: phase 1 from {4} grows to clique A, phase 2 drops 4
    # (n_lex == cur_lex is not a strict improvement) -> seed removed ->
    # the reference contract returns the empty community
    # (TwoPhaseL.cpp:107-111)
    assert ids(two_phase_l(g, seeds=[4])) == []


def test_two_phase_l_deterministic(spark):
    g = barbell(spark)
    assert ids(two_phase_l(g, seeds=[1])) == ids(two_phase_l(g, seeds=[1]))


def test_two_phase_l_rejects_self_loops(spark):
    g = from_edge_rows(spark, [(0, 0), (0, 1)])
    with pytest.raises(ValueError):
        two_phase_l(g, seeds=[0])
