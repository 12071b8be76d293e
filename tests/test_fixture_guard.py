"""require_fixture_scale: every documented fixture-tier (driver-sequential)
operator raises loudly instead of silently collecting an at-scale edge list
into driver memory (VERDICT r4 task 4 — the UMSF/spectral_coloring guard
pattern applied uniformly)."""

import pytest

from networkit_spark.graph import from_edge_rows, require_fixture_scale

# a 12-node path: 11 undirected edges -> 22 stored directed rows
PATH_ROWS = [(i, i + 1, 1.0) for i in range(11)]
TINY = 4  # max_m below the stored edge count -> must raise


@pytest.fixture(scope="module")
def path_graph(spark):
    return from_edge_rows(spark, PATH_ROWS, directed=False, weighted=True)


def _expect_guard(fn):
    with pytest.raises(ValueError, match="fixture-tier"):
        fn()


def test_guard_message_names_operator(path_graph):
    with pytest.raises(ValueError, match="my_op"):
        require_fixture_scale(path_graph, TINY, "my_op")
    # and passes silently at fixture scale
    require_fixture_scale(path_graph, 1_000, "my_op")


def test_lp_degree_ordered_guard(path_graph):
    from networkit_spark.operators.labelprop import lp_degree_ordered

    _expect_guard(lambda: lp_degree_ordered(path_graph, max_m=TINY))


@pytest.mark.parametrize("name", ["tce", "lte", "local_t", "two_phase_l"])
def test_scd_local_guards(path_graph, name):
    from networkit_spark.operators import scd_local

    fn = {
        "tce": lambda: scd_local.tce(path_graph, [0], max_m=TINY),
        "lte": lambda: scd_local.local_tightness_expansion(
            path_graph, [0], max_m=TINY
        ),
        "local_t": lambda: scd_local.local_t(path_graph, [0], max_m=TINY),
        "two_phase_l": lambda: scd_local.two_phase_l(path_graph, [0], max_m=TINY),
    }[name]
    _expect_guard(fn)


def test_curveball_guard(path_graph):
    from networkit_spark.operators.randomization import curveball

    _expect_guard(lambda: curveball(path_graph, [(0, 2)], max_m=TINY))


def test_path_growing_matching_guard(path_graph):
    from networkit_spark.operators.matching import path_growing_matching

    _expect_guard(lambda: path_growing_matching(path_graph, max_m=TINY))


def test_spanning_guards(path_graph):
    from networkit_spark.operators.spanning import (
        kruskal_msf,
        random_spanning_forest,
        wilson_spanning_forest,
    )

    _expect_guard(lambda: random_spanning_forest(path_graph, max_m=TINY))
    _expect_guard(lambda: wilson_spanning_forest(path_graph, max_m=TINY))
    _expect_guard(lambda: kruskal_msf(path_graph, max_m=TINY))


def test_cut_clustering_guard(path_graph):
    from networkit_spark.operators.flow import cut_clustering

    _expect_guard(lambda: cut_clustering(path_graph, alpha=0.5, max_m=TINY))


def test_maxent_stress_guard(path_graph):
    from networkit_spark.operators.layout import maxent_stress

    _expect_guard(lambda: maxent_stress(path_graph, max_m=TINY))


def test_graph_to_nx_guard(path_graph):
    nx = pytest.importorskip("networkx")  # noqa: F841
    from networkit_spark.sources.nxadapter import graph_to_nx

    _expect_guard(lambda: graph_to_nx(path_graph, max_m=TINY))


def test_operators_still_run_at_fixture_scale(path_graph):
    # the guard's default never bothers legitimate fixture use
    from networkit_spark.operators.spanning import wilson_spanning_forest

    assert wilson_spanning_forest(path_graph).count() == 11
