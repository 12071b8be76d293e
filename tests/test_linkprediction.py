"""Link-prediction indices vs hand-computed values (reference:
networkit/cpp/linkprediction/*Index.cpp semantics)."""

import math

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.linkprediction import (
    link_prediction_scores,
    top_predicted_links,
)

# path + hub: 0-1, 1-2, 0-3, 2-3 (4-cycle) and pendant 4-1
EDGES = [(0, 1), (1, 2), (0, 3), (2, 3), (1, 4)]


def test_indices_on_cycle(spark):
    g = from_edge_rows(spark, EDGES)
    rows = {(r["u"], r["v"]): r for r in link_prediction_scores(g).collect()}
    # non-adjacent 2-hop pairs: (0,2) via 1,3; (1,3) via 0,2; (0,4),(2,4) via 1
    assert set(rows) == {(0, 2), (1, 3), (0, 4), (2, 4)}
    r02 = rows[(0, 2)]
    # deg: 0->2, 1->3, 2->2, 3->2, 4->1
    assert r02["cn"] == 2
    assert r02["aa"] == pytest.approx(1 / math.log(3) + 1 / math.log(2))
    assert r02["ra"] == pytest.approx(1 / 3 + 1 / 2)
    assert r02["jaccard"] == pytest.approx(2 / (2 + 2 - 2))
    assert r02["pa"] == 4
    assert r02["tn"] == 2
    r04 = rows[(0, 4)]
    assert r04["cn"] == 1 and r04["pa"] == 2
    assert r04["jaccard"] == pytest.approx(1 / (2 + 1 - 1))


def test_excludes_existing_edges(spark):
    g = from_edge_rows(spark, EDGES)
    pairs = {(r["u"], r["v"]) for r in link_prediction_scores(g).collect()}
    for u, v in EDGES:
        assert (min(u, v), max(u, v)) not in pairs


def test_hinge_cap_drops_hub_wedges(spark):
    # star hub 0 with leaves 1..5 plus a path 1-6-2: hub-mediated pairs
    # exist only through hinge 0 (deg 5); pair (1,2) also closes via 6
    star = [(0, i) for i in range(1, 6)] + [(1, 6), (6, 2)]
    g = from_edge_rows(spark, star)
    full = {(r["u"], r["v"]): r["cn"] for r in link_prediction_scores(g).collect()}
    assert full[(1, 2)] == 2  # via hub 0 and via 6
    capped = {
        (r["u"], r["v"]): r["cn"]
        for r in link_prediction_scores(g, max_hinge_degree=2).collect()
    }
    # hub 0 (deg 5) excluded as hinge: (1,2) keeps only its wedge through 6,
    # (0,6) survives via low-degree hinges 1 and 2, and all hub-mediated
    # leaf pairs (3,4),(3,5),... disappear
    assert set(capped) == {(1, 2), (0, 6)}
    assert capped[(1, 2)] == 1
    assert capped[(0, 6)] == 2
    # non-binding cap reproduces the exact result
    uncapped_eq = {
        (r["u"], r["v"]): r["cn"]
        for r in link_prediction_scores(g, max_hinge_degree=100).collect()
    }
    assert uncapped_eq == full


def test_topk_deterministic(spark):
    g = from_edge_rows(spark, EDGES)
    top = top_predicted_links(g, k=2, by="cn").collect()
    assert [(r["u"], r["v"]) for r in top] == [(0, 2), (1, 3)]
