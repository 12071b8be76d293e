"""Eccentricity / SPSP / Volume (distance/) contract tests."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.distance import (
    eccentricity,
    nodes_within_distance,
    spsp,
    volume,
)


def test_eccentricity_path_graph(spark):
    # path 0-1-2-3-4: ecc = max(i, 4-i); farthest = the far endpoint
    g = from_edge_rows(spark, [(i, i + 1) for i in range(4)])
    got = {r["id"]: (r["ecc"], r["farthest"]) for r in eccentricity(g).collect()}
    assert got == {0: (4, 4), 1: (3, 4), 2: (2, 4), 3: (3, 0), 4: (4, 0)}


def test_eccentricity_tie_breaks_to_max_id(spark):
    # star: center ecc 1, any leaf is farthest -> largest id wins
    g = from_edge_rows(spark, [(0, i) for i in range(1, 5)])
    got = {r["id"]: r["farthest"] for r in eccentricity(g).collect()}
    assert got[0] == 4


def test_spsp_matches_hops(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4)])
    got = {(r["s"], r["t"]): r["dist"] for r in spsp(g, [0, 2], targets=[1, 4]).collect()}
    assert got == {(0, 1): 1, (0, 4): 3, (2, 1): 1, (2, 4): 1}


def test_ball_respects_weights(spark):
    # weighted path 0 -2.0- 1 -1.5- 2; ball(0, r=3) = {0,1}, ball(0, r=3.5) adds 2
    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 1.5)], weighted=True)
    src = spark.createDataFrame([(0,)], "s long")
    b3 = {r["id"]: r["d"] for r in nodes_within_distance(g, 3.0, src).collect()}
    assert b3 == {0: 0.0, 1: 2.0}
    b35 = {r["id"]: r["d"] for r in nodes_within_distance(g, 3.5, src).collect()}
    assert b35 == {0: 0.0, 1: 2.0, 2: 3.5}


def test_ball_keeps_min_distance_via_shortcut(spark):
    # 0-1 w=5 direct, but 0-2-1 costs 2; r=4 must reach 1 via the shortcut
    g = from_edge_rows(spark, [(0, 1, 5.0), (0, 2, 1.0), (2, 1, 1.0)], weighted=True)
    src = spark.createDataFrame([(0,)], "s long")
    b = {r["id"]: r["d"] for r in nodes_within_distance(g, 4.0, src).collect()}
    assert b[1] == 2.0


def test_volume_unit_weights(spark):
    # 5-cycle, unit weights: ball r=1 has 3 nodes, r=2 covers all 5
    g = from_edge_rows(spark, [(i, (i + 1) % 5) for i in range(5)])
    got = {r["r"]: r["volume"] for r in volume(g, [1.0, 2.0], samples=5).collect()}
    assert got == {1.0: 3.0, 2.0: 5.0}


def test_incomplete_dijkstra_vs_heap_referee(spark):
    import heapq

    from networkit_spark.operators.distance import incomplete_dijkstra

    rows = [
        (0, 1, 1.0), (1, 2, 2.0), (0, 3, 4.0), (3, 4, 1.0),
        (2, 4, 1.0), (4, 5, 3.0), (1, 5, 10.0),
    ]
    g = from_edge_rows(spark, rows)
    sources, excluded = [0, 5], {2}

    adj = {}
    for u, v, w in rows:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {s: 0.0 for s in sources if s not in excluded}
    heap = [(0.0, s) for s in dist]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            if v in excluded:
                continue
            if d + w < dist.get(v, float("inf")):
                dist[v] = d + w
                heapq.heappush(heap, (dist[v], v))

    got = {r["id"]: r["dist"] for r in incomplete_dijkstra(g, sources, excluded=[2]).collect()}
    assert got == dist


def test_incomplete_dijkstra_max_dist_cut(spark):
    from networkit_spark.operators.distance import incomplete_dijkstra

    g = from_edge_rows(spark, [(i, i + 1) for i in range(6)])
    got = {r["id"]: r["dist"] for r in incomplete_dijkstra(g, [0], max_dist=2.5).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_graph_distance_deprecated_wrapper(spark):
    """distance/GraphDistance.cpp role: one point-to-point distance,
    BFS hops unweighted / Dijkstra weighted, inf when unreachable."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.distance import graph_distance

    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4)], weighted=False)
    assert graph_distance(g, 0, 2) == 2.0
    assert graph_distance(g, 0, 3) == float("inf")
    gw = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 9.0)], weighted=True)
    assert graph_distance(gw, 0, 2) == 5.0


def test_dynamic_nmi_distance_wrapper(spark):
    """community/DynamicNMIDistance.cpp:18-133 — the isInBoth inner-join
    restriction + static NMI distance: identical partitions restricted to
    the graph's nodes give 0 even when labels disagree OUTSIDE the graph."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.measures import dynamic_nmi_distance

    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], weighted=False)
    old = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1), (9, 7)], "id long, label long"
    )
    new = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 6), (3, 6), (9, 8)], "id long, label long"
    )
    assert dynamic_nmi_distance(g, old, new) == 0.0
    # a real split registers as > 0
    new2 = spark.createDataFrame(
        [(0, 5), (1, 6), (2, 5), (3, 6)], "id long, label long"
    )
    assert dynamic_nmi_distance(g, old, new2) > 0.1
