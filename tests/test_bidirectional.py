"""Bidirectional BFS / Dijkstra point-to-point distances vs full-search
referees (distance/BidirectionalBFS.cpp, BidirectionalDijkstra.cpp)."""

import heapq

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.bidirectional import (
    bidirectional_bfs_distance,
    bidirectional_dijkstra_distance,
)


def _dijkstra_ref(n, edges, s, directed=False):
    adj = {i: [] for i in range(n)}
    for u, v, w in edges:
        adj[u].append((v, w))
        if not directed:
            adj[v].append((u, w))
    dist = {s: 0.0}
    pq = [(0.0, s)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_bidirectional_bfs_path_and_unreachable(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (4, 5, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    assert bidirectional_bfs_distance(g, 0, 3) == 3
    assert bidirectional_bfs_distance(g, 0, 0) == 0
    assert bidirectional_bfs_distance(g, 0, 5) is None


def test_bidirectional_bfs_matches_referee_random(spark):
    rng = np.random.RandomState(4)
    n = 14
    es = set()
    while len(es) < 22:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es.add((min(a, b), max(a, b)))
    rows = [(a, b, 1.0) for a, b in sorted(es)]
    g = from_edge_rows(spark, rows, num_nodes=n, weighted=True)
    ref = _dijkstra_ref(n, rows, 0)
    for t in (3, 7, 11, 13):
        want = int(ref[t]) if t in ref else None
        assert bidirectional_bfs_distance(g, 0, t) == want, t


def test_bidirectional_bfs_directed(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=3, weighted=True, directed=True)
    assert bidirectional_bfs_distance(g, 0, 2) == 2
    assert bidirectional_bfs_distance(g, 2, 0) is None


def test_bidirectional_dijkstra_matches_referee(spark):
    rng = np.random.RandomState(6)
    n = 12
    es = {}
    while len(es) < 20:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es[(min(a, b), max(a, b))] = float(rng.randint(1, 9))
    rows = [(a, b, w) for (a, b), w in sorted(es.items())]
    g = from_edge_rows(spark, rows, num_nodes=n, weighted=True)
    ref = _dijkstra_ref(n, rows, 1)
    for t in (0, 5, 9, 11):
        want = ref.get(t)
        got = bidirectional_dijkstra_distance(g, 1, t)
        if want is None:
            assert got is None
        else:
            assert got is not None and abs(got - want) < 1e-9, (t, got, want)


def test_bidirectional_dijkstra_prunes_early_stop_correct(spark):
    # long cheap chain vs short expensive edge: must return the cheap one
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 3, 10.0)]
    g = from_edge_rows(spark, rows, num_nodes=4, weighted=True)
    assert abs(bidirectional_dijkstra_distance(g, 0, 3) - 3.0) < 1e-9
