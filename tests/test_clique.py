"""MaximalCliques (clique/MaximalCliques.cpp) contract tests."""

import itertools

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.clique import clique_stats, maximal_cliques


def brute_maximal_cliques(n, edges):
    adj = {i: set() for i in range(n)}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    cliques = []
    nodes = list(range(n))
    for k in range(1, n + 1):
        for comb in itertools.combinations(nodes, k):
            if all(b in adj[a] for a, b in itertools.combinations(comb, 2)):
                cliques.append(set(comb))
    maximal = [c for c in cliques if not any(c < d for d in cliques)]
    return {tuple(sorted(c)) for c in maximal}


def got_cliques(g):
    return {tuple(r["members"]) for r in maximal_cliques(g).collect()}


def test_two_triangles_bridge(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = from_edge_rows(spark, edges)
    assert got_cliques(g) == brute_maximal_cliques(6, edges)


def test_k4_with_pendant_and_isolated(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    g = from_edge_rows(spark, edges, num_nodes=6)  # node 5 isolated
    got = got_cliques(g)
    assert got == brute_maximal_cliques(6, edges)
    assert (5,) in got  # isolated vertex is its own maximal clique
    assert (0, 1, 2, 3) in got


def test_overlapping_cliques_random(spark):
    import random

    rng = random.Random(7)
    n = 14
    edges = [(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < 0.45]
    g = from_edge_rows(spark, edges, num_nodes=n)
    assert got_cliques(g) == brute_maximal_cliques(n, edges)


def test_clique_stats_histogram(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = from_edge_rows(spark, edges)
    got = {r["size"]: r["n_cliques"] for r in clique_stats(maximal_cliques(g)).collect()}
    assert got == {3: 1, 2: 1}


def test_clique_detect_picks_largest_then_lexicographic(spark):
    from networkit_spark.operators.clique import clique_detect

    # seed 0 sits in a triangle {0,1,2} and a 4-clique {0,5,6,7}
    edges = [
        (0, 1), (1, 2), (2, 0),
        (0, 5), (0, 6), (0, 7), (5, 6), (5, 7), (6, 7),
        # vertex 9 sits in two triangles {9,10,11} and {8,9,10}? no —
        # make a clean tie: {9,10,11} and {9,12,13}
        (9, 10), (10, 11), (9, 11),
        (9, 12), (12, 13), (9, 13),
    ]
    g = from_edge_rows(spark, edges)
    got = {
        r["seed"]: list(r["members"]) for r in clique_detect(g).collect()
    }
    assert got[0] == [0, 5, 6, 7]
    assert got[1] == [0, 1, 2]
    # size tie at seed 9: lexicographically smallest member array wins
    assert got[9] == [9, 10, 11]
    seeds = spark.createDataFrame([(0,)], "seed long")
    only = clique_detect(g, seeds=seeds).collect()
    assert len(only) == 1 and list(only[0]["members"]) == [0, 5, 6, 7]
