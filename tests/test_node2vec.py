"""Node2Vec biased walks (embedding/BiasedRandomWalk.cpp) contract tests."""

import itertools

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.node2vec import biased_random_walks


def test_walks_are_paths_and_deterministic(spark):
    edges = list(itertools.combinations(range(8), 2))[::2]
    g = from_edge_rows(spark, edges)
    w = biased_random_walks(g, p=1.0, q=1.0, walk_length=4, seed=5)
    rows = [(r["walk_id"], r["step"], r["node"]) for r in w.collect()]
    adj = set()
    for a, b in edges:
        adj.add((a, b))
        adj.add((b, a))
    by_walk = {}
    for wid, step, node in rows:
        by_walk.setdefault(wid, {})[step] = node
    for wid, steps in by_walk.items():
        seq = [steps[i] for i in sorted(steps)]
        assert seq[0] == wid  # walks_per_node=1 -> walk_id == start node
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in adj, f"walk {wid} used non-edge ({a},{b})"
    again = [(r["walk_id"], r["step"], r["node"])
             for r in biased_random_walks(g, p=1.0, q=1.0, walk_length=4,
                                          seed=5).collect()]
    assert sorted(rows) == sorted(again)


def test_high_p_avoids_backtracking(spark):
    # path graph: from interior state (t, v) the only non-backtrack move is
    # forward; with p huge the inverse-CDF pick lands on forward ~always
    g = from_edge_rows(spark, [(i, i + 1) for i in range(9)])
    w = biased_random_walks(g, p=1e6, q=1.0, walk_length=5, seed=11)
    by_walk = {}
    for r in w.collect():
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    backtracks = interior = 0
    for steps in by_walk.values():
        seq = [steps[i] for i in sorted(steps)]
        for i in range(2, len(seq)):
            prev, cur = seq[i - 2], seq[i - 1]
            if cur not in (0, 9):  # interior: a forward option exists
                interior += 1
                if seq[i] == prev:
                    backtracks += 1
    assert interior > 0
    assert backtracks == 0


def test_walks_truncate_at_dead_ends(spark):
    # directed chain kept directed: 2 -> 1 -> 0, node 0 is a dead end
    g = from_edge_rows(spark, [(2, 1), (1, 0)], directed=True)
    w = biased_random_walks(g, walk_length=5, seed=3)
    by_walk = {}
    for r in w.collect():
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["node"]))
    # walk from 0 stops immediately; from 1 after one hop; from 2 after two
    assert max(s for s, _ in by_walk[0]) == 0
    assert max(s for s, _ in by_walk[1]) == 1
    assert max(s for s, _ in by_walk[2]) == 2
