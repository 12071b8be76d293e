"""SCC coloring algorithm vs mutual-reachability oracle (reference
semantics: components/StronglyConnectedComponents.cpp, labels
canonicalized to min member id)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.scc import strongly_connected_components


def scc_oracle(n: int, edges) -> dict[int, int]:
    """Min-member SCC labels via boolean transitive closure."""
    reach = np.eye(n, dtype=bool)
    for u, v in edges:
        reach[u, v] = True
    for _ in range(n):
        new = reach @ reach | reach
        if (new == reach).all():
            break
        reach = new
    mutual = reach & reach.T
    return {v: int(np.nonzero(mutual[v])[0].min()) for v in range(n)}


def _check(spark, edges, n):
    g = from_edge_rows(spark, edges, directed=True, num_nodes=n)
    got = {r["id"]: r["label"] for r in strongly_connected_components(g).collect()}
    assert got == scc_oracle(n, edges)


def test_two_cycles_and_bridge(spark):
    # cycle {0,1,2} -> cycle {3,4}, plus isolated 5
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)], 6)


def test_dag_all_singletons(spark):
    _check(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], 4)


def test_chain_of_sccs(spark):
    # three 2-cycles chained — exercises multiple outer rounds
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4)]
    _check(spark, edges, 6)


def test_giant_cycle(spark):
    n = 12
    _check(spark, [(i, (i + 1) % n) for i in range(n)], n)
