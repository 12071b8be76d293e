"""Label-propagation parity tests (FIXTURES.md §2.5, §2.6)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.labelprop import (
    label_propagation,
    stable_partition_fraction,
)
from networkit_spark.oracle import lp_oracle


def _labels_array(df, n):
    out = np.zeros(n, np.int64)
    for r in df.collect():
        out[r["id"]] = r["label"]
    return out


def _sym(rows):
    return [(a, b, w[0] if w else 1.0) for a, b, *w in rows] + [
        (b, a, w[0] if w else 1.0) for a, b, *w in rows if a != b
    ]


def test_four_cycle_single_sweep_tiebreak(spark):
    # FIXTURES §2.6: after one synchronous sweep from singletons, each node
    # adopts min(neighbor labels) under (desc weight, asc label)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    got = _labels_array(label_propagation(g, max_iterations=1, theta=0), 4)
    assert got.tolist() == [1, 0, 1, 0]


def test_weighted_tiebreak(spark):
    # node 2 has neighbors 0 (w=1) and 1 (w=5): heavier label wins even
    # though label 0 < label 1 (MPLP.cpp:122-128)
    g = from_edge_rows(spark, [(0, 2, 1.0), (1, 2, 5.0)])
    got = _labels_array(label_propagation(g, max_iterations=1, theta=0), 3)
    assert got[2] == 1


def test_planted_cliques_exact_recovery(spark):
    # FIXTURES §2.5: k disjoint cliques -> exactly k communities == the
    # planted blocks after min-member canonicalization
    rng = np.random.default_rng(42)
    n, k = 100, 3
    member = rng.integers(0, k, n)
    rows = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if member[i] == member[j]
    ]
    g = from_edge_rows(spark, rows, num_nodes=n)
    labels = label_propagation(g, theta=0)
    arr = _labels_array(labels, n)
    comms = {}
    for i in range(n):
        comms.setdefault(arr[i], set()).add(i)
    planted = {}
    for i in range(n):
        planted.setdefault(int(member[i]), set()).add(i)
    assert set(map(frozenset, comms.values())) == set(map(frozenset, planted.values()))


def test_matches_numpy_oracle_random(spark):
    rng = np.random.default_rng(7)
    n = 120
    rows = list(
        {
            (min(int(a), int(b)), max(int(a), int(b)))
            for a, b in rng.integers(0, n, size=(300, 2))
            if a != b
        }
    )
    weighted = [(a, b, float(1 + ((a * 7 + b) % 5))) for a, b in rows]
    g = from_edge_rows(spark, weighted, num_nodes=n)
    for iters in (1, 2, 5):
        got = _labels_array(
            label_propagation(g, max_iterations=iters, theta=0), n
        )
        want = lp_oracle(n, _sym(weighted), max_iterations=iters, theta=0)
        assert np.array_equal(got, want), f"divergence at {iters} sweeps"


def test_isolated_stay_singleton(spark):
    g = from_edge_rows(spark, [(0, 1)], num_nodes=4)
    got = _labels_array(label_propagation(g, theta=0, max_iterations=10), 4)
    assert got[2] == 2 and got[3] == 3


def test_stable_partition_fraction(spark):
    # two disjoint triangles labeled by their components: fully stable
    rows = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = from_edge_rows(spark, rows)
    labels = label_propagation(g, theta=0)
    assert stable_partition_fraction(g, labels) == 1.0


def test_lp_degree_ordered_two_cliques(spark):
    """LPDegreeOrdered.cpp:26-87 — the async degree-ordered sweep settles
    with each clique one community; at convergence every node's label is
    a dominant label of its neighborhood."""
    import itertools

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.labelprop import lp_degree_ordered

    a = list(itertools.combinations(range(5), 2))
    b = [(u + 5, v + 5) for u, v in a]
    g = from_edge_rows(spark, a + b + [(4, 5)], num_nodes=10)
    lab = {r["id"]: r["label"] for r in lp_degree_ordered(g).collect()}
    assert len({lab[i] for i in range(5)}) == 1
    assert len({lab[i] for i in range(5, 10)}) == 1
    assert lab[0] != lab[5]
    # stability: every node's label dominates its neighborhood
    adj = {}
    for u, v in a + b + [(4, 5)]:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    for v, nbrs in adj.items():
        counts = {}
        for w in nbrs:
            counts[lab[w]] = counts.get(lab[w], 0) + 1
        assert counts[lab[v]] == max(counts.values()), v
    # determinism
    again = {r["id"]: r["label"] for r in lp_degree_ordered(g).collect()}
    assert lab == again


def test_label_propagation_self_loop_inertia(spark):
    # PLP.cpp:83-86 forNeighborsOf visits self-loops: the loop's weight
    # backs the node's own current label. Node 1 has a weight-10 loop and
    # one weight-1 neighbor 0; with the loop counted, 1 keeps its label
    # (10 > 1) — the old loop-filtering port would have flipped it to 0's.
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.labelprop import label_propagation

    g = from_edge_rows(
        spark, [(0, 1, 1.0), (1, 1, 10.0)], num_nodes=2, weighted=True
    )
    got = {r["id"]: r["label"] for r in
           label_propagation(g, theta=-1, max_iterations=4).collect()}
    assert got[1] == 1
    # node 0's only neighbor is 1, so it adopts 1's label
    assert got[0] == 1


def test_stable_partition_strict_dominance(spark):
    # StablePartitionNodes.cpp:60-68: a TIE with another label marks the
    # node unstable even when the smallest-label tie-break would have
    # handed the plurality win to the own label.
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.labelprop import stable_partition_fraction

    # node 1 (label 1): neighbors 0 (label 1, w=1) and 2 (label 9, w=1)
    # -> own weight 1 ties label 9's weight 1 -> UNSTABLE
    g = from_edge_rows(spark, [(0, 1), (1, 2)], num_nodes=3)
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 9)], "id long, label long"
    )
    # 0: own label weight 1 (neighbor 1 has label 1), no others -> stable
    # 1: tie -> unstable;  2: own weight 0 -> unstable
    assert abs(stable_partition_fraction(g, labels) - 1 / 3) < 1e-12
