"""Connected-components parity tests (FIXTURES.md §2.1)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.components import (
    canonicalize_labels,
    component_sizes,
    connected_components,
    extract_largest_component,
    num_components,
)
from networkit_spark.oracle import cc_oracle

# 20-node / 5-component fixture from
# networkit/cpp/components/test/ConnectedComponentsGTest.cpp:32-66
EDGES_20 = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]


def _labels_array(df, n):
    out = np.zeros(n, np.int64)
    for r in df.collect():
        out[r["id"]] = r["label"]
    return out


def test_20node_5components(spark):
    g = from_edge_rows(spark, EDGES_20, num_nodes=20)
    labels = connected_components(g)
    assert num_components(labels) == 5
    arr = _labels_array(labels, 20)
    # hash-min labels == min member id per component
    assert sorted(set(arr.tolist())) == [0, 3, 10, 13, 15]
    assert arr[0] == arr[19]
    assert arr[3] == arr[7]
    assert arr[15] == 15  # isolated


def test_matches_oracle_random(spark):
    rng = np.random.default_rng(42)
    n = 300
    rows = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(400, 2)) if a != b]
    g = from_edge_rows(spark, rows, num_nodes=n)
    got = _labels_array(connected_components(g), n)
    sym = [(a, b, 1.0) for a, b in rows] + [(b, a, 1.0) for a, b in rows]
    want = cc_oracle(n, sym)
    assert np.array_equal(got, want)


def test_directed_treated_weakly(spark):
    g = from_edge_rows(spark, [(0, 1), (2, 1), (3, 4)], directed=True, num_nodes=5)
    labels = connected_components(g)
    arr = _labels_array(labels, 5)
    assert arr[0] == arr[1] == arr[2] == 0
    assert arr[3] == arr[4] == 3


def test_component_sizes_and_largest(spark):
    g = from_edge_rows(spark, EDGES_20, num_nodes=20)
    labels = connected_components(g)
    sizes = {r["label"]: r["size"] for r in component_sizes(labels).collect()}
    assert sizes == {0: 7, 3: 5, 10: 5, 13: 2, 15: 1}
    lcc = extract_largest_component(g, labels)
    assert lcc.num_nodes() == 7
    assert lcc.num_edges() == 6


def test_canonicalize_is_identity_for_hashmin(spark):
    g = from_edge_rows(spark, EDGES_20, num_nodes=20)
    labels = connected_components(g)
    canon = canonicalize_labels(labels)
    a = {(r["id"], r["label"]) for r in labels.collect()}
    b = {(r["id"], r["label"]) for r in canon.collect()}
    assert a == b
