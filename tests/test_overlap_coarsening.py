"""HashingOverlapper (overlap/HashingOverlapper.cpp:15-81) against a
literal python transliteration of the C code, and MatchingCoarsening
(coarsening/MatchingCoarsening.cpp:17-57) contraction semantics."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.coarsening import matching_coarsening
from networkit_spark.operators.overlap import djb2_bytes, hashing_overlapper


# ---- djb2 transliteration (HashingOverlapper.cpp:19-27) --------------------


def djb2_ref(cid: int) -> int:
    """Byte loop over the little-endian int64, stop at first zero byte."""
    h = 5381
    for i in range(8):
        c = (cid >> (8 * i)) & 0xFF
        if c == 0:
            break
        h = (h * 33 + c) & 0xFFFFFFFFFFFFFFFF
    return h


def overlap2_ref(first: int, second: int) -> int:
    key = (((first ^ 0xFFFF) << 16) | (second ^ 0xFFFF)) & 0xFFFFFFFF
    return djb2_ref(key)


def overlap_many_ref(labels: list[int]) -> int:
    core = 0
    for c, lab in enumerate(labels):
        key = ((c + 2) * lab) & 0xFFFFFFFF
        core = (core + (djb2_ref(key) & 0xFFFF)) & 0xFFFFFFFF
    return core


def test_djb2_vectorized_matches_transliteration():
    vals = [0, 1, 5, 255, 256, 0x100, 0x1FF, 65535, 65536, 2**31,
            2**32 - 1, 2**40 + 7, 2**63, 2**64 - 1]
    got = djb2_bytes(np.array(vals, dtype=np.uint64))
    for v, g in zip(vals, got):
        assert int(g) == djb2_ref(v), hex(v)


def _cells(rows):
    """Group structure: frozenset of frozensets of ids sharing a label."""
    by = {}
    for r in rows:
        by.setdefault(r["label"], set()).add(r["id"])
    return frozenset(frozenset(s) for s in by.values())


def _ref_cells(hashes: dict[int, int]):
    by = {}
    for i, h in hashes.items():
        by.setdefault(h, set()).add(i)
    return frozenset(frozenset(s) for s in by.values())


def test_overlap_two_partitions_matches_reference(spark):
    # 8 nodes; first splits {0-3}/{4-7}, second odd/even
    first = {i: (0 if i < 4 else 4) for i in range(8)}
    second = {i: i % 2 for i in range(8)}
    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    fa = spark.createDataFrame(sorted(first.items()), "id long, label long")
    fb = spark.createDataFrame(sorted(second.items()), "id long, label long")
    got = hashing_overlapper(verts, [fa, fb]).collect()
    ref = {i: overlap2_ref(first[i], second[i]) for i in range(8)}
    assert _cells(got) == _ref_cells(ref)
    # canonical labels are min member ids
    for r in got:
        assert r["label"] <= r["id"]


def test_overlap_three_partitions_matches_reference(spark):
    parts = [
        {i: i % 2 for i in range(9)},
        {i: i // 3 for i in range(9)},
        {i: (0 if i in (0, 8) else 1) for i in range(9)},
    ]
    verts = spark.createDataFrame([(i,) for i in range(9)], "id long")
    dfs = [
        spark.createDataFrame(sorted(p.items()), "id long, label long")
        for p in parts
    ]
    got = hashing_overlapper(verts, dfs).collect()
    ref = {i: overlap_many_ref([p[i] for p in parts]) for i in range(9)}
    assert _cells(got) == _ref_cells(ref)


def test_overlap_degenerate_cases(spark):
    verts = spark.createDataFrame([(i,) for i in range(5)], "id long")
    one = spark.createDataFrame(
        [(i, i % 2) for i in range(5)], "id long, label long"
    )
    # k == 0: the reference's ERROR path returns the 1-clustering
    got0 = hashing_overlapper(verts, []).collect()
    assert {r["label"] for r in got0} == {0} and len(got0) == 5
    # k == 1: the clustering itself (canonicalized)
    got1 = {r["id"]: r["label"] for r in hashing_overlapper(verts, [one]).collect()}
    assert got1 == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}


# ---- MatchingCoarsening ----------------------------------------------------


def test_matching_coarsening_path_fixture(spark):
    # P4: 0-1 (w 2), 1-2 (w 5), 2-3 (w 3); matching {(0,1), (2,3)}
    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 5.0), (2, 3, 3.0)], weighted=True)
    m = spark.createDataFrame([(0, 1, 2.0), (2, 3, 3.0)], "u long, v long, weight double")
    coarse, f2c = matching_coarsening(g, m)
    assert coarse.num_nodes() == 2  # n - |M| = 4 - 2
    mapping = {r["id"]: r["coarse_id"] for r in f2c.collect()}
    # reference scan order: carried vertices 0 and 2 -> coarse ids 0 and 1
    assert mapping == {0: 0, 1: 0, 2: 1, 3: 1}
    ew = {
        (r["src"], r["dst"]): r["weight"]
        for r in coarse.edges.filter("src <= dst").collect()
    }
    # matched edges land on self-loops; the cross edge keeps its weight
    assert ew[(0, 0)] == 2.0 and ew[(1, 1)] == 3.0 and ew[(0, 1)] == 5.0

    nl, _ = matching_coarsening(g, m, no_self_loops=True)
    assert {
        (r["src"], r["dst"]) for r in nl.edges.filter("src <= dst").collect()
    } == {(0, 1)}


def test_matching_coarsening_with_real_matching(spark):
    from networkit_spark.operators.matching import local_max_matching

    edges = [
        (0, 1, 4.0), (1, 2, 3.0), (2, 3, 6.0), (3, 4, 1.0),
        (4, 5, 5.0), (5, 0, 2.0), (1, 4, 2.5),
    ]
    g = from_edge_rows(spark, edges, weighted=True)
    m = local_max_matching(g)
    n_matched = m.count()
    coarse, f2c = matching_coarsening(g, m)
    assert coarse.num_nodes() == 6 - n_matched
    # weight conservation: every fine edge's weight survives somewhere
    fine_total = sum(w for _, _, w in edges)
    coarse_rows = coarse.edges.filter("src <= dst").collect()
    assert abs(sum(r["weight"] for r in coarse_rows) - fine_total) < 1e-9
    # the map is total and lands in the coarse id range
    ids = {r["coarse_id"] for r in f2c.collect()}
    assert ids == set(range(coarse.num_nodes()))
