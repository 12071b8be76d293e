"""PivotMDS (viz/PivotMDS.cpp) vs an independent dense-numpy replica of
the reference algorithm (heapq Dijkstra, dense double-centering, explicit
power iteration) on fixture graphs."""

import hashlib
import heapq

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.layout import pivot_mds

GRID = [
    (r * 4 + c, r * 4 + c + 1)
    for r in range(4)
    for c in range(3)
] + [
    (r * 4 + c, (r + 1) * 4 + c)
    for r in range(3)
    for c in range(4)
]


def _md5long(t: str) -> int:
    return int.from_bytes(hashlib.md5(t.encode()).digest()[:6], "big")


def _ref_pivot_mds(rows, n, dim, k, seed=42, weighted=False):
    """Dense replica of PivotMDS.cpp:22-133 with the engine's documented
    derandomizations (md5-rank pivots, md5 start vector, canonical sign)."""
    adj = [[] for _ in range(n)]
    for u, v, *w in rows:
        wt = float(w[0]) if (w and weighted) else 1.0
        adj[u].append((v, wt))
        adj[v].append((u, wt))
    pivots = sorted(range(n), key=lambda i: (_md5long(f"{seed}:pmds:{i}"), i))[:k]

    D = np.full((n, k), np.inf)
    for j, s in enumerate(pivots):
        dist = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, np.inf):
                continue
            for v, wt in adj[u]:
                nd = d + wt
                if nd < dist.get(v, np.inf):
                    dist[v] = nd
                    heapq.heappush(pq, (nd, v))
        for v, d in dist.items():
            D[v, j] = d

    present = np.isfinite(D)
    Dz = np.where(present, D, 0.0)
    row_mean = Dz.sum(axis=1) / k
    col_mean = Dz.sum(axis=0) / n
    grand = row_mean.sum() / (2.0 * n) + col_mean.sum() / (2.0 * k)
    C = np.where(
        present, Dz - row_mean[:, None] - col_mean[None, :] + grand, 0.0
    )

    CC = C.T @ C
    coords = np.zeros((n, dim))
    for d in range(dim):
        v = np.array(
            [_md5long(f"{seed}:pmds:d{d}:{j}") / 2.0**48 - 0.5 for j in range(k)]
        )
        it = 0
        while True:
            old = v
            v = CC @ old
            v = v / (np.linalg.norm(v) or 1.0)
            it += 1
            if np.linalg.norm(v - old) <= 1e-6 or it >= 1500:
                break
        sq = float(v @ v) or 1.0
        lam = float((CC @ v) @ v) / sq
        CC = CC - (lam / sq) * np.outer(v, v)
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        coords[:, d] = C @ v
    return coords


def _engine_coords(spark, rows, n, dim=2, k=4, weighted=False):
    g = from_edge_rows(spark, rows, weighted=weighted, num_nodes=n)
    out = pivot_mds(g, dim=dim, num_pivots=k).collect()
    got = np.zeros((n, dim))
    for r in out:
        for d in range(dim):
            got[r["id"], d] = r[f"x{d}"]
    assert len(out) == n
    return got


def test_pivot_mds_matches_replica_grid(spark):
    want = _ref_pivot_mds(GRID, 16, dim=2, k=4)
    got = _engine_coords(spark, GRID, 16, dim=2, k=4)
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_pivot_mds_weighted_path(spark):
    rows = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 4.0), (3, 0, 1.0), (1, 3, 3.0)]
    want = _ref_pivot_mds(rows, 4, dim=2, k=3, weighted=True)
    got = _engine_coords(spark, rows, 4, dim=2, k=3, weighted=True)
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_pivot_mds_disconnected_pairs_stay_zero(spark):
    # two components: pivots land by md5 rank; unreached (node, pivot)
    # pairs stay exact zeros in C (PivotMDS.cpp:38-47) — the layout must
    # still emit one row per node with finite coordinates
    rows = [(0, 1), (1, 2), (3, 4)]
    want = _ref_pivot_mds(rows, 5, dim=2, k=3)
    got = _engine_coords(spark, rows, 5, dim=2, k=3)
    assert np.isfinite(got).all()
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()


def test_pivot_mds_recovers_grid_geometry(spark):
    # layout sanity (VizGTest role): on the 4x4 grid, graph-adjacent nodes
    # must sit closer in the embedding than the farthest pair does
    got = _engine_coords(spark, GRID, 16, dim=2, k=8)
    dmax = max(
        np.linalg.norm(got[a] - got[b]) for a in range(16) for b in range(16)
    )
    for u, v in GRID:
        assert np.linalg.norm(got[u] - got[v]) < 0.75 * dmax


def test_postscript_writer_roundtrip_structure(spark, tmp_path):
    # VizGTest::testPostscriptWriterOnRandomGraph role: layout + write,
    # then assert the EPS structure (header, macro block, m edge strokes,
    # n filled dots, coordinates inside the 1020-box)
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import write_postscript

    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = from_edge_rows(spark, rows, weighted=False)
    coords = pivot_mds(g, dim=2, num_pivots=3)
    lab = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 7), (3, 7)], "id long, label long"
    )
    p = str(tmp_path / "g.eps")
    write_postscript(g, coords, p, clustering=lab)
    text = open(p).read().splitlines()
    assert text[0] == "%!PS-Adobe-1.0"
    assert text[2] == "%%BoundingBox: 0.000 0.000 1020.000 1020.000"
    edge_lines = [l for l in text if " m " in l and l.endswith("l s")]
    dot_lines = [l for l in text if l.endswith("a s")]
    assert len(edge_lines) == 5 and len(dot_lines) == 4
    # intra-cluster edge (0,1) red (color 0), (2,3) color 7; (0,2) grey
    assert any(l.startswith("1.000 0.000 0.000 c ") for l in edge_lines)
    assert any(l.startswith("0.000 0.500 1.000 c ") for l in edge_lines)
    assert any(l.startswith("0.80 0.80 0.80 c 1.0 w ") for l in edge_lines)
    for l in dot_lines:  # every dot inside the canvas
        px, py = map(float, l.split()[5:7])
        assert 0.0 <= px <= 1020.0 and 0.0 <= py <= 1020.0
    assert text[-1] == "grestore"


def test_postscript_writer_torus_wraparound(spark, tmp_path):
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import write_postscript

    # two points at opposite box corners: the torus writer must wrap the
    # connecting edge (|delta| > 500 -> shifted by 1000)
    rows = [(0, 1)]
    g = from_edge_rows(spark, rows, weighted=False)
    coords = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 10.0, 10.0)], "id long, x double, y double"
    )
    p = str(tmp_path / "t.eps")
    write_postscript(g, coords, p, torus=True)
    text = open(p).read().splitlines()
    assert text[0] == "%!PS-Adobe-3.0 EPSF-3.0"
    (edge,) = [l for l in text if " m " in l and l.endswith("l s")]
    toks = edge.split()
    sx, sy, ex, ey = float(toks[5]), float(toks[6]), float(toks[8]), float(toks[9])
    assert (sx, sy) == (0.0, 0.0)
    assert (ex, ey) == (20.0, 20.0)  # 1020 - 1000 wrap on both axes


def test_maxent_stress_improves_stress_over_random_start(spark):
    # MaxentStressGTest bench role: layout the grid from the PivotMDS
    # seed (benchMaxentStressCoordinatesLAMG flow) and assert the
    # annealed solve reduces full stress + distance errors vs the seed
    from networkit_spark.operators.layout import (
        full_stress_measure,
        ldme,
        maxent_stress,
        mean_distance_error,
        scale_layout,
    )

    g = from_edge_rows(spark, GRID, weighted=False)
    seedc = pivot_mds(g, dim=2, num_pivots=6)
    out, stats = maxent_stress(g, dim=2, k=1, coords=seedc, fast_computation=True)
    assert stats["solves"] >= 1 and stats["q"] == 0.0
    got = {r["id"]: (r["x0"], r["x1"]) for r in out.collect()}
    assert len(got) == 16
    assert all(np.isfinite(v).all() for v in map(np.array, got.values()))

    scaled0 = scale_layout(g, seedc, k=1)
    scaled1 = scale_layout(g, out, k=1)
    fs0 = full_stress_measure(g, scaled0, k=1)
    fs1 = full_stress_measure(g, scaled1, k=1)
    assert fs1 < fs0, (fs1, fs0)
    assert mean_distance_error(g, out, k=1) < mean_distance_error(g, seedc, k=1)
    assert ldme(g, out, k=1) < ldme(g, seedc, k=1)


def test_maxent_stress_rejects_disconnected(spark):
    import pytest

    from networkit_spark.operators.layout import maxent_stress

    g = from_edge_rows(spark, [(0, 1), (2, 3)], weighted=False)
    with pytest.raises(ValueError):
        maxent_stress(g, dim=2, k=1)


def test_known_distances_khop(spark):
    from networkit_spark.operators.layout import known_distances

    # path 0-1-2-3: k=2 adds the hop-2 ring at distance 2.0
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], weighted=False)
    s = {(r["u"], r["v"]): r["d"] for r in known_distances(g, k=2).collect()}
    assert s[(0, 1)] == 1.0 and s[(1, 0)] == 1.0
    assert s[(0, 2)] == 2.0 and s[(3, 1)] == 2.0
    assert (0, 3) not in s

    # weighted: direct neighbors at edge weight; hop-2 at min-plus weight
    gw = from_edge_rows(spark, [(0, 1, 3.0), (1, 2, 5.0)], weighted=True)
    sw = {(r["u"], r["v"]): r["d"] for r in known_distances(gw, k=2).collect()}
    assert sw[(0, 1)] == 3.0 and sw[(0, 2)] == 8.0


def test_maxent_stress_q_autoset_for_star(spark):
    # star: 4/5 nodes have degree 1 -> q auto-sets to 0.8
    from networkit_spark.operators.layout import maxent_stress

    g = from_edge_rows(spark, [(0, 1), (0, 2), (0, 3), (0, 4)], weighted=False)
    out, stats = maxent_stress(
        g, dim=2, k=1, fast_computation=True, max_solves_per_alpha=10
    )
    assert stats["q"] == 0.8
    assert out.count() == 5


def test_maxent_stress_q_autoset_uses_graph_degree_at_k2(spark):
    # regression: the q rule counted degree within the known-distance set
    # S — at k=2 leaf-leaf 2-hop pairs push every leaf's S-degree past 1,
    # so the 0.8 rule never fired; the reference counts GRAPH degree
    # (MaxentStress.cpp:487-495)
    from networkit_spark.operators.layout import maxent_stress

    g = from_edge_rows(
        spark, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)], weighted=False
    )
    _, stats = maxent_stress(
        g, dim=2, k=2, fast_computation=True, max_solves_per_alpha=5
    )
    assert stats["q"] == 0.8
