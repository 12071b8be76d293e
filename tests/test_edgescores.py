"""Edge-score combinators vs brute-force referees (edgescores/ +
sparsification/ utility tier; see operators/edgescores.py citations)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.edgescores import (
    edge_score_as_weight,
    edge_score_blender,
    edge_score_normalizer,
    geometric_mean_score,
    multiscale_score,
    prefix_jaccard_score,
)


def _scores_df(spark, rows):
    return spark.createDataFrame(rows, "u long, v long, score double")


def _rand_scores(seed, n=10, m=18):
    rng = np.random.RandomState(seed)
    es = {}
    while len(es) < m:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es[(min(a, b), max(a, b))] = float(rng.randint(1, 9))
    return [(u, v, w) for (u, v), w in sorted(es.items())]


def test_geometric_mean_score(spark):
    rows = _rand_scores(1)
    out = {(r["u"], r["v"]): r["gm_score"]
           for r in geometric_mean_score(_scores_df(spark, rows)).collect()}
    ns = {}
    for u, v, w in rows:
        ns[u] = ns.get(u, 0.0) + w
        ns[v] = ns.get(v, 0.0) + w
    for u, v, w in rows:
        want = w / np.sqrt(ns[u] * ns[v])
        assert abs(out[(u, v)] - want) < 1e-12


def test_normalizer_and_invert(spark):
    rows = _rand_scores(2)
    df = _scores_df(spark, rows)
    out = {(r["u"], r["v"]): r["norm_score"]
           for r in edge_score_normalizer(df, 0.0, 1.0).collect()}
    vals = [w for _, _, w in rows]
    lo, hi = min(vals), max(vals)
    for u, v, w in rows:
        assert abs(out[(u, v)] - (w - lo) / (hi - lo)) < 1e-12
    inv = {(r["u"], r["v"]): r["norm_score"]
           for r in edge_score_normalizer(df, 0.0, 1.0, invert=True).collect()}
    for u, v, w in rows:
        assert abs(inv[(u, v)] - (1.0 - (w - lo) / (hi - lo))) < 1e-12


def test_blender_and_as_weight(spark):
    rows = _rand_scores(3)
    df = _scores_df(spark, rows)
    sel = df.selectExpr("u", "v", "score > 4 AS sel")
    doubled = df.selectExpr("u", "v", "score * 2 AS score")
    out = {(r["u"], r["v"]): r["score"]
           for r in edge_score_blender(sel, doubled, df).collect()}
    for u, v, w in rows:
        assert out[(u, v)] == (2 * w if w > 4 else w)

    from networkit_spark.graph import from_edge_rows

    g = from_edge_rows(spark, rows, weighted=True)
    g2 = edge_score_as_weight(g, df, squared=True, offset=1.0, factor=0.5)
    got = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    for u, v, w in rows:
        assert abs(got[(u, v)] - (1.0 + 0.5 * w * w)) < 1e-5
        assert abs(got[(v, u)] - (1.0 + 0.5 * w * w)) < 1e-5


def test_multiscale_score(spark):
    rows = _rand_scores(4)
    out = {(r["u"], r["v"]): r["ms_score"]
           for r in multiscale_score(_scores_df(spark, rows)).collect()}
    ns, dg = {}, {}
    for u, v, w in rows:
        ns[u] = ns.get(u, 0.0) + w
        ns[v] = ns.get(v, 0.0) + w
        dg[u] = dg.get(u, 0) + 1
        dg[v] = dg.get(v, 0) + 1
    for u, v, w in rows:
        pu = 1.0 - (1.0 - w / ns[u]) ** (dg[u] - 1)
        pv = 1.0 - (1.0 - w / ns[v]) ** (dg[v] - 1)
        assert abs(out[(u, v)] - max(pu, pv)) < 1e-12


def _prefix_jaccard_ref(rows):
    adj = {}
    for u, v, w in rows:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    # dense rank per node: rank = count of strictly greater attrs
    rank = {}
    for node, lst in adj.items():
        for nbr, w in lst:
            rank[(node, nbr)] = sum(1 for _, w2 in lst if w2 > w)
    out = {}
    for u, v, w in rows:
        au = {n: rank[(u, n)] for n, _ in adj[u] if n != v}
        av = {n: rank[(v, n)] for n, _ in adj[v] if n != u}
        best = 0.0
        ranks = sorted(set(au.values()) | set(av.values()))
        for r in ranks:
            A = {n for n, rr in au.items() if rr <= r}
            B = {n for n, rr in av.items() if rr <= r}
            if A | B:
                best = max(best, len(A & B) / len(A | B))
        out[(u, v)] = best
    return out


def test_prefix_jaccard_matches_referee(spark):
    for seed in (5, 6):
        rows = _rand_scores(seed, n=9, m=16)
        out = {(r["u"], r["v"]): r["pj_score"]
               for r in prefix_jaccard_score(_scores_df(spark, rows)).collect()}
        want = _prefix_jaccard_ref(rows)
        for k in want:
            assert abs(out[k] - want[k]) < 1e-12, (seed, k, out[k], want[k])


def test_quadrangle_score_trivial_square(spark):
    from networkit_spark.operators.edgescores import quadrangle_edge_score

    # ChibaNishizekiQuadrangleEdgeScoreGTest.testQuadrangleCountsTrivial
    g = from_edge_rows(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = {(r["u"], r["v"]): r["quadrangles"] for r in quadrangle_edge_score(g).collect()}
    assert got == {(0, 1): 1, (0, 2): 1, (1, 3): 1, (2, 3): 1}


def test_quadrangle_score_simple_fixture(spark):
    from networkit_spark.operators.edgescores import quadrangle_edge_score

    # ChibaNishizekiQuadrangleEdgeScoreGTest.testQuadrangleCountsSimple
    g = from_edge_rows(
        spark,
        [(0, 1), (0, 3), (0, 4), (0, 6), (1, 2), (1, 3), (2, 3), (3, 5), (3, 6), (4, 5)],
    )
    got = {(r["u"], r["v"]): r["quadrangles"] for r in quadrangle_edge_score(g).collect()}
    assert got == {
        (0, 1): 2, (0, 3): 2, (0, 4): 1, (0, 6): 1, (1, 2): 1,
        (1, 3): 1, (2, 3): 1, (3, 5): 1, (3, 6): 1, (4, 5): 1,
    }


def _md5_tb(u, v, seed=42, n=12):
    import hashlib

    return int(hashlib.md5(f"{seed}:lin:{u}:{v}".encode()).hexdigest()[:n], 16)


def test_linearizer_matches_referee(spark):
    from networkit_spark.operators.edgescores import edge_score_linearizer

    # duplicate scores guaranteed (18 edges, 8 distinct weights) so the
    # md5 tiebreak path is exercised, both orderings
    rows = _rand_scores(7)
    df = _scores_df(spark, rows)
    m = len(rows)
    fwd = {(r["u"], r["v"]): r["lin_score"]
           for r in edge_score_linearizer(df).collect()}
    order = sorted(rows, key=lambda t: (t[2], _md5_tb(t[0], t[1]), t[0], t[1]))
    for i, (u, v, _w) in enumerate(order):
        assert abs(fwd[(u, v)] - i / (m - 1)) < 1e-12
    inv = {(r["u"], r["v"]): r["lin_score"]
           for r in edge_score_linearizer(df, inverse=True).collect()}
    order = sorted(rows, key=lambda t: (-t[2], -_md5_tb(t[0], t[1]), t[0], t[1]))
    for i, (u, v, _w) in enumerate(order):
        assert abs(inv[(u, v)] - i / (m - 1)) < 1e-12


def test_linearizer_single_edge(spark):
    from networkit_spark.operators.edgescores import edge_score_linearizer

    # EdgeScoreLinearizer m==1 special case -> 0.5
    df = _scores_df(spark, [(0, 1, 3.0)])
    assert edge_score_linearizer(df).collect()[0]["lin_score"] == 0.5
