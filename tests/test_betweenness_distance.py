"""Betweenness + distance family vs sequential Brandes/BFS oracles
(reference semantics: Betweenness.cpp, Closeness.hpp:80-94,
HarmonicCloseness.cpp, Diameter.cpp)."""

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.betweenness import betweenness
from networkit_spark.operators.distance import (
    closeness,
    diameter_double_sweep,
    diameter_exact,
    effective_diameter,
    harmonic_closeness,
    multi_source_hops,
)
from networkit_spark.oracle import betweenness_oracle, harmonic_closeness_oracle

# path 0-1-2-3 with a triangle 3-4-5 and a pendant 6 off node 1
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5), (1, 6)]
N = 7


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def test_betweenness_matches_brandes(spark):
    g = from_edge_rows(spark, EDGES)
    got = _scores(betweenness(g))
    want = betweenness_oracle(N, [(u, v, 1.0) for u, v in EDGES] + [(v, u, 1.0) for u, v in EDGES])
    for i in range(N):
        assert got[i] == pytest.approx(want[i], abs=1e-9), i
    # path center 1 carries the most shortest paths
    assert got[1] > got[0] and got[1] > got[6]


def test_betweenness_star_closed_form(spark):
    # star: center bc = (n-1)(n-2) over ordered pairs (no halving,
    # Betweenness.cpp maximum() semantics via all-sources accumulation)
    n = 6
    g = from_edge_rows(spark, [(0, i) for i in range(1, n)])
    got = _scores(betweenness(g))
    assert got[0] == pytest.approx((n - 1) * (n - 2))
    assert all(got[i] == pytest.approx(0.0) for i in range(1, n))


def test_betweenness_sampled_and_normalized(spark):
    g = from_edge_rows(spark, EDGES)
    exact = _scores(betweenness(g))
    # full source set passed explicitly == exact
    sampled = _scores(betweenness(g, sources=list(range(N))))
    for i in range(N):
        assert sampled[i] == pytest.approx(exact[i])
    norm = _scores(betweenness(g, normalized=True))
    for i in range(N):
        assert norm[i] == pytest.approx(exact[i] / ((N - 1) * (N - 2)))


def test_betweenness_directed(spark):
    # directed path 0->1->2: only vertex 1 lies on a shortest path
    g = from_edge_rows(spark, [(0, 1), (1, 2)], directed=True)
    got = _scores(betweenness(g))
    assert got[0] == 0.0 and got[2] == 0.0
    assert got[1] == pytest.approx(1.0)


def test_harmonic_closeness(spark):
    g = from_edge_rows(spark, EDGES)
    got = _scores(harmonic_closeness(g))
    want = harmonic_closeness_oracle(
        N, [(u, v, 1.0) for u, v in EDGES] + [(v, u, 1.0) for u, v in EDGES]
    )
    for i in range(N):
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    normed = _scores(harmonic_closeness(g, normalized=True))
    assert normed[1] == pytest.approx(got[1] / (N - 1))


def test_closeness_variants(spark):
    g = from_edge_rows(spark, EDGES)
    hops = multi_source_hops(g)
    dist = {(r["s"], r["id"]): r["dist"] for r in hops.collect()}
    sums = {s: sum(d for (a, _), d in dist.items() if a == s) for s in range(N)}
    std = _scores(closeness(g, hops=hops))
    for i in range(N):
        assert std[i] == pytest.approx(1.0 / sums[i])
    gen = _scores(closeness(g, variant="generalized", hops=hops))
    for i in range(N):
        assert gen[i] == pytest.approx((N - 1) / sums[i] / (N - 1))
    # disconnected: standard on a 2-component graph scores per component
    g2 = from_edge_rows(spark, [(0, 1), (2, 3)])
    gen2 = _scores(closeness(g2, variant="generalized"))
    assert gen2[0] == pytest.approx(1.0 / 1.0 / 3.0)


def test_diameter_family(spark):
    g = from_edge_rows(spark, EDGES)
    assert diameter_exact(g) == 4  # 0 .. 4/5 via 1,2,3
    ds = diameter_double_sweep(g)
    assert ds <= 4 and ds >= 3  # double sweep is a lower bound
    assert effective_diameter(g, ratio=1.0) == 4
    assert effective_diameter(g, ratio=0.1) >= 1


def test_estimate_betweenness_sampled(spark):
    from networkit_spark.operators.betweenness import estimate_betweenness

    g = from_edge_rows(spark, EDGES)
    exact = _scores(betweenness(g))
    # full-size sample == exact (scale factor n/n = 1)
    est_full = _scores(estimate_betweenness(g, n_samples=N, seed=1))
    for i in range(N):
        assert est_full[i] == pytest.approx(exact[i])
    # deterministic in seed; partial sample preserves the dominant vertex
    a = _scores(estimate_betweenness(g, n_samples=4, seed=5))
    b = _scores(estimate_betweenness(g, n_samples=4, seed=5))
    assert a == b
    # exact has a 1/2 tie at 18.0 — the sampled argmax must land in that set
    top2 = sorted(exact, key=exact.get, reverse=True)[:2]
    assert max(a, key=a.get) in top2


# ---- ANF sketches (distance/NeighborhoodFunctionApproximation.cpp) --------


def test_anf_estimates_monotone_and_converge(spark):
    from networkit_spark.operators.anf import anf_estimates

    # path 0-1-2-3-4-5: diameter 5, connected
    g = from_edge_rows(spark, [(i, i + 1) for i in range(5)])
    est = anf_estimates(g, k=8, seed=3, max_h=6).collect()
    by_node = {}
    for r in est:
        by_node.setdefault(r["id"], []).append((r["h"], r["est"], r["finished"]))
    for v, rows in by_node.items():
        rows.sort()
        vals = [e for _, e, _ in rows]
        # masks are monotone under OR => estimates never decrease
        assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:])), (v, vals)
        # by h >= diameter every node holds the global OR => finished
        assert rows[-1][2] is True, (v, rows)
        # frozen thereafter: h=5 and h=6 estimates identical
        assert abs(rows[-1][1] - rows[-2][1]) < 1e-12


def test_effective_diameter_approx_bounds(spark):
    from networkit_spark.operators.anf import effective_diameter_approx

    g = from_edge_rows(spark, [(i, i + 1) for i in range(5)])
    got = effective_diameter_approx(g, ratio=1.0, k=8, seed=3, max_h=8).collect()
    val = got[0]["eff_diameter"]
    # with ratio=1.0 a node finishes no later than nodeFinished (== global
    # OR), which on a connected diameter-5 path is at most h=5; and no
    # earlier than h=1
    assert 1.0 <= val <= 5.0


def test_neighborhood_function_shape(spark):
    from networkit_spark.operators.anf import neighborhood_function_approx

    g = from_edge_rows(spark, [(i, i + 1) for i in range(5)])
    rows = neighborhood_function_approx(g, k=8, seed=3, max_h=6).collect()
    assert [r["h"] for r in rows] == [1, 2, 3, 4, 5, 6]
    nf = [r["nf"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(nf, nf[1:]))
    assert all(0.0 < r["hop_plot"] <= 1.0 for r in rows)


def test_sampled_closeness_estimator(spark):
    """On a connected fixture: all-pivot sampling equals exact normalized
    closeness; partial sampling is an unbiased-form estimate close to it."""
    from networkit_spark.operators.distance import closeness, sampled_closeness

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4), (2, 0)]
    n = 5
    g = from_edge_rows(spark, edges, num_nodes=n)
    # k = n pivots -> the estimator degenerates to exact normalized closeness
    est = {
        r["id"]: r["closeness_est"]
        for r in sampled_closeness(g, num_samples=n).collect()
    }
    exact = {
        r["id"]: r["score"]
        for r in closeness(g, normalized=True).collect()
    }
    for u in range(n):
        assert est[u] == pytest.approx(exact[u], abs=1e-12), u
    # small sample: positive everywhere on a connected graph, same scale
    est3 = {
        r["id"]: r["closeness_est"]
        for r in sampled_closeness(g, num_samples=3).collect()
    }
    for u in range(n):
        assert 0.2 < est3[u] <= 1.5, (u, est3[u])


def test_approx_betweenness_rk_matches_hash_replica(spark):
    """Engine RK sampled-path betweenness equals a hashlib/BFS
    transliteration of the identical derandomized sampling."""
    import hashlib
    from collections import defaultdict, deque

    from networkit_spark.operators.betweenness import approx_betweenness_rk

    UNIT = float(1 << 48)

    def h(sx):
        return int(hashlib.md5(sx.encode()).hexdigest()[:12], 16)

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
        (0, 6), (6, 3), (1, 7), (7, 4), (2, 8), (8, 9), (9, 5),
    ]
    n, r, D, seed = 10, 24, 6, 42
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def bfs(s):
        dist, sig = {s: 0}, {s: 1.0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= D:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sig[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        return dist, sig

    credits = defaultdict(int)
    cache = {}
    for i in range(r):
        s = h(f"{seed}:abs:{i}") % n
        t = (s + h(f"{seed}:abt:{i}") % (n - 1) + 1) % n
        if s not in cache:
            cache[s] = bfs(s)
        dist, sig = cache[s]
        if t not in dist or dist[t] < 1:
            continue
        cur, dd = t, dist[t]
        step = 0
        while dd > 1:
            step += 1
            preds = sorted(
                p for p in adj[cur] if dist.get(p) == dd - 1
            )
            tot = sum(sig[p] for p in preds)
            rd = h(f"{seed}:abp:{step}:{i}") / UNIT * tot
            cum = 0.0
            pick = None
            for p in preds:
                cum += sig[p]
                if cum > rd:
                    pick = p
                    break
            if pick is None:
                break
            credits[pick] += 1
            cur, dd = pick, dd - 1

    g = from_edge_rows(spark, edges, num_nodes=n)
    got = {
        row["id"]: row["score"]
        for row in approx_betweenness_rk(
            g, num_samples=r, max_depth=D, seed=seed
        ).collect()
    }
    for v in range(n):
        assert got[v] == pytest.approx(credits.get(v, 0) / r, abs=1e-12), v
    assert sum(got.values()) > 0


def test_kadabra_adaptive_certifies_star(spark):
    # star: center lies on every (leaf, leaf) shortest path; normalized
    # betweenness of the center = (k-1)k/(n(n-1)) over ordered pairs
    from networkit_spark.operators.betweenness import kadabra_betweenness

    k = 6
    rows = [(0, i, 1.0) for i in range(1, k + 1)]
    g = from_edge_rows(spark, rows, num_nodes=k + 1, weighted=True)
    out = kadabra_betweenness(g, eps=0.2, delta=0.1, batch=64, max_batches=8)
    got = {r["id"]: (r["score"], r["err"]) for r in out.collect()}
    n = k + 1
    exact_center = (k * (k - 1)) / (n * (n - 1))
    s, e = got[0]
    assert abs(s - exact_center) <= e + 1e-12  # certificate holds
    for leaf in range(1, k + 1):
        assert got[leaf][0] <= got[0][0]  # center dominates
    # deterministic: rerun identical
    out2 = kadabra_betweenness(g, eps=0.2, delta=0.1, batch=64, max_batches=8)
    assert {r["id"]: r["score"] for r in out2.collect()} == {
        i: s for i, (s, _) in got.items()
    }


def test_kadabra_err_shrinks_with_more_batches(spark):
    from networkit_spark.operators.betweenness import kadabra_betweenness

    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=5, weighted=True)
    loose = kadabra_betweenness(g, eps=10.0, delta=0.1, batch=16, max_batches=1)
    tight = kadabra_betweenness(g, eps=0.0, delta=0.1, batch=16, max_batches=6)
    e1 = max(r["err"] for r in loose.collect())
    e2 = max(r["err"] for r in tight.collect())
    assert e2 < e1


def test_approx_group_betweenness_star(spark):
    from networkit_spark.operators.betweenness import approx_group_betweenness

    k = 6
    rows = [(0, i, 1.0) for i in range(1, k + 1)]
    g = from_edge_rows(spark, rows, num_nodes=k + 1, weighted=True)
    out = approx_group_betweenness(g, k=2, num_samples=64).collect()
    assert out[0]["id"] == 0  # the hub covers every leaf-leaf path
    assert out[0]["coverage"] > 0.5
    # coverage is cumulative and non-decreasing
    covs = [r["coverage"] for r in out]
    assert covs == sorted(covs)
    # deterministic
    out2 = approx_group_betweenness(g, k=2, num_samples=64).collect()
    assert [(r["rank"], r["id"]) for r in out] == [(r["rank"], r["id"]) for r in out2]
