import pytest
"""PageRankNibble / ApproximatePageRank (scd/) contract tests."""

import itertools

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.scd import approximate_pagerank, pagerank_nibble


def barbell(spark):
    # two 5-cliques bridged by a single edge (4,5)
    a = list(itertools.combinations(range(5), 2))
    b = list(itertools.combinations(range(5, 10), 2))
    return from_edge_rows(spark, a + b + [(4, 5)])


def test_apr_mass_conservation(spark):
    g = barbell(spark)
    pr = approximate_pagerank(g, seeds=[0], alpha=0.15, eps=0.0, max_rounds=6)
    rows = pr.collect()
    total = sum(r["p"] + r["res"] for r in rows)
    # push conserves mass on loop-free graphs (ApproximatePageRank.cpp:25-44)
    assert abs(total - 1.0) < 1e-9
    assert all(r["p"] >= 0 and r["res"] >= 0 for r in rows)


def test_apr_eps_terminates_locally(spark):
    g = barbell(spark)
    pr = approximate_pagerank(g, seeds=[0], alpha=0.15, eps=1e-3, max_rounds=50)
    rows = {r["id"]: r for r in pr.collect()}
    # termination contract: no node still pushable (r < eps * vol)
    deg = {r["id"]: r["wdeg"] for r in g.degrees().collect()}
    for v, r in rows.items():
        assert r["res"] < 1e-3 * deg[v] + 1e-12, (v, r["res"], deg[v])


def test_pagerank_nibble_recovers_clique(spark):
    g = barbell(spark)
    got = [r["id"] for r in pagerank_nibble(g, seeds=[0], alpha=0.15,
                                            eps=0.0, max_rounds=8).collect()]
    # the best-conductance sweep from a clique-A seed is exactly clique A
    assert got == [0, 1, 2, 3, 4]


# ---- SEIR (simulation/EpidemicSimulationSEIR.cpp) --------------------------


def test_seir_deterministic_wave(spark):
    from networkit_spark.operators.epidemic import seir_simulation

    # clique of 4, certain transmission: 0 infects all at t=0, E->I at t=1
    g = from_edge_rows(spark, list(itertools.combinations(range(4), 2)))
    rows = seir_simulation(
        g, zero=0, t_max=3, trans_p=1.0, e_time=0, i_time=100, seed=1
    ).collect()
    pop = {(r["t"], r["state"]): r["population"] for r in rows}
    assert pop[(0, 0)] == 0 and pop[(0, 1)] == 3 and pop[(0, 2)] == 1
    assert pop[(1, 1)] == 0 and pop[(1, 2)] == 4
    assert pop[(2, 2)] == 4 and pop[(2, 3)] == 0


def test_seir_population_invariants(spark):
    from networkit_spark.operators.epidemic import seir_simulation

    g = barbell(spark)
    rows = seir_simulation(
        g, zero=0, t_max=6, trans_p=0.4, e_time=1, i_time=2, seed=7
    ).collect()
    by_t = {}
    for r in rows:
        by_t.setdefault(r["t"], {})[r["state"]] = r["population"]
    n = 10
    s_prev, r_prev = n, 0
    for t in sorted(by_t):
        c = by_t[t]
        assert sum(c.values()) == n  # census partitions the vertex set
        assert c[0] <= s_prev  # S monotone nonincreasing (ref GTest contract)
        assert c[3] >= r_prev  # R monotone nondecreasing
        s_prev, r_prev = c[0], c[3]


def test_lfm_covers_and_overlaps(spark):
    from networkit_spark.operators.scd import lfm

    # two 5-cliques sharing node 4 — LFM must cover everything; the shared
    # node lands in whichever expansions reach it
    rows = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    rows += [(u, v) for u in range(4, 9) for v in range(u + 1, 9)]
    g = from_edge_rows(spark, rows, num_nodes=9)
    cov = lfm(g, nibble_rounds=6, max_communities=8).collect()
    by_node = {}
    for r in cov:
        by_node.setdefault(r["id"], set()).add(r["subset"])
    # every node covered
    assert set(by_node) == set(range(9))
    # at least 1 and at most a handful of communities
    subsets = {r["subset"] for r in cov}
    assert 1 <= len(subsets) <= 4
    # deterministic under the seed
    cov2 = lfm(g, nibble_rounds=6, max_communities=8).collect()
    assert {(r["id"], r["subset"]) for r in cov} == {(r["id"], r["subset"]) for r in cov2}


def _brute_gce_m(edges, seed, max_steps=50):
    """Direct GCE.cpp objective-M greedy (ties to smallest id)."""
    adj = {}
    for u, v, *w in edges:
        wt = float(w[0]) if w else 1.0
        if u == v:
            continue
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0.0) + wt
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0.0) + wt
    com = {seed}
    for _ in range(max_steps):
        wint = sum(
            w for u in com for v, w in adj.get(u, {}).items() if v in com
        ) / 2.0
        cut = sum(
            w for u in com for v, w in adj.get(u, {}).items() if v not in com
        )
        if cut <= 0:
            break
        q = wint / cut
        best, best_dq = None, 0.0
        shell = {
            v for u in com for v in adj.get(u, {}) if v not in com
        }
        for v in sorted(shell):
            intdeg = sum(w for y, w in adj[v].items() if y in com)
            extdeg = sum(w for y, w in adj[v].items() if y not in com)
            denom = cut - intdeg + extdeg
            nq = (wint + intdeg) / denom if denom > 0 else 1e308
            dq = nq - q
            if dq > best_dq:
                best, best_dq = v, dq
        if best is None:
            break
        com.add(best)
    return com


def test_gce_matches_brute_force(spark):
    from networkit_spark.operators.scd import gce

    # two dense blobs joined by one bridge: expansion from 0 should absorb
    # its blob and stop at the bridge
    edges = [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (0, 3),
        (3, 4),  # bridge
        (4, 5), (4, 6), (5, 6), (5, 7), (6, 7), (4, 7),
    ]
    g = from_edge_rows(spark, edges)
    got = sorted(
        r["node"]
        for r in gce(g, [0], max_steps=20).collect()
    )
    want = sorted(_brute_gce_m(edges, 0))
    assert got == want
    assert set(got) == {0, 1, 2, 3}

    # multi-seed batched run agrees with per-seed brute force
    multi = gce(g, [0, 7], max_steps=20).collect()
    by_seed = {}
    for r in multi:
        by_seed.setdefault(r["seed"], []).append(r["node"])
    assert sorted(by_seed[0]) == sorted(_brute_gce_m(edges, 0))
    assert sorted(by_seed[7]) == sorted(_brute_gce_m(edges, 7))


def test_scd_ground_truth_comparison(spark):
    from networkit_spark.operators.scd import scd_ground_truth_comparison

    # found: seed 0 -> {0,1,2,5}; seed 9 -> {9,8}
    found = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 5), (9, 9), (9, 8)], "seed long, node long"
    )
    # truth cover: subset 10 = {0,1,2,3}, subset 20 = {4,5,6}, subset 30 = {8,9}
    truth = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20), (8, 30), (9, 30)],
        "id long, subset long",
    )
    got = {
        r["seed"]: (r["jaccard"], r["f1"], r["precision"], r["recall"])
        for r in scd_ground_truth_comparison(found, truth).collect()
    }
    # seed 0: allowed subsets containing 0 -> {10}; ov=3, fsz=4, tsz=4
    j = 3 / (4 + 4 - 3)
    p, rcl = 3 / 4, 3 / 4
    f1 = 2 * p * rcl / (p + rcl)
    assert got[0] == pytest.approx((j, f1, p, rcl), abs=1e-12)
    # seed 9: subset 30 exactly matches {8,9} -> all 1.0
    assert got[9] == pytest.approx((1.0, 1.0, 1.0, 1.0), abs=1e-12)

    # ignore_seeds=True lets seed 0 match subset 20 for precision if better
    got2 = {
        r["seed"]: (r["jaccard"], r["precision"])
        for r in scd_ground_truth_comparison(
            found, truth, ignore_seeds=True
        ).collect()
    }
    # subset 20 overlap = {5}: j = 1/(4+3-1) -> worse; best stays subset 10
    assert got2[0][0] == pytest.approx(j, abs=1e-12)


def _brute_gce_l(edges, seed, max_steps=30):
    """Direct GCE.cpp objective-L greedy (ties to smallest id)."""
    adj = {}
    for u, v, *wt in edges:
        w = float(wt[0]) if wt else 1.0
        if u == v:
            continue
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    com = {seed}
    for _ in range(max_steps):
        wint = sum(
            w for u in com for v, w in adj.get(u, {}).items() if v in com
        ) / 2.0
        cut = sum(
            w for u in com for v, w in adj.get(u, {}).items() if v not in com
        )
        if cut <= 0:
            break
        bnd = sum(1 for u in com if any(v not in com for v in adj.get(u, {})))
        size = len(com)
        q = 2.0 * wint * bnd / (size * cut)
        shell = {v for u in com for v in adj.get(u, {}) if v not in com}
        best, best_dq = None, 0.0
        for v in sorted(shell):
            intdeg = sum(w for y, w in adj[v].items() if y in com)
            extdeg = sum(w for y, w in adj[v].items() if y not in com)
            hasext = 1 if any(y not in com for y in adj[v]) else 0
            lastc = sum(
                1
                for u in com
                if v in adj.get(u, {})
                and sum(1 for y in adj[u] if y not in com) == 1
            )
            denom = (size + 1) * (cut - intdeg + extdeg)
            nq = (
                2.0 * (wint + intdeg) * (bnd + (hasext - lastc)) / denom
                if denom > 0
                else 1e308
            )
            if nq - q > best_dq:
                best, best_dq = v, nq - q
        if best is None:
            break
        com.add(best)
    return com


def test_gce_objective_l_matches_brute_force(spark):
    from networkit_spark.operators.scd import gce

    edges = [
        (0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (0, 3),
        (3, 4),
        (4, 5), (4, 6), (5, 6), (5, 7), (6, 7), (4, 7),
        (7, 8), (8, 9),
    ]
    g = from_edge_rows(spark, edges)
    multi = gce(g, [0, 7], max_steps=20, objective="L").collect()
    by = {}
    for r in multi:
        by.setdefault(r["seed"], []).append(r["node"])
    assert sorted(by[0]) == sorted(_brute_gce_l(edges, 0))
    assert sorted(by[7]) == sorted(_brute_gce_l(edges, 7))


def test_set_conductance_closed_form(spark):
    from networkit_spark.operators.scd import set_conductance

    # two triangles joined by one edge: C = one triangle
    rows = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
            (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    # vol(C) = deg sum of {0,1,2} = 2+2+3 = 7, cut = 1, rest = 14-7 = 7
    assert abs(set_conductance(g, [0, 1, 2]) - 1.0 / 7.0) < 1e-12
    # whole graph: rest volume 0 -> 1.0
    assert set_conductance(g, [0, 1, 2, 3, 4, 5]) == 1.0


def test_random_bfs_community_levels(spark):
    from networkit_spark.operators.scd import random_bfs_community

    # star + tail: levels from 0 are {0}, {1..4}, ...
    rows = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0), (4, 5, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    full = random_bfs_community(g, 0, 6)
    assert full == [0, 1, 2, 3, 4, 5]
    part = random_bfs_community(g, 0, 3)
    assert len(part) == 3 and 0 in part
    assert set(part) - {0} <= {1, 2, 3, 4}  # partial level drawn from level 1
    assert part == random_bfs_community(g, 0, 3)  # deterministic


def test_combined_scd_contains_seed_and_expands(spark):
    from networkit_spark.operators.scd import combined_scd

    rows = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0),
            (3, 4, 1.0), (4, 5, 1.0), (3, 5, 1.0), (2, 3, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    out = combined_scd(g, 0, first_size=2)
    nodes = {r["node"] for r in out.collect()}
    assert 0 in nodes and len(nodes) >= 2
    assert {r["seed"] for r in out.collect()} == {0}


def test_neighborhood_heuristic_exact_when_fully_sampled(spark):
    # cycle C12 (regular ring lattice k=1): diameter 6; sampling EVERY node
    # (stepwidth 1, norm factor 1) makes the interior estimates exact pair
    # counts, so the result must equal the true neighborhood function with
    # the two exact endpoints N(1)=2m and N(dia)=n(n-1)
    # (NeighborhoodFunctionHeuristic.cpp:40-99).
    import pytest
    from pyspark.sql import functions as F

    from networkit_spark.operators.anf import neighborhood_function_heuristic
    from networkit_spark.operators.distance import multi_source_hops
    from networkit_spark.sources.generators import regular_ring_lattice

    g = regular_ring_lattice(spark, 12, 1)
    got = {
        r["dist"]: r["nf"]
        for r in neighborhood_function_heuristic(g, n_samples=12).collect()
    }
    hops = multi_source_hops(g)
    true_nf = {}
    for d in range(1, 7):
        true_nf[d] = hops.filter(
            (F.col("dist") >= 1) & (F.col("dist") <= d)
        ).count()
    assert got == true_nf
    assert got[1] == 2 * 12 and got[6] == 12 * 11
    # sub-sampling keeps the exact endpoints and stays monotone
    sub = {
        r["dist"]: r["nf"]
        for r in neighborhood_function_heuristic(g, n_samples=4).collect()
    }
    assert sub[1] == 24 and sub[6] == 132
    assert all(sub[d] <= sub[d + 1] for d in range(1, 6))

    from networkit_spark.graph import from_edge_rows

    disc = from_edge_rows(spark, [(0, 1), (2, 3)], num_nodes=4)
    with pytest.raises(ValueError, match="connected"):
        neighborhood_function_heuristic(disc)
    di = from_edge_rows(spark, [(0, 1)], directed=True, num_nodes=2)
    with pytest.raises(ValueError, match="undirected"):
        neighborhood_function_heuristic(di)


def test_neighborhood_heuristic_runs_past_depth_32(spark):
    # regression: the sampled BFS was capped at max_depth=32 by default, so
    # interior counts at distances 33..dia-1 silently came out zero on any
    # graph with diameter > 33 (the reference runs each BFS to completion,
    # NeighborhoodFunctionHeuristic.cpp:40-139). P40: diameter 39, every
    # node sampled -> exact closed form nf(d) = sum_{k<=d} 2(40-k).
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.anf import neighborhood_function_heuristic

    n = 40
    g = from_edge_rows(spark, [(i, i + 1) for i in range(n - 1)], num_nodes=n)
    got = {
        r["dist"]: r["nf"]
        for r in neighborhood_function_heuristic(g, n_samples=n).collect()
    }
    want = {}
    acc = 0
    for d in range(1, n):
        acc += 2 * (n - d)
        want[d] = acc
    assert got == want
