import pytest
"""GroupDegree (centrality/GroupDegree.cpp) contract tests."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.groups import group_degree, group_degree_score


def test_greedy_picks_double_star(spark):
    # two stars: center 0 (leaves 1-4), center 5 (leaves 6-8), bridge 4-6
    edges = [(0, i) for i in range(1, 5)] + [(5, i) for i in range(6, 9)] + [(4, 6)]
    g = from_edge_rows(spark, edges)
    rows = group_degree(g, k=2).collect()
    picks = [(r["rank"], r["id"], r["gain"]) for r in rows]
    # greedy: 0 covers {0..4} gain 5; then 5 covers {5,6,7,8} gain 4
    assert picks == [(1, 0, 5), (2, 5, 4)]
    assert group_degree_score(g, k=2) == 9


def test_tie_breaks_to_smaller_id(spark):
    # two disjoint triangles: equal gains, smaller component id first
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)])
    rows = group_degree(g, k=2).collect()
    assert [r["id"] for r in rows] == [0, 3]


def test_without_group_nodes(spark):
    # star center 0 with 3 leaves: |N(S)\S| = 3 for S={0}
    g = from_edge_rows(spark, [(0, 1), (0, 2), (0, 3)])
    rows = group_degree(g, k=1, count_group_nodes=False).collect()
    assert rows[0]["id"] == 0 and rows[0]["gain"] == 3


def _greedy_group_closeness_bruteforce(n, adj, k):
    import collections

    def bfs(s):
        d = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in d:
                    d[v] = d[u] + 1
                    q.append(v)
        return d

    D = {s: bfs(s) for s in range(n)}
    gd = {v: n for v in range(n)}
    group, picks = set(), []
    total = n * n
    for rank in range(1, k + 1):
        best = None
        for c in range(n):
            if c in group:
                continue
            f = total + sum(min(D[c].get(v, n), gd[v]) - gd[v] for v in D[c])
            if best is None or (f, c) < best:
                best = (f, c)
        f, c = best
        picks.append((rank, c, f))
        total = f
        group.add(c)
        for v, dv in D[c].items():
            gd[v] = min(gd[v], dv)
    return picks


def test_group_closeness_matches_bruteforce(spark):
    from networkit_spark.operators.groups import group_closeness

    rows = [
        (0, 1), (0, 2), (0, 3), (3, 4), (4, 5), (5, 6), (6, 7), (2, 8),
        (8, 9), (9, 10),
    ]
    n = 11
    adj = {i: [] for i in range(n)}
    for u, v in rows:
        adj[u].append(v)
        adj[v].append(u)
    g = from_edge_rows(spark, rows, num_nodes=n)
    got = [
        (r["rank"], r["id"], r["farness"])
        for r in group_closeness(g, k=4).collect()
    ]
    assert got == _greedy_group_closeness_bruteforce(n, adj, 4)


def test_group_closeness_penalty_on_fragments(spark):
    from networkit_spark.operators.groups import group_closeness

    # two components: greedy must cover BOTH (penalty n per unreached node)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    got = [r["id"] for r in group_closeness(g, k=2).collect()]
    assert got[0] == 1  # center of the larger component
    assert got[1] in (3, 4)  # second pick jumps to the other fragment


def test_group_harmonic_matches_brute_force(spark):
    from networkit_spark.operators.groups import group_harmonic_closeness

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 5),
        (1, 6), (6, 7), (2, 7), (7, 8),
        (9, 10),  # separate component
    ]
    n = 11
    g = from_edge_rows(spark, edges, num_nodes=n)

    # brute-force greedy: argmax marginal harmonic gain, ties smallest id
    import collections

    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def hops(s):
        d, q = {s: 0}, [s]
        while q:
            u = q.pop(0)
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        return d

    D = {s: hops(s) for s in range(n)}

    def score(S):
        tot = 0.0
        for t in range(n):
            if t in S:
                continue
            best = min((D[s].get(t) for s in S if t in D[s]), default=None)
            if best and best > 0:
                tot += 1.0 / best
        return tot

    S = []
    expected = []
    for rank in range(1, 4):
        gains = {
            v: score(S + [v]) - score(S) for v in range(n) if v not in S
        }
        best = max(sorted(gains), key=lambda v: (round(gains[v], 9), -v))
        # ties to smallest id: sort ids ascending, take max by (gain, -id)
        S.append(best)
        expected.append((rank, best, round(score(S), 6)))

    got = [
        (r["rank"], r["id"], round(r["score"], 6))
        for r in group_harmonic_closeness(g, k=3).orderBy("rank").collect()
    ]
    assert got == expected


def test_ged_walk_matches_numpy_brute_force(spark):
    import numpy as np

    from networkit_spark.operators.groups import ged_walk_group

    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6), (6, 3),
        (2, 7), (7, 8), (8, 9), (9, 7), (1, 5),
    ]
    n, k, alpha, L, C = 10, 3, 0.1, 4, 6
    g = from_edge_rows(spark, edges, num_nodes=n)
    got = [
        (r["rank"], r["id"], r["ged_score"])
        for r in ged_walk_group(
            g, k=k, alpha=alpha, levels=L, pool_size=C
        ).collect()
    ]

    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = 1
        A[v, u] = 1
    deg = A.sum(1)
    pool = sorted(range(n), key=lambda i: (-deg[i], i))[:C]

    def avoid(mask):
        keep = np.ones(n)
        keep[list(mask)] = 0
        x = keep.copy()
        tot = 0.0
        for lvl in range(1, L + 1):
            x = keep * (A @ x)
            tot = tot + (alpha ** lvl) * float(x.sum())
        return tot

    wall = avoid([])
    S, want = [], []
    for rank in range(1, k + 1):
        cands = [v for v in pool if v not in S]
        ts = [avoid(S + [v]) for v in cands]
        i = min(range(len(cands)), key=lambda i: (ts[i], cands[i]))
        S.append(cands[i])
        want.append((rank, cands[i], wall - ts[i]))

    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_group_swaps_matches_brute_force(spark):
    import collections

    from networkit_spark.operators.groups import group_closeness_local_swaps

    # star-ish: center 0 and hub 5; a bad initial group in the periphery
    edges = [
        (0, 1), (0, 2), (0, 3), (0, 4),
        (5, 6), (5, 7), (5, 8), (0, 5),
        (4, 9), (9, 10),
    ]
    n = 11
    g = from_edge_rows(spark, edges, num_nodes=n)
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    def hops(s):
        d, q = {s: 0}, [s]
        while q:
            u = q.pop(0)
            for w in adj[u]:
                if w not in d:
                    d[w] = d[u] + 1
                    q.append(w)
        return d

    D = {s: hops(s) for s in range(n)}

    def farness(S):
        tot = 0
        for t in range(n):
            best = min((D[s].get(t) for s in S if t in D[s]), default=None)
            tot += best if best is not None else n
        return tot

    group = [9, 10]
    S = list(group)
    expected = []
    for rnd in range(1, 4):
        best = None
        for x in sorted(S):
            for y in sorted(set(range(n)) - set(S)):
                nf = farness([m for m in S if m != x] + [y])
                if best is None or nf < best[2] or (
                    nf == best[2] and (x, y) < (best[0], best[1])
                ):
                    best = (x, y, nf)
        if best is None or best[2] >= farness(S):
            break
        S = [m for m in S if m != best[0]] + [best[1]]
        expected.append((rnd, best[0], best[1], best[2]))

    got = [
        (r["round"], r["out_id"], r["in_id"], r["farness"])
        for r in group_closeness_local_swaps(g, group, max_rounds=3)
        .orderBy("round")
        .collect()
    ]
    assert got == expected
    assert len(got) >= 1  # the bad initial group must improve
