"""K-path centrality vs a hashlib transliteration of the identical
hash-derandomized self-avoiding walks."""

import hashlib

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.kpath import kpath_centrality

UNIT = float(1 << 48)


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _brute_kpath(edges, n, k, t, seed):
    adj = {}
    for u, v, *wt in edges:
        w = float(wt[0]) if wt else 1.0
        if u == v:
            continue
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    cnt = {}
    for wid in range(t):
        cur = _h(f"{seed}:kps:{wid}") % n
        ln = _h(f"{seed}:kpl:{wid}") % k + 1
        visited = [cur]
        for j in range(1, ln + 1):
            cands = sorted(
                (dst, 1.0 / w)
                for dst, w in adj.get(cur, {}).items()
                if dst not in visited
            )
            if not cands:
                break
            tot = sum(iw for _, iw in cands)
            r = _h(f"{seed}:kpp:{j}:{wid}") / UNIT * tot
            cum = 0.0
            nxt = None
            for dst, iw in cands:
                cum += iw
                if cum > r:
                    nxt = dst
                    break
            if nxt is None:  # float-edge guard; mirrors cum > r filter
                break
            visited.append(nxt)
            cnt[nxt] = cnt.get(nxt, 0) + 1
            cur = nxt
    return {
        v: k * n * cnt.get(v, 0) / t for v in range(n)
    }


def test_kpath_matches_hash_replica(spark):
    edges = [
        (0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 3.0), (4, 0, 1.0),
        (1, 5, 1.0), (5, 6, 1.0), (2, 6, 2.0), (6, 7, 1.0), (7, 8, 1.0),
        (8, 9, 1.0), (9, 5, 1.0), (0, 9, 1.0),
    ]
    n, k, t, seed = 10, 4, 40, 42
    g = from_edge_rows(spark, edges, num_nodes=n)
    got = {
        r["id"]: r["score"]
        for r in kpath_centrality(g, k=k, num_walks=t, seed=seed).collect()
    }
    want = _brute_kpath(edges, n, k, t, seed)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) > 0
