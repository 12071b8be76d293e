"""Map-equation local moving vs a direct Python replica of the
synchronous sweep (LouvainMapEquation.cpp fitnessChange semantics), plus
structure recovery on planted fixtures.
"""

import math

import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.mapequation import louvain_map_equation


def _brute_sweeps(edges, sweeps):
    """Synchronous one-subround map-equation sweeps from singletons —
    mirrors mapequation.py / fitnessChange exactly."""
    adj = {}
    for u, v, *wt in edges:
        w = float(wt[0]) if wt else 1.0
        adj.setdefault(u, {})
        adj.setdefault(v, {})
        adj[u][v] = adj[u].get(v, 0.0) + w
        if u != v:
            adj[v][u] = adj[v].get(u, 0.0) + w
    vol = {
        u: sum(w * (2 if v == u else 1) for v, w in nb.items())
        for u, nb in adj.items()
    }
    loop = {u: adj[u].get(u, 0.0) for u in adj}
    tv = sum(vol.values())
    lab = {u: u for u in adj}

    def plogp(x):
        if x > 0:
            p = x / tv
            return p * math.log(p)
        return 0.0

    for _ in range(sweeps):
        cvol, ccut = {}, {}
        for u in adj:
            cvol[lab[u]] = cvol.get(lab[u], 0.0) + vol[u]
            for v, w in adj[u].items():
                if v != u and lab[v] != lab[u]:
                    ccut[lab[u]] = ccut.get(lab[u], 0.0) + w
        tot = sum(ccut.values())
        new_lab = dict(lab)
        for u in adj:
            w2c = sum(
                w for v, w in adj[u].items() if v != u and lab[v] == lab[u]
            )
            w2t = {}
            for v, w in adj[u].items():
                if v != u and lab[v] != lab[u]:
                    w2t[lab[v]] = w2t.get(lab[v], 0.0) + w
            if not w2t:
                continue
            cur = lab[u]
            cdc = 2 * w2c - vol[u] + 2 * loop[u]
            cut_cur = ccut.get(cur, 0.0)
            vol_cur = cvol[cur]
            stay = (
                plogp(tot)
                + (
                    plogp(cut_cur + vol_cur)
                    - plogp(cut_cur + cdc + vol_cur - vol[u])
                )
                - 2 * (plogp(cut_cur) - plogp(cut_cur + cdc))
            )
            best_c, best_chg = None, None
            for c in sorted(w2t):
                cdt = vol[u] - 2 * w2t[c] - 2 * loop[u]
                cut_t = ccut.get(c, 0.0)
                vol_t = cvol.get(c, 0.0)
                chg = (
                    plogp(tot + cdc + cdt)
                    + (plogp(cut_t + cdt + vol_t + vol[u]) - plogp(cut_t + vol_t))
                    - 2 * (plogp(cut_t + cdt) - plogp(cut_t))
                )
                if best_chg is None or chg < best_chg:
                    best_c, best_chg = c, chg
            if best_chg is not None and best_chg < stay:
                new_lab[u] = best_c
        lab = new_lab
    return lab


def test_map_equation_matches_python_replica(spark):
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 4),
        (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
        (8, 9), (9, 10), (10, 8), (7, 8),
        (2, 2),  # self-loop exercises the loop terms
    ]
    g = from_edge_rows(spark, edges)
    for sweeps in (1, 2, 4):
        got = {
            r["id"]: r["label"]
            for r in louvain_map_equation(g, max_sweeps=sweeps, pinned=True).collect()
        }
        want = _brute_sweeps(edges, sweeps)
        assert got == want, f"sweeps={sweeps}"


def test_map_equation_recovers_planted_blocks(spark):
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 4),
        (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7),
    ]
    g = from_edge_rows(spark, edges)
    labs = {
        r["id"]: r["label"] for r in louvain_map_equation(g, max_sweeps=8).collect()
    }
    assert len({labs[i] for i in (0, 1, 2, 3)}) == 1
    assert len({labs[i] for i in (4, 5, 6, 7)}) == 1
    assert labs[0] != labs[4]
