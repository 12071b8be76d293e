"""Pure-numpy single-threaded oracles implementing the cited reference
semantics exactly (FIXTURES.md §3). Used only by pytest — never by the
engine. Graphs are passed as (n, edges) where edges is the SAME symmetrized
(src, dst, weight) row list the Spark engine consumes (both directions
present for undirected graphs, self-loops once).
"""

from __future__ import annotations

import numpy as np


def _arrays(edges):
    if not edges:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.float64),
        )
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    w = np.array([e[2] if len(e) > 2 else 1.0 for e in edges], np.float64)
    return src, dst, w


def pagerank_oracle(
    n: int,
    edges,
    damp: float = 0.85,
    tol: float = 1e-8,
    norm: str = "l2",
    max_iterations: int | None = None,
    normalized: bool = False,
) -> np.ndarray:
    """Pull-based power iteration per networkit/cpp/centrality/PageRank.cpp:
    weighted out-degree (self-loops 2x on the symmetric table is already
    encoded upstream via the degrees definition: here the symmetric row list
    carries loops once, so wdeg adds the loop weight twice to match
    Graph.cpp:552-558)."""
    src, dst, w = _arrays(edges)
    wdeg = np.zeros(n, np.float64)
    np.add.at(wdeg, src, w)
    loops = src == dst
    np.add.at(wdeg, src[loops], w[loops])  # self-loop counts twice

    score = np.full(n, 1.0 / n) if n else np.zeros(0)
    teleport = (1.0 - damp) / n if n else 0.0
    it = 0
    frac = np.where(wdeg[src] > 0, w / np.where(wdeg[src] > 0, wdeg[src], 1.0), 0.0)
    while True:
        it += 1
        mass = np.zeros(n, np.float64)
        np.add.at(mass, dst, score[src] * frac)
        new = teleport + damp * mass
        if norm == "l2":
            delta = float(np.sqrt(np.sum((new - score) ** 2)))
        else:
            delta = float(np.sum(np.abs(new - score)))
        score = new
        if delta <= tol or (max_iterations is not None and it >= max_iterations):
            break
    if normalized:
        dang = score[wdeg <= 0].sum()
        denom = (1.0 / n) * ((1.0 - damp) + damp * dang)
    else:
        denom = score.sum() or 1.0
    return score / denom


def cc_oracle(n: int, edges) -> np.ndarray:
    """Hash-min fixpoint (ParallelConnectedComponents.cpp:21-98): label =
    min member id per component."""
    src, dst, _ = _arrays(edges)
    lab = np.arange(n, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, dst, lab[src])
        np.minimum.at(new, src, lab[dst])
        if np.array_equal(new, lab):
            return lab
        lab = new


def lp_oracle(
    n: int,
    edges,
    theta: int | None = None,
    max_iterations: int | None = 100,
) -> np.ndarray:
    """Synchronous LP, weight-sum + smallest-label tie-break
    (PLP.cpp:77-107, MPLP.cpp:122-128). Full sweeps (the engine's frontier
    optimization is exact for synchronous updates)."""
    src, dst, w = _arrays(edges)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    if theta is None:
        theta = max(0, int(n / 1e5))
    lab = np.arange(n, dtype=np.int64)
    it = 0
    while True:
        it += 1
        new = lab.copy()
        # per dst: heaviest incident label, smallest label id on ties
        order = np.lexsort((lab[src], dst))
        d, l, ww = dst[order], lab[src][order], w[order]
        # aggregate weight per (dst, label)
        import collections

        best: dict[int, tuple[float, int]] = {}
        agg: dict[tuple[int, int], float] = collections.defaultdict(float)
        for i in range(len(d)):
            agg[(int(d[i]), int(l[i]))] += float(ww[i])
        for (node, label), weight in agg.items():
            cur = best.get(node)
            if (
                cur is None
                or weight > cur[0]
                or (weight == cur[0] and label < cur[1])
            ):
                best[node] = (weight, label)
        for node, (_, label) in best.items():
            new[node] = label
        n_updated = int(np.sum(new != lab))
        lab = new
        if n_updated <= theta or (max_iterations is not None and it >= max_iterations):
            return lab


def triangles_oracle(n: int, edges) -> tuple[np.ndarray, int]:
    """Degree-ordered oriented exact triangle counting
    (TriangleEdgeScore.cpp:26-105). Returns (per-node counts, global)."""
    src, dst, _ = _arrays(edges)
    keep = src != dst
    pairs = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(src[keep], dst[keep])}
    deg = np.zeros(n, np.int64)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in pairs:
        # orient from higher (degree, id) to lower
        if (deg[a], a) > (deg[b], b):
            adj[a].add(b)
        else:
            adj[b].add(a)
    per = np.zeros(n, np.int64)
    total = 0
    for a in range(n):
        out = sorted(adj[a])
        for i in range(len(out)):
            for j in range(i + 1, len(out)):
                b, c = out[i], out[j]
                if c in adj[b] or b in adj[c]:
                    total += 1
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return per, total


def betweenness_oracle(n: int, edges, normalized: bool = False) -> np.ndarray:
    """Textbook sequential Brandes over the (already symmetrized when
    undirected) edge row list — unweighted BFS variant, dependencies summed
    over every source (Betweenness.cpp:46-80: no undirected halving);
    normalized divides by (n-1)(n-2)."""
    from collections import deque

    src, dst, _ = _arrays(edges)
    adj: list[list[int]] = [[] for _ in range(n)]
    seen = set()
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b and (a, b) not in seen:
            seen.add((a, b))
            adj[a].append(b)
    bc = np.zeros(n, np.float64)
    for s in range(n):
        dist = [-1] * n
        sigma = np.zeros(n, np.float64)
        preds: list[list[int]] = [[] for _ in range(n)]
        order = []
        dist[s] = 0
        sigma[s] = 1.0
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = np.zeros(n, np.float64)
        for w in reversed(order):
            for p in preds[w]:
                delta[p] += sigma[p] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if normalized and n > 2:
        bc /= (n - 1.0) * (n - 2.0)
    return bc


def harmonic_closeness_oracle(n: int, edges, normalized: bool = False) -> np.ndarray:
    """HarmonicCloseness.cpp:23-48: sum of 1/d over reachable vertices,
    normalized divides by n-1."""
    from collections import deque

    src, dst, _ = _arrays(edges)
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
    sc = np.zeros(n, np.float64)
    for s in range(n):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        sc[s] = sum(1.0 / d for v, d in dist.items() if d > 0)
    if normalized:
        sc /= max(n - 1, 1)
    return sc


def commute_time_oracle(n: int, edges, pairs) -> list[float]:
    """sqrt(|x_u - x_v| * vol) with x = L^+ (e_u - e_v) via numpy pinv —
    the exact linear-algebra ground truth for CommuteTimeDistance.cpp:
    172-189 (independent of the engine's Jacobi superstep path)."""
    A = np.zeros((n, n))
    for u, v, w in edges:
        if u != v:
            A[u, v] += w
            A[v, u] += w
    # symmetric input may list both directions; collapse double counting
    A = np.minimum(A, A.T)
    L = np.diag(A.sum(axis=1)) - A
    Lp = np.linalg.pinv(L)
    vol = A.sum()
    out = []
    for u, v in pairs:
        b = np.zeros(n)
        b[u], b[v] = 1.0, -1.0
        x = Lp @ b
        out.append(float(np.sqrt(abs(x[u] - x[v]) * vol)))
    return out
