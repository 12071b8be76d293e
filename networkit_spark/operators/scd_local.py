"""Heap-sequential selective-community-detection expansions at fixture
tier: TCE, LocalTightnessExpansion, LocalT, and TwoPhaseL.

These four reference algorithms interleave a mutable best-candidate heap
with per-admission score updates — the heap order IS the algorithm, so
they stay driver-sequential here exactly like the reference's own
single-threaded loops (the same treatment as path_growing_matching /
random_spanning_forest). The superstep-native distributed SCD paths
remain pagerank_nibble, gce (M and L), clique_detect, and lfm, all
oracle-checked.

References:
- networkit/cpp/scd/TCE.cpp:46-295 — triangle-weighted conductance
  expansion: shell node v accumulates, per admitted neighbor u,
  score(u,v) = nom / (denom * deg(v)) with
  nom = w(u,v) + sum_{y in N(u) ∩ N(v)} min(w(u,y), w(v,y)),
  denom = useJaccard ? wdeg(u) + wdeg(v) - nom : min(wdeg(u), wdeg(v));
  the max-score shell node is admitted iff conductance improves
  ((cut + wdeg(v) - 2*cutEdges(v)) / (vol + wdeg(v)) < cut/vol), and an
  extracted-but-rejected node re-enters the shell when a later admitted
  node is its neighbor (TCE.cpp:123 shell.update inserts absent keys).
  refine (TCE.cpp:228-292) then drops members in ascending id order
  whenever removal improves conductance.
- networkit/cpp/scd/LocalTightnessExpansion.cpp:59-325 — cosine-style
  tightness: S(u,v) = (2*w(u,v) + sum_y w(u,y)*w(v,y)) /
  (sqrt(1 + sum w(u,.)^2) * sqrt(1 + sum w(v,.)^2)); shell ordered by
  internal similarity; admit iff
  ES/IS - (alpha*es(v) - is(v)) / (2*is(v)) > 0 where IS/ES are the
  community's summed internal/external similarities (the reference's
  incremental bookkeeping equals these definitional sums — its own debug
  asserts at LocalTightnessExpansion.cpp:239-266 pin that).
- networkit/cpp/scd/LocalT.cpp:14-192 — triangle-count objective
  score(int, ext) = max(0, int*(int - ext)) with int = #triangles fully
  inside, ext = #triangles with exactly one vertex inside; candidate v
  gives newInt = int + int_t(v), newExt = ext + ext_t(v) - semi_t(v);
  admit the best (newScore, -newExt) candidate when newScore > current
  or newScore == current (LocalT.cpp:160-175's bestExternalTriangles
  starts at none). Unweighted, like the reference's
  LocalDegreeDirectedGraph<false> instantiation.
- networkit/cpp/scd/TwoPhaseL.cpp:13-113 + structures/LocalCommunity.hpp
  :99-169 — L-measure two-phase: Lin = 2*W_int/|C|,
  Lex = cut/|boundary|, L = Lin/Lex; phase 1 admits the shell node
  maximizing newL among those with newLin > Lin while any exists
  (boundaryChange(add v) = [extDeg(v) > 0] - #{members whose only
  external neighbor is v}); phase 2 sweeps members and removes v unless
  removal would both lower Lin and raise Lex (boundaryChange(remove v) =
  #{neighbors in C with extDeg == 0} - [extDeg(v) > 0]); returns empty
  if any seed was removed.

Determinism deviations (documented, same policy as the other ports): the
reference's tlx 4-ary heaps and unordered_set/map scans leave equal-score
order unspecified and TwoPhaseL randomizes ties via
IncrementalUniformRandomSelector; here every tie goes to the smallest
node id and candidate scans run in ascending id order, so results are
replayable. TwoPhaseL equal-L candidates (nL == lMax with no strict
improvement seen) are not admitted here; the reference admits them with
uniform probability.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from networkit_spark.graph import Graph, require_fixture_scale


def _collect_adjacency(
    graph: Graph, op: str, max_m: int = 200_000
) -> dict[int, dict[int, float]]:
    """Driver-side undirected adjacency for the fixture-tier loops."""
    if graph.directed:
        raise ValueError(f"{op} expects an undirected graph")
    require_fixture_scale(graph, max_m, op)
    adj: dict[int, dict[int, float]] = {}
    for r in graph.edges.select("src", "dst", "weight").collect():
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if u == v:
            raise ValueError(f"{op} expects no self-loops")
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    return adj


def _ids_df(graph: Graph, ids) -> DataFrame:
    spark = graph.vertices.sparkSession
    rows = [(int(i),) for i in sorted(ids)]
    return spark.createDataFrame(rows, "id long")


def tce(
    graph: Graph,
    seeds: list[int],
    refine: bool = False,
    use_jaccard: bool = False,
    max_m: int = 200_000,
) -> DataFrame:
    """(id) — TCE triangle-weighted conductance expansion from a seed set
    (scd/TCE.cpp:46-305; defaults refine=false, useJaccard=false from
    scd/TCE.hpp:26)."""
    adj = _collect_adjacency(graph, "tce", max_m)
    wdeg = {u: sum(nb.values()) for u, nb in adj.items()}
    deg = {u: len(nb) for u, nb in adj.items()}

    def score_uv(u: int, v: int) -> float:
        # contribution of admitted neighbor u to shell node v
        un, vn = adj[u], adj[v]
        small, other = (un, vn) if len(un) <= len(vn) else (vn, un)
        nom = un[v] + sum(
            min(un[y], vn[y]) for y in small if y in other and y != u and y != v
        )
        wd_v = wdeg.get(v, 0.0)
        if wd_v <= 0.0:
            return 0.0
        denom = (wdeg[u] + wd_v - nom) if use_jaccard else min(wdeg[u], wd_v)
        return nom / (denom * deg[v])

    result = set(int(s) for s in seeds)
    score: dict[int, float] = {}
    cut_edges: dict[int, float] = {}
    shell: set[int] = set()

    def update_shell(u: int) -> None:
        # TCE.cpp:104-144 — accumulate score/cut for u's non-member
        # neighbors and (re-)insert them into the shell
        for v, wuv in adj.get(u, {}).items():
            if v in result:
                continue
            score[v] = score.get(v, 0.0) + score_uv(u, v)
            cut_edges[v] = cut_edges.get(v, 0.0) + wuv
            shell.add(v)

    for u in sorted(result):
        update_shell(u)
    vol = sum(wdeg.get(u, 0.0) for u in result)
    cut = sum(cut_edges.values())

    while shell:
        u_max = max(shell, key=lambda x: (score[x], -x))
        shell.discard(u_max)
        u_vol = wdeg.get(u_max, 0.0)
        new_cut = cut + u_vol - 2.0 * cut_edges.get(u_max, 0.0)
        new_vol = vol + u_vol
        if new_vol > 0 and vol > 0 and (new_cut / new_vol) < (cut / vol):
            result.add(u_max)
            update_shell(u_max)
            cut, vol = new_cut, new_vol

    if refine:
        # TCE.cpp:228-292 — ascending-id sweep (std::set iteration order),
        # removing u when conductance improves
        for u in sorted(result):
            u_vol = wdeg.get(u, 0.0)
            cut_change = 0.0
            for v, w in adj.get(u, {}).items():
                cut_change += w if v in result else -w
            new_cut = cut + cut_change
            new_vol = vol - u_vol
            if new_vol > 0 and vol > 0 and (new_cut / new_vol) < (cut / vol):
                result.discard(u)
                cut, vol = new_cut, new_vol

    return _ids_df(graph, result)


def local_tightness_expansion(
    graph: Graph, seeds: list[int], alpha: float = 1.0, max_m: int = 200_000
) -> DataFrame:
    """(id) — LocalTightnessExpansion from a seed set
    (scd/LocalTightnessExpansion.cpp:59-335; alpha default 1.0 from
    scd/LocalTightnessExpansion.hpp:31)."""
    adj = _collect_adjacency(graph, "local_tightness_expansion", max_m)
    wd = {
        u: math.sqrt(1.0 + sum(w * w for w in nb.values()))
        for u, nb in adj.items()
    }

    sim: dict[tuple[int, int], float] = {}

    def S(u: int, v: int) -> float:
        key = (u, v) if u < v else (v, u)
        got = sim.get(key)
        if got is None:
            un, vn = adj[u], adj[v]
            small, other = (un, vn) if len(un) <= len(vn) else (vn, un)
            nom = 2.0 * un[v] + sum(
                small[y] * other[y] for y in small if y in other
            )
            got = nom / (wd[u] * wd[v])
            sim[key] = got
        return got

    def int_sim(v: int) -> float:
        return sum(S(u, v) for u in sorted(adj.get(v, {})) if u in result)

    def ext_sim(v: int) -> float:
        return sum(S(u, v) for u in sorted(adj.get(v, {})) if u not in result)

    result: set[int] = set()
    shell: set[int] = set()
    for u in sorted(int(s) for s in seeds):
        shell.discard(u)
        result.add(u)
        for v in adj.get(u, {}):
            if v not in result:
                shell.add(v)

    while shell:
        u_max = max(shell, key=lambda x: (int_sim(x), -x))
        shell.discard(u_max)
        IS = sum(int_sim(v) for v in sorted(result))
        ES = sum(ext_sim(v) for v in sorted(result))
        i_s = int_sim(u_max)
        e_s = ext_sim(u_max)
        if i_s <= 0.0:
            continue  # S > 0 for every edge, so a shell node always has i_s > 0
        lhs = (ES / IS) if IS > 0.0 else math.inf  # C++ x/0.0 == inf
        if lhs - (alpha * e_s - i_s) / (2.0 * i_s) > 0:
            result.add(u_max)
            for v in adj.get(u_max, {}):
                if v not in result:
                    shell.add(v)

    return _ids_df(graph, result)


def local_t(graph: Graph, seeds: list[int], max_m: int = 200_000) -> DataFrame:
    """(id) — LocalT triangle-based expansion from a seed set
    (scd/LocalT.cpp:14-192). Unweighted: triangles count 1 apiece, like
    the reference's LocalDegreeDirectedGraph<false> instantiation."""
    adj = _collect_adjacency(graph, "local_t", max_m)
    nbrs = {u: set(nb) for u, nb in adj.items()}

    def tri_split(v: int) -> tuple[int, int, int]:
        # (#both-in-result, #exactly-one, #none) over v's global triangles
        it = se = ex = 0
        vn = sorted(nbrs.get(v, ()))
        for i, a in enumerate(vn):
            an = nbrs[a]
            for b in vn[i + 1 :]:
                if b in an:
                    k = (a in result) + (b in result)
                    if k == 2:
                        it += 1
                    elif k == 1:
                        se += 1
                    else:
                        ex += 1
        return it, se, ex

    result = set(int(s) for s in seeds)
    shell: set[int] = set()
    for u in result:
        for v in nbrs.get(u, ()):
            if v not in result:
                shell.add(v)

    def score(it: int, ex: int) -> int:
        return max(0, it * (it - ex))

    # global counts: IT = #triangles fully inside, ET = #triangles with
    # exactly one vertex inside (LocalT.cpp:95-117 debug invariants)
    IT = ET = 0
    for u in sorted(result):
        it, _, ex = tri_split(u)
        IT += it
        ET += ex
    IT //= 3

    while True:
        best = None
        best_score = score(IT, ET)
        best_ext = None  # reference inits bestExternalTriangles to none (max)
        for v in sorted(shell):
            it, se, ex = tri_split(v)
            new_it = IT + it
            new_ext = ET + ex - se
            new_score = score(new_it, new_ext)
            if new_score > best_score or (
                new_score == best_score
                and (best_ext is None or new_ext < best_ext)
            ):
                best, best_score, best_ext = v, new_score, new_ext
        if best is None:
            break
        result.add(best)
        shell.discard(best)
        for v in nbrs.get(best, ()):
            if v not in result:
                shell.add(v)
        it, se, ex = tri_split(best)
        IT += it
        ET += ex - se

    return _ids_df(graph, result)


def _fdiv(a: float, b: float) -> float:
    """IEEE-style division matching the reference's C++ doubles."""
    if b != 0.0:
        return a / b
    if a > 0.0:
        return math.inf
    if a < 0.0:
        return -math.inf
    return math.nan


def two_phase_l(graph: Graph, seeds: list[int], max_m: int = 200_000) -> DataFrame:
    """(id) — TwoPhaseL L-measure expansion from a seed set
    (scd/TwoPhaseL.cpp:13-113). Returns the empty community when any seed
    is removed in phase 2, like the reference."""
    adj = _collect_adjacency(graph, "two_phase_l", max_m)
    com = set(int(s) for s in seeds)

    def int_deg(v: int) -> float:
        return sum(w for u, w in adj.get(v, {}).items() if u in com)

    def ext_deg(v: int) -> float:
        return sum(w for u, w in adj.get(v, {}).items() if u not in com)

    def metrics() -> tuple[float, float, int]:
        ie = cutw = 0.0
        boundary = 0
        for v in sorted(com):
            iv = ev = 0.0
            for u, w in adj.get(v, {}).items():
                if u in com:
                    iv += w
                else:
                    ev += w
            ie += iv
            cutw += ev
            if ev > 0.0:
                boundary += 1
        return ie / 2.0, cutw, boundary

    def lin_lex() -> tuple[float, float]:
        ie, cutw, b = metrics()
        return _fdiv(2.0 * ie, float(len(com))), _fdiv(cutw, float(b))

    # phase 1: greedy additions while newLin > Lin and newL > L
    while True:
        ie, cutw, b = metrics()
        cur_lin = _fdiv(2.0 * ie, float(len(com)))
        cur_lex = _fdiv(cutw, float(b))
        cur_l = _fdiv(cur_lin, cur_lex)
        shell = sorted(
            v
            for v in set().union(*(adj.get(u, {}).keys() for u in com))
            if v not in com
        ) if com else []
        best, l_max = None, cur_l
        for v in shell:
            idg = int_deg(v)
            edg = ext_deg(v)
            n_lin = _fdiv(2.0 * (ie + idg), float(len(com) + 1))
            if not (n_lin > cur_lin):
                continue
            # boundaryChange(add): -#{members whose only external
            # neighbor is v} + [extDeg(v) > 0] (LocalCommunity.hpp:119-127)
            excl = sum(
                1
                for u in adj.get(v, {})
                if u in com
                and all(x in com or x == v for x in adj.get(u, {}))
                and any(x not in com for x in adj.get(u, {}))
            )
            bchange = -excl + (1 if edg > 0.0 else 0)
            n_lex = _fdiv(cutw - idg + edg, float(b + bchange))
            n_l = _fdiv(n_lin, n_lex)
            if n_l > l_max:
                best, l_max = v, n_l
        if best is None:
            break
        com.add(best)

    # phase 2: remove members unless removal both lowers Lin and raises Lex
    cur_lin, cur_lex = lin_lex()
    for v in sorted(com):
        ie, cutw, b = metrics()
        idg = int_deg(v)
        edg = ext_deg(v)
        n_lin = _fdiv(2.0 * (ie - idg), float(len(com) - 1))
        # boundaryChange(remove): +#{neighbors in C with extDeg == 0}
        # - [extDeg(v) > 0] (LocalCommunity.hpp:157-165)
        fully_internal = sum(
            1
            for u in adj.get(v, {})
            if u in com and all(x in com for x in adj.get(u, {}))
        )
        bchange = fully_internal - (1 if edg > 0.0 else 0)
        n_lex = _fdiv(cutw + idg - edg, float(b + bchange))
        if not (cur_lin > n_lin and cur_lex < n_lex):
            com.discard(v)
            if not com:
                break
            cur_lin, cur_lex = lin_lex()

    if any(int(s) not in com for s in seeds):
        return _ids_df(graph, set())
    return _ids_df(graph, com)
