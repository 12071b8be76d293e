"""Graph layout tier — PivotMDS re-expressed Spark-first.

References:
- networkit/cpp/viz/PivotMDS.cpp:22-111 — pick ``numPivots`` random
  nodes, Dijkstra from each pivot, double-center the n×k pivot-distance
  matrix C (only PRESENT (node, pivot) pairs are centered — unreachable
  pairs stay exact 0.0 in the CSR, PivotMDS.cpp:38-47,70-73), form the
  k×k Gram matrix CᵀC, extract the top ``dim`` eigenvectors by deflated
  power iteration, and emit coordinates x_d = C·v_d.
- networkit/cpp/viz/PivotMDS.cpp:113-133 powerMethod — v ← CCv/‖CCv‖
  until ‖v−v_old‖ ≤ 1e-6 or 1500 steps; λ = Rayleigh quotient;
  deflation CC ← CC − (λ/‖v‖²)·vvᵀ (PivotMDS.cpp:95-110).

Spark-first plan: everything n-sized stays distributed — the pivot BFS
is the existing batched frontier superstep (one join+agg per level for
ALL pivots at once), row means / centering / coordinates are zero-shuffle
array expressions over a per-node length-k distance array, and the k×k
Gram matrix is one vectorized Arrow pass (per-partition numpy MᵀM
partials, ≤ n_partitions rows collected). Only k-sized state (column
means, the k×k Gram, the k-vectors) ever reaches the driver, where the
deflated power iteration mirrors the reference in numpy. At 100 TB with
k≈250 pivots the driver holds 250×250 doubles — nothing n-sized.

Documented deviations (derandomization convention of this engine):
- pivots are the first k nodes by md5 rank (GraphTools::randomNodes is
  an unseeded uniform draw);
- the power-method start vector is md5-derived in [-0.5, 0.5) instead
  of Aux::Random::real;
- each eigenvector's sign is canonicalized (first nonzero coordinate in
  pivot order positive) so coordinates are deterministic — the
  reference's output is sign-ambiguous run to run.
- ``pinned_iters`` runs a fixed iteration count instead of the 1e-6
  convergence test: the oracle-replayable mode (same convention as
  graph_plm_pinned). Default None = reference's convergence loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, require_fixture_scale
from networkit_spark.plans.checkpoint import materialize


def _md5_unit(text: str) -> float:
    """Python twin of functions.hashing.md5_long_sql / 2^48 - 0.5 —
    the engine-neutral deterministic stand-in for Aux::Random::real."""
    h = int.from_bytes(hashlib.md5(text.encode()).digest()[:6], "big")
    return h / 2.0**48 - 0.5


def _power_method_deflate(cc, dim: int, seed: int, pinned_iters: int | None):
    """Deflated power iteration on the k×k Gram matrix, mirroring
    PivotMDS::powerMethod + the deflation loop (PivotMDS.cpp:82-133) in
    driver numpy (k×k is driver-sized by construction). Returns the
    ``dim`` sign-canonicalized eigenvectors as a list of length-k numpy
    arrays (and their eigenvalues)."""
    import numpy as np

    k = cc.shape[0]
    vecs, vals = [], []
    mat = cc.copy()
    for d in range(dim):
        v = np.array([_md5_unit(f"{seed}:pmds:d{d}:{j}") for j in range(k)])
        it = 0
        while True:
            old = v
            v = mat @ old
            nrm = float(np.linalg.norm(v)) or 1.0
            v = v / nrm
            it += 1
            if pinned_iters is not None:
                if it >= pinned_iters:
                    break
            elif float(np.linalg.norm(v - old)) <= 1e-6 or it >= 1500:
                break
        sq = float(v @ v) or 1.0
        lam = float((mat @ v) @ v) / sq
        # deflate BEFORE sign-canonicalizing (vvᵀ is sign-invariant, so
        # the order only matters for reproducing the oracle text exactly)
        mat = mat - (lam / sq) * np.outer(v, v)
        nz = np.nonzero(np.abs(v) > 1e-12)[0]
        if len(nz) and v[nz[0]] < 0:
            v = -v
        vecs.append(v)
        vals.append(lam)
    return vecs, vals


def pivot_mds(
    graph: Graph,
    dim: int = 2,
    num_pivots: int = 6,
    seed: int = 42,
    pinned_iters: int | None = None,
    max_depth: int | None = None,
) -> DataFrame:
    """(id, x0 … x{dim-1}) — PivotMDS coordinates (PivotMDS.cpp:22-111).

    Unweighted graphs use the batched multi-pivot BFS superstep; weighted
    graphs run the frontier-relaxation SSSP once per pivot (k is small by
    design — the reference default is 250 pivots at any n)."""
    import numpy as np

    spark = graph.vertices.sparkSession
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.operators.distance import multi_source_hops

    n = graph.num_nodes()
    k = min(int(num_pivots), n)

    # --- pivots: first k nodes by md5 rank (k driver scalars, j = rank) ---
    rk = F.expr(md5_long_sql(f"('{seed}:pmds:' || CAST(id AS STRING))"))
    rows = (
        graph.vertices.select("id", rk.alias("rk"))
        .orderBy("rk", "id")
        .limit(k)
        .collect()
    )
    pivots = [int(r["id"]) for r in rows]

    # --- pivot-distance table (s, id, dist) — n-sized, stays distributed ---
    if graph.weighted:
        from networkit_spark.operators.centrality import sssp_weighted

        parts = [
            # run each Bellman-Ford to its fixpoint (the loop exits as
            # soon as a round improves nothing): the default 50-round cap
            # would silently mark nodes >50 relaxations away unreachable
            # and center them at the disconnected-pair 0.0
            sssp_weighted(graph, s, max_iterations=None).select(
                F.lit(int(s)).alias("s"), "id", F.col("dist").cast("double")
            )
            for s in pivots
        ]
        hops = parts[0]
        for p in parts[1:]:
            hops = hops.unionByName(p)
    else:
        hops = multi_source_hops(graph, pivots, max_depth=max_depth).select(
            "s", "id", F.col("dist").cast("double").alias("dist")
        )

    jmap = spark.createDataFrame(
        [(int(s), j) for j, s in enumerate(pivots)], "s long, j int"
    )
    dm = hops.join(F.broadcast(jmap), "s").select("id", "j", "dist")

    # --- per-node length-k distance array; null = unreachable pair, which
    # stays exact 0.0 in C like the reference's absent CSR triplet ---
    darr = materialize(
        graph.vertices.select("id")
        .join(
            dm.groupBy("id").agg(
                F.array(
                    *[
                        F.max(F.when(F.col("j") == j, F.col("dist")))
                        for j in range(k)
                    ]
                ).alias("d")
            ),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce(
                "d", F.array(*[F.lit(None).cast("double") for _ in range(k)])
            ).alias("d"),
        )
    )

    # --- double centering (PivotMDS.cpp:50-73). row mean: zero-shuffle
    # per-row expr; column sums + grand total: ONE single-row aggregate
    # (k+1 driver scalars). grand = T/(n·k) — algebraically the
    # reference's Σ rowMean/(2n) + Σ colMean/(2k). ---
    agg = darr.agg(
        *[F.sum(F.col("d")[j]).alias(f"c{j}") for j in range(k)],
        F.sum(
            F.aggregate(
                "d", F.lit(0.0), lambda a, v: a + F.coalesce(v, F.lit(0.0))
            )
        ).alias("tot"),
    ).first()
    colmean = [float(agg[f"c{j}"] or 0.0) / n for j in range(k)]
    grand = float(agg["tot"] or 0.0) / (n * k)
    cm_lit = F.array(*[F.lit(c) for c in colmean])

    rowmean = (
        F.aggregate("d", F.lit(0.0), lambda a, v: a + F.coalesce(v, F.lit(0.0)))
        / F.lit(float(k))
    )
    carr = materialize(
        darr.select(
            "id",
            F.transform(
                "d",
                lambda v, i: F.when(
                    v.isNull(), F.lit(0.0)
                ).otherwise(
                    v - rowmean - F.element_at(cm_lit, i + 1) + F.lit(grand)
                ),
            ).alias("c"),
        )
    )

    # --- k×k Gram CᵀC: vectorized Arrow pass, one MᵀM partial per
    # partition (PivotMDS.cpp:77-79 mTmMultiply) ---
    def gram_partials(batches):
        import pandas as pd

        g = np.zeros((k, k))
        for pdf in batches:
            if len(pdf):
                m = np.vstack(pdf["c"].to_numpy())
                g += m.T @ m
        yield pd.DataFrame({"g": [g.ravel().tolist()]})

    partials = carr.select("c").mapInPandas(
        gram_partials, "g array<double>"
    ).collect()
    cc = np.zeros((k, k))
    for r in partials:
        cc += np.array(r["g"]).reshape(k, k)

    vecs, _ = _power_method_deflate(cc, dim, seed, pinned_iters)

    # --- coordinates x_d = C·v_d: zero-shuffle per-row dot products ---
    cols = ["id"]
    for d, v in enumerate(vecs):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        cols.append(
            F.aggregate(
                F.zip_with("c", vlit, lambda a, b: a * b),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias(f"x{d}")
        )
    return carr.select(*cols)


def known_distances(graph: Graph, k: int = 1) -> DataFrame:
    """(u, v, d) — MaxentStress's known-distance set S
    (MaxentStress.cpp:457-561 computeKnownDistances, GraphDistance::
    EDGE_WEIGHT): direct neighbors at their edge weight, plus the 2..k-hop
    neighborhood at BFS depth (unweighted) / shortest weighted distance
    (weighted). Fully distributed: the k-bounded batched multi-source BFS
    superstep. Self-pairs excluded.

    Weighted deviation (documented): hop-2..k distances come from k rounds
    of min-plus relaxation (shortest path using <= k edges) instead of the
    reference's full-graph Dijkstra stopped at the k-hop ball
    (MaxentStress.cpp:506-539) — identical whenever the weighted shortest
    path between k-hop neighbors uses at most k edges (always at k=1, and
    for any k on unweighted graphs)."""
    from networkit_spark.operators.distance import multi_source_hops

    direct = graph.edges.filter(F.col("src") != F.col("dst")).select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("weight").cast("double").alias("d"),
    )
    if k <= 1:
        return direct
    hops = multi_source_hops(graph, None, max_depth=k).filter(
        F.col("dist") >= 2
    )
    if not graph.weighted:
        ring = hops.select(
            F.col("s").alias("u"),
            F.col("id").alias("v"),
            F.col("dist").cast("double").alias("d"),
        )
        return direct.unionByName(ring)
    # weighted: k-round min-plus from every source, restricted at the end
    # to the 2..k-hop ring (one frontier relaxation per round, all
    # sources batched)
    e = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    dist = graph.vertices.select(
        F.col("id").alias("s"), F.col("id").alias("v"), F.lit(0.0).alias("d")
    )
    dist = materialize(dist)
    for _ in range(k):
        cand = (
            dist.join(e, dist["v"] == e["src"])
            .select("s", F.col("dst").alias("v"), (F.col("d") + F.col("w")).alias("d"))
            .unionByName(dist)
            .groupBy("s", "v")
            .agg(F.min("d").alias("d"))
        )
        dist = materialize(cand)
    ring = (
        dist.join(
            hops.select(F.col("s"), F.col("id").alias("v")), ["s", "v"]
        )
        .select(F.col("s").alias("u"), "v", "d")
    )
    return direct.unionByName(ring)


def maxent_stress(
    graph: Graph,
    dim: int = 2,
    k: int = 1,
    coords: DataFrame | None = None,
    q: float | None = None,
    alpha: float = 1.0,
    alpha_reduction: float = 0.3,
    final_alpha: float = 0.008,
    conv_threshold: float = 1e-6,
    max_solves_per_alpha: int = 50,
    fast_computation: bool = False,
    tolerance: float = 1e-3,
    cg_max_iters: int = 30,
    seed: int = 42,
    max_m: int = 200_000,
):
    """(coords DataFrame (id, x0..x{dim-1}), stats dict) — MaxentStress
    layout (MaxentStress.cpp:63-190): anneal alpha from ``alpha`` by
    ``alpha_reduction`` down to ``final_alpha``; per alpha run up to
    ``max_solves_per_alpha`` Laplacian solves L_w·x_d = rhs_d where
    L_w uses weights 1/d² over the known-distance set S
    (setupWeightedLaplacianMatrix, MaxentStress.hpp:297 weightingFactor),
    rhs is the coordinate-Laplacian stress term
    (computeCoordinateLaplacianTerm, incl. the Gansner-correction noted at
    MaxentStress.cpp:388) plus alpha × the normalized entropy/repulsive
    term, zero-sum corrected.

    Tier: the known-distance table S is distributed (known_distances);
    the solve loop is driver-vectorized numpy at FIXTURE tier — the
    reference's own tier needs a LAMG multigrid; we use its sanctioned
    CONJUGATE_GRADIENT_DIAGONAL_PRECONDITIONER solver type
    (MaxentStress.hpp LinearSolverType) with ``cg_max_iters`` per solve.
    Deviations (documented): repulsive forces use the reference's own
    EXACT computeRepulsiveForces (MaxentStress.cpp:401-431) rather than
    the theta=0.6 octree approximation OF that exact sum; the start
    layout is md5-derandomized on the unit sphere (randomSphereCoordinates
    is unseeded); the repulsive-refresh schedule floor(5·ln(numSolves))
    treats numSolves=0 as -1 (the reference feeds log(0) to an unsigned
    floor — UB we do not reproduce); q auto-sets to 0.8 when >30% of
    nodes have degree 1 (MaxentStress.cpp:480-489).
    """
    import math

    import numpy as np

    if graph.directed:
        raise ValueError("maxent_stress expects an undirected graph")
    n = graph.num_nodes()
    from networkit_spark.operators.components import connected_components

    ncomp = (
        connected_components(graph).select("label").distinct().count()
    )
    if ncomp != 1:
        raise ValueError(
            "MaxentStress only handles connected graphs (MaxentStress.cpp:67-71)"
        )

    require_fixture_scale(graph, max_m, "maxent_stress")
    ids = [int(r["id"]) for r in graph.vertices.select("id").orderBy("id").collect()]
    pos = {v: i for i, v in enumerate(ids)}

    S = known_distances(graph, k).collect()
    su = np.array([pos[int(r["u"])] for r in S], dtype=np.int64)
    sv = np.array([pos[int(r["v"])] for r in S], dtype=np.int64)
    sd = np.array([float(r["d"]) for r in S])
    card = len(sd)

    if q is None:
        # GRAPH degree, not S-incidence (MaxentStress.cpp:487-495 counts
        # G->degree(u)==1; at k>=2 the 2-hop pairs in S inflate every
        # leaf's S-degree past 1, which would never trigger the rule)
        deg1 = graph.degrees().filter(F.col("degree") == 1).count()
        q = 0.8 if n and deg1 / n > 0.3 else 0.0

    wf = 1.0 / (sd * sd)  # weightingFactor
    wdeg = np.zeros(n)
    np.add.at(wdeg, su, wf)

    def lap_mv(x):  # L_w @ x, one column
        out = wdeg * x
        np.add.at(out, su, -wf * x[sv])
        return out

    def cg_solve(b, x0):  # diagonal-preconditioned CG on the zero-sum system
        x = x0 - x0.mean()
        r = b - lap_mv(x)
        dinv = 1.0 / np.where(wdeg > 0, wdeg, 1.0)
        z = dinv * r
        p = z.copy()
        rz = float(r @ z)
        bn = float(np.linalg.norm(b)) or 1.0
        for _ in range(cg_max_iters):
            if float(np.linalg.norm(r)) / bn <= tolerance:
                break
            Ap = lap_mv(p)
            pap = float(p @ Ap)
            if pap <= 0:
                break
            a = rz / pap
            x = x + a * p
            r = r - a * Ap
            z = dinv * r
            rz_new = float(r @ z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        return x - x.mean()

    if coords is not None:
        cc = coords.columns
        got = {int(r[cc[0]]): [float(r[cc[1 + d]]) for d in range(dim)]
               for r in coords.collect()}
        X = np.array([got[v] for v in ids])
    else:
        # md5-derandomized random sphere start (randomSphereCoordinates)
        X = np.array(
            [
                [_md5_unit(f"{seed}:mes:{v}:{d}") for d in range(dim)]
                for v in ids
            ]
        )
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    known_mask = np.zeros((n, n), dtype=bool)  # fixture-tier dense mask
    known_mask[su, sv] = True
    np.fill_diagonal(known_mask, True)
    qsign = 1.0 if q >= 0.0 else -1.0
    q2 = (q + 2.0) / 2.0

    def repulsive(Xc):
        diff = Xc[:, None, :] - Xc[None, :, :]  # exact computeRepulsiveForces
        sq = np.maximum((diff**2).sum(axis=2), 1e-3)
        fac = qsign / np.power(sq, q2)
        fac[known_mask] = 0.0
        b = (fac[:, :, None] * diff).sum(axis=1)
        nrm = np.maximum(np.linalg.norm(b, axis=0), 1e-12)
        return b / nrm  # per-dim normalization (MaxentStress.cpp:425-429)

    cur_alpha = float(alpha)
    converged = False
    solves = 0
    rep = np.zeros_like(X)
    cur_lb = 0
    while not converged:
        for num_solves in range(max_solves_per_alpha):
            old = X.copy()
            new_lb = math.floor(5 * math.log(num_solves)) if num_solves > 0 else -1
            if new_lb != cur_lb:
                rep = repulsive(old)
                cur_lb = new_lb
            # coordinate-Laplacian stress term (computeCoordinateLaplacianTerm)
            geo = np.maximum(
                np.linalg.norm(old[su] - old[sv], axis=1), 1e-5
            )
            w = wf * sd / geo
            rhs = np.zeros_like(X)
            wdeg_cur = np.zeros(n)
            np.add.at(wdeg_cur, su, w)
            for d in range(dim):
                col = np.zeros(n)
                np.add.at(col, su, -w * old[sv, d])
                rhs[:, d] = col + wdeg_cur * old[:, d]
            if num_solves < max_solves_per_alpha // 5:
                rhs /= np.maximum(np.linalg.norm(rhs, axis=0), 1e-12)
            rhs += cur_alpha * rep
            rhs -= rhs.mean(axis=0)  # zero-sum correction
            for d in range(dim):
                X[:, d] = cg_solve(rhs[:, d], old[:, d])
            solves += 1
            rel = float(((X - old) ** 2).sum()) / (
                float((old**2).sum()) or 1.0
            )
            # faithful to MaxentStress.cpp:155-162 INCLUDING the quirk
            # that in the default (!fastComputation) mode per-alpha
            # convergence is deliberately discarded — all
            # max_solves_per_alpha solves run and conv_threshold only
            # short-circuits when fast_computation=True
            converged = rel < conv_threshold
            if converged:
                if not fast_computation:
                    converged = False
                else:
                    break
        cur_alpha *= alpha_reduction
        converged = converged or cur_alpha < final_alpha

    spark = graph.vertices.sparkSession
    out = spark.createDataFrame(
        [
            tuple([ids[i]] + [float(X[i, d]) for d in range(dim)])
            for i in range(n)
        ],
        "id long, " + ", ".join(f"x{d} double" for d in range(dim)),
    )
    stats = {"solves": solves, "q": q, "final_alpha": cur_alpha, "s_card": card}
    return out, stats


def _augmented_apsp(n, su, sv, sd):
    """Dense min-plus APSP over the known-distance graph S — the
    fullStressMeasure / computeScalingFactor referee substrate
    (MaxentStress.cpp:193-259 build augmentedGraph + per-source SSSP).
    Fixture tier by definition (the reference densifies per source too)."""
    import numpy as np

    D = np.full((n, n), np.inf)
    np.fill_diagonal(D, 0.0)
    D[su, sv] = np.minimum(D[su, sv], sd)
    for _ in range(max(n.bit_length(), 1)):  # repeated squaring
        D = np.minimum(D, (D[:, :, None] + D[None, :, :]).min(axis=1))
    return D


def _coords_matrix(graph, coords):
    import numpy as np

    cc = coords.columns
    rows = coords.collect()
    ids = sorted(int(r[cc[0]]) for r in rows)
    pos = {v: i for i, v in enumerate(ids)}
    X = np.zeros((len(ids), len(cc) - 1))
    for r in rows:
        for d in range(len(cc) - 1):
            X[pos[int(r[cc[0]])], d] = float(r[cc[1 + d]])
    return ids, pos, X


def _s_arrays(graph, pos, k):
    import numpy as np

    S = known_distances(graph, k).collect()
    su = np.array([pos[int(r["u"])] for r in S], dtype=np.int64)
    sv = np.array([pos[int(r["v"])] for r in S], dtype=np.int64)
    sd = np.array([float(r["d"]) for r in S])
    return su, sv, sd


def full_stress_measure(graph: Graph, coords: DataFrame, k: int = 1) -> float:
    """Σ_{u,v reachable, d>0} (‖x_u−x_v‖ − d)²/d² / 2 over the APSP of the
    known-distance graph (MaxentStress.cpp:240-268)."""
    import numpy as np

    ids, pos, X = _coords_matrix(graph, coords)
    su, sv, sd = _s_arrays(graph, pos, k)
    D = _augmented_apsp(len(ids), su, sv, sd)
    geo = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    m = np.isfinite(D) & (D >= 1e-5)
    return float((((geo[m] - D[m]) ** 2) / (D[m] ** 2)).sum()) / 2.0


def maxent_measure(
    graph: Graph, coords: DataFrame, k: int = 1,
    q: float = 0.0, final_alpha: float = 0.008,
) -> float:
    """Stress over S minus finalAlpha × entropy over non-S pairs
    (MaxentStress.cpp:270-305)."""
    import math

    import numpy as np

    ids, pos, X = _coords_matrix(graph, coords)
    su, sv, sd = _s_arrays(graph, pos, k)
    geo_all = np.maximum(
        np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)), 1e-5
    )
    n = len(ids)
    off = ~np.eye(n, dtype=bool)
    if abs(q) < 0.001:
        ent = float(np.log(geo_all[off]).sum())
    else:
        ent = float(np.power(geo_all[off], -q).sum())
    geo_s = np.maximum(np.linalg.norm(X[su] - X[sv], axis=1), 1e-5)
    energy = float((((geo_s - sd) ** 2) / (sd**2)).sum())
    if abs(q) < 0.001:
        ent -= float(np.log(geo_s).sum())
    else:
        ent -= float(np.power(geo_s, -q).sum())
    if abs(q) > 0.001:
        ent *= -math.copysign(1.0, q)
    return (energy - final_alpha * ent) / 2.0


def ldme(graph: Graph, coords: DataFrame, k: int = 1) -> float:
    """sqrt(mean over S of (d − ‖x_u−x_v‖)²) (MaxentStress.cpp:320-331)."""
    import numpy as np

    ids, pos, X = _coords_matrix(graph, coords)
    su, sv, sd = _s_arrays(graph, pos, k)
    geo = np.linalg.norm(X[su] - X[sv], axis=1)
    return float(np.sqrt(((sd - geo) ** 2).mean()))


def mean_distance_error(graph: Graph, coords: DataFrame, k: int = 1) -> float:
    """mean over S of |‖x_u−x_v‖ − d| / d (MaxentStress.cpp:307-317)."""
    import numpy as np

    ids, pos, X = _coords_matrix(graph, coords)
    su, sv, sd = _s_arrays(graph, pos, k)
    geo = np.linalg.norm(X[su] - X[sv], axis=1)
    return float((np.abs(geo - sd) / sd).mean())


def scale_layout(graph: Graph, coords: DataFrame, k: int = 1) -> DataFrame:
    """coords × s with s = Σ geo/d / Σ geo²/d² over APSP pairs of the
    known-distance graph (MaxentStress.cpp:193-238 scaleLayout)."""
    import numpy as np

    ids, pos, X = _coords_matrix(graph, coords)
    su, sv, sd = _s_arrays(graph, pos, k)
    D = _augmented_apsp(len(ids), su, sv, sd)
    geo = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    m = np.isfinite(D) & (D >= 1e-5)
    top = float((geo[m] / D[m]).sum())
    bot = float(((geo[m] ** 2) / (D[m] ** 2)).sum()) or 1.0
    s = top / bot
    dim = X.shape[1]
    spark = coords.sparkSession
    return spark.createDataFrame(
        [
            tuple([ids[i]] + [float(X[i, d] * s) for d in range(dim)])
            for i in range(len(ids))
        ],
        "id long, " + ", ".join(f"x{d} double" for d in range(dim)),
    )
