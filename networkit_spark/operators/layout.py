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

from networkit_spark.graph import Graph
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
            sssp_weighted(graph, s).select(
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
