"""Spectral partitioning — networkit/partitioning.py:56-200
(SpectralPartitioner) re-expressed as supersteps.

The reference calls scipy.sparse.linalg eigensolvers on the Laplacian
(networkit/algebraic.py laplacianEigenvectors) — driver-side dense math.
Here the Fiedler vector comes from deflated power iteration on
M = cI - L with c = 2 * max weighted degree (so M is PSD and its top
eigenvector is the constant vector): each step is one matvec superstep
(the exact join+groupBy shape of eigenvector_centrality), followed by
mean-subtraction (deflating the constant eigenvector) and L2
normalization — both single-row aggregates. Gershgorin bounds every
eigenvalue of L by 2*max_wdeg, so c - lambda_2(L) is the dominant
eigenvalue on the deflated subspace and the iteration converges to the
Fiedler vector.

Self-loops are dropped (they cancel in L by definition).

Bisection follows the reference exactly: balanced=True splits at the
floor(n/2)-th smallest value (partitioning.py:88-99 _getQuantiles with
count=1), balanced=False at the mean (_getMean); label 0 iff f < split.
The split rank is computed with the distributed range-partition cumsum,
never a global window. The sign of an eigenvector is arbitrary — the
vector is canonicalized so its first nonzero coordinate (by id order)
is positive, making the labels deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def fiedler_vector(
    graph: Graph, num_iters: int = 30, seed: int = 42
) -> DataFrame:
    """(id, f) — unit-norm approximate Fiedler vector (second-smallest
    Laplacian eigenvector) after ``num_iters`` deflated power steps from
    a hash-derandomized start."""
    from networkit_spark.functions.hashing import md5_long_sql

    spark = graph.vertices.sparkSession
    g = graph.to_undirected() if graph.directed else graph
    edges = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    wdeg = edges.groupBy(F.col("dst").alias("id")).agg(F.sum("w").alias("wd"))
    verts = materialize(
        graph.vertices.select("id")
        .join(wdeg, "id", "left")
        .fillna({"wd": 0.0})
    )
    # lambda_max(L) <= max over edges of wd(u) + wd(v) (Anderson-Morley),
    # tighter than 2*max_wd -> larger per-step contraction toward lambda_2
    c = (
        edges.join(
            verts.select(F.col("id").alias("src"), F.col("wd").alias("wu")),
            "src",
        )
        .join(
            verts.select(F.col("id").alias("dst"), F.col("wd").alias("wv")),
            "dst",
        )
        .agg(F.max(F.col("wu") + F.col("wv")))
        .first()[0]
        or 1.0
    )

    h = F.expr(md5_long_sql(f"('{seed}:fv:' || CAST(id AS STRING))"))
    x = verts.select("id", "wd", (h / F.lit(2.0**48) - 0.5).alias("x"))
    state = IterationState(None, "fiedler")
    x = state.advance(0, x)

    for it in range(1, num_iters + 1):
        # one matvec superstep: y = (c - wd) * x + W @ x, then deflate+normalize
        msgs = (
            edges.join(
                x.select(F.col("id").alias("src"), F.col("x").alias("xs")), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("xs") * F.col("w")).alias("mass"))
        )
        raw = state.advance(
            it,
            x.join(msgs, "id", "left")
            .select(
                "id",
                "wd",
                (
                    (F.lit(c) - F.col("wd")) * F.col("x")
                    + F.coalesce("mass", F.lit(0.0))
                ).alias("y"),
            ),
        )
        # ONE action per superstep: ||y - mu||^2 == sum(y^2) - n*mu^2
        # (y is near-centered unit-scale after step 1, so no cancellation)
        st = raw.agg(
            F.avg("y").alias("mu"),
            F.sum(F.col("y") * F.col("y")).alias("ss"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        nrm = max(st["ss"] - st["n"] * st["mu"] * st["mu"], 0.0) ** 0.5 or 1.0
        x = raw.select(
            "id", "wd",
            ((F.col("y") - F.lit(st["mu"])) / F.lit(nrm)).alias("x"),
        )

    # canonical sign: first nonzero coordinate in id order is positive
    first = (
        x.filter(F.abs("x") > 1e-12)
        .orderBy("id")
        .limit(1)
        .select("x")
        .first()
    )
    sign = -1.0 if (first and first["x"] < 0) else 1.0
    return x.select("id", (F.col("x") * F.lit(sign)).alias("f"))


def spectral_bisection(
    graph: Graph,
    num_iters: int = 30,
    balanced: bool = True,
    seed: int = 42,
) -> DataFrame:
    """(id, f, label) — SpectralPartitioner._bisect for count=2
    (partitioning.py:140-176): label 0 iff f < split, split = the
    floor(n/2)-th smallest f (balanced) or the mean f. The comparison
    runs on f ROUNDED to 6 decimals so the discrete decision is
    reproducible across engines (the same robustness contract as the
    eigenvector-score oracle). k > 2 in the reference is recursive
    bisection per block with higher eigenvectors — apply this per
    subgraph to reproduce it."""
    from networkit_spark.functions.ordering import global_cumsum

    fv = fiedler_vector(graph, num_iters=num_iters, seed=seed).select(
        "id", F.round("f", 6).alias("f")
    )
    fv = materialize(fv)
    if balanced:
        n = fv.count()
        ranked = global_cumsum(
            fv.withColumn("_one", F.lit(1)), ["f", "id"], ["_one"]
        )
        split = (
            ranked.filter(F.col("cum__one") == n // 2 + 1)
            .select("f")
            .first()["f"]
        )
    else:
        split = fv.agg(F.avg("f")).first()[0]
    return fv.select(
        "id",
        "f",
        F.when(F.col("f") < F.lit(split), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("label"),
    )


def spectral_coloring(graph: Graph, max_n: int = 4096) -> DataFrame:
    """(id, color) — SpectralColoring (networkit/coloring.py:6-58, the
    reference's experimental pure-Python class): compute the adjacency
    spectrum, then recursively sign-split every color class on successive
    eigenvectors (descending eigenvalue order, adjacencyEigenvectors'
    LA ordering) until each class is an independent set. Faithful port of
    the recursion including the validity re-probe per split; eigenvector
    SIGNS are pinned (first nonzero component positive) because scipy
    leaves them arbitrary — any sign choice yields a proper coloring, the
    pin makes this one deterministic (documented deviation).

    Fixture-tier by the reference's own construction (it densifies the
    adjacency and takes the full spectrum); ``max_n`` guards the dense
    eigendecomposition. Luby MIS (`graph_mis`) remains the distributed
    independence operator."""
    import numpy as np

    ids = sorted(int(r["id"]) for r in graph.vertices.collect())
    n = len(ids)
    if n > max_n:
        raise ValueError(
            f"spectral_coloring densifies the adjacency; n={n} > max_n={max_n}"
        )
    spark = graph.vertices.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, color long")
    pos = {u: i for i, u in enumerate(ids)}
    A = np.zeros((n, n))
    nbrs: dict[int, set[int]] = {i: set() for i in range(n)}
    for r in graph.edges.select("src", "dst", "weight").collect():
        i, j = pos[int(r["src"])], pos[int(r["dst"])]
        A[i, j] = float(r["weight"])
        A[j, i] = float(r["weight"])
        if i != j:
            nbrs[i].add(j)
            nbrs[j].add(i)
    w, v = np.linalg.eigh(A)
    order = np.argsort(w)[::-1]  # descending eigenvalue (LA mode)
    vecs = v[:, order].T
    for k in range(n):  # pin arbitrary eigenvector signs
        nz = np.nonzero(vecs[k])[0]
        if len(nz) and vecs[k][nz[0]] < 0:
            vecs[k] = -vecs[k]

    colors: dict[int, set[int]] = {0: set(range(n))}
    next_color = [1]

    def valid(c: int) -> bool:
        members = colors[c]
        return all(nbrs[x].isdisjoint(members) for x in members)

    def split(c: int, depth: int = 0) -> None:
        if depth >= n:
            raise RuntimeError("spectral recursion exhausted the spectrum")
        other = next_color[0]
        next_color[0] += 1
        vs = colors[c]
        colors[c] = {x for x in vs if vecs[depth][x] >= 0}
        colors[other] = {x for x in vs if vecs[depth][x] < 0}
        if not valid(c):
            split(c, depth + 1)
        if not valid(other):
            split(other, depth + 1)

    split(0)
    rows = [
        (ids[x], c) for c, members in colors.items() for x in members
    ]
    return spark.createDataFrame(sorted(rows), "id long, color long")
