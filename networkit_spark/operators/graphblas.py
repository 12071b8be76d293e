"""GraphBLAS-style semiring layer — the `algebraic/` module counterpart.

Reference: include/networkit/algebraic/GraphBLAS.hpp (MxV, the
accumulating MxV overload), Semirings.hpp:25-144 (the six semirings),
CSRMatrix.cpp adjacencyMatrix (both directions stored for undirected),
and algebraic/algorithms/{AlgebraicBFS,AlgebraicBellmanFord,
AlgebraicPageRank,AlgebraicTriangleCounting}.hpp.

Spark-first shape: the "matrix" is what it always was in this engine —
the (row, col, val) nonzero DataFrame — and MxV over a semiring is ONE
equi-join (semiring `mult` in the join projection) plus ONE partial-agg
groupBy (semiring `add` as the aggregate): the identical physical
superstep the north-star operators already run; this module names the
algebra and gives the reference's algebraic algorithm surface a direct
counterpart. Per-superstep shuffle is bounded by the nonzero count, the
vector side is vertex-sized, and nothing is collected but convergence
scalars — the same scale discipline as operators/pagerank.py.

Role notes: AlgebraicMatchingCoarsening is covered by
operators/matching.py + operators/coarsening.py (MatchingCoarsening);
AlgebraicSpanningEdgeCentrality by operators/electrical.py (JL sketch).
AlgebraicTriangleCounting below is the faithful diag(A^3) formulation —
an UNORIENTED 3-walk join; the degree-ordered oriented join in
operators/triangles.py remains the production triangle path at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import materialize

_INF = float("inf")

# name -> (zero element, aggregate add, elementwise mult, elementwise add)
# matching Semirings.hpp:25-144; `elementwise add` combines two vectors
# row-wise for the accumulating MxV overload (GraphBLAS.hpp:100-129).
SEMIRINGS = {
    "arithmetic": (
        0.0,
        F.sum,
        lambda a, b: a * b,
        lambda a, b: a + b,
    ),
    "min_plus": (
        _INF,
        F.min,
        lambda a, b: a + b,
        F.least,
    ),
    "max_plus": (
        -_INF,
        F.max,
        lambda a, b: a + b,
        F.greatest,
    ),
    "min_max": (
        _INF,
        F.min,
        F.greatest,
        F.least,
    ),
    "max_min": (
        -_INF,
        F.max,
        F.least,
        F.greatest,
    ),
    "int_logical": (
        0.0,
        F.max,
        lambda a, b: F.when((a != 0) & (b != 0), F.lit(1.0)).otherwise(F.lit(0.0)),
        F.greatest,  # 0/1 OR
    ),
}


def adjacency(graph: Graph, transpose: bool = False) -> DataFrame:
    """(row, col, val) nonzeros of the adjacency matrix —
    CSRMatrix::adjacencyMatrix: A[i, j] = weight of edge i->j, both
    directions present for undirected graphs (this engine's undirected
    storage already holds both)."""
    r, c = ("dst", "src") if transpose else ("src", "dst")
    return graph.edges.select(
        F.col(r).alias("row"),
        F.col(c).alias("col"),
        F.col("weight").cast("double").alias("val"),
    )


def mxv(
    A: DataFrame,
    v: DataFrame,
    semiring: str = "arithmetic",
    vertices: DataFrame | None = None,
    accumulate: DataFrame | None = None,
) -> DataFrame:
    """result(id, value) = A (x) v under ``semiring`` — GraphBLAS::MxV:
    result[i] = add_j mult(A[i, j], v[j]), rows with no nonzeros at the
    semiring zero. With ``accumulate`` = c, computes the accumulating
    overload c'[i] = add(c[i], (A (x) v)[i]) instead. ``vertices`` (id)
    completes the result to the full vector; without it only rows with at
    least one nonzero (or a c entry) appear."""
    if semiring not in SEMIRINGS:
        raise ValueError(f"unknown semiring {semiring!r}; one of {sorted(SEMIRINGS)}")
    zero, agg, mult, eadd = SEMIRINGS[semiring]
    prod = A.join(
        v.select(F.col("id").alias("col"), F.col("value").alias("_vv")), "col"
    ).select(F.col("row").alias("id"), mult(F.col("val"), F.col("_vv")).alias("_p"))
    res = prod.groupBy("id").agg(agg("_p").alias("value"))
    if accumulate is not None:
        res = (
            accumulate.withColumnRenamed("value", "_c")
            .join(res, "id", "full")
            .select(
                "id",
                eadd(
                    F.coalesce(F.col("_c"), F.lit(zero)),
                    F.coalesce(F.col("value"), F.lit(zero)),
                ).alias("value"),
            )
        )
    if vertices is not None:
        res = (
            vertices.select("id")
            .join(res, "id", "left")
            .select("id", F.coalesce(F.col("value"), F.lit(zero)).alias("value"))
        )
    return res


def _relax_to_fixpoint(
    graph: Graph, source: int, max_relaxations: int | None
) -> tuple[DataFrame, int, bool]:
    """Shared MinPlus relaxation loop of AlgebraicBFS / AlgebraicBellmanFord:
    d' = add(d, At (x) d); returns (distances, relaxations run, changed on
    the last executed relaxation). Early-exits once a relaxation is a
    no-op — every further MxV of the reference's fixed loop is then
    bit-identical, so the early exit is unobservable."""
    spark = graph.vertices.sparkSession
    At = materialize(adjacency(graph, transpose=True))
    d = graph.vertices.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).otherwise(F.lit(_INF)).alias("value"),
    ).localCheckpoint(eager=True)
    it, changed = 0, False
    while max_relaxations is None or it < max_relaxations:
        it += 1
        new = mxv(At, d, "min_plus", accumulate=d).localCheckpoint(eager=True)
        n_changed = (
            new.withColumnRenamed("value", "nv")
            .join(d, "id")
            .filter(F.col("nv") != F.col("value"))
            .count()
        )
        changed = n_changed > 0
        d = new
        if not changed:
            break
    return d, it, changed


def algebraic_bfs(
    graph: Graph, source: int, max_iterations: int | None = None
) -> DataFrame:
    """(id, dist) — AlgebraicBFS.hpp:55-69: MinPlus MxV relaxations of the
    transposed adjacency to the fixpoint (weighted distances; +inf for
    unreachable nodes, like Vector's infinity init)."""
    d, _, _ = _relax_to_fixpoint(graph, source, max_iterations)
    return d.select("id", F.col("value").alias("dist"))


def algebraic_bellman_ford(
    graph: Graph,
    source: int,
    relaxations: int | None = None,
    detect_negative_cycle: bool = True,
) -> tuple[DataFrame, bool]:
    """((id, dist), has_negative_cycle) — AlgebraicBellmanFord.hpp:70-83:
    n-1 MinPlus relaxations (``relaxations`` overrides the bound; the loop
    early-exits at the fixpoint, which is unobservable — see
    _relax_to_fixpoint), then one extra relaxation whose change flag IS
    the negative-cycle verdict."""
    n = graph.num_nodes()
    bound = relaxations if relaxations is not None else max(0, n - 1)
    d, it, changed = _relax_to_fixpoint(graph, source, bound)
    neg = False
    if detect_negative_cycle:
        if it >= bound and changed:
            # ran out of budget still changing: one probe relaxation
            At = materialize(adjacency(graph, transpose=True))
            probe = mxv(At, d, "min_plus", accumulate=d)
            neg = (
                probe.withColumnRenamed("value", "nv")
                .join(d, "id")
                .filter(F.col("nv") != F.col("value"))
                .count()
                > 0
            )
        # else: converged inside the bound -> the extra relaxation is a
        # no-op by definition -> no negative cycle reachable from source
    return d.select("id", F.col("value").alias("dist")), neg


def algebraic_pagerank(
    graph: Graph,
    damp: float = 0.85,
    tol: float = 1e-8,
    max_iterations: int | None = None,
) -> DataFrame:
    """(id, score) — AlgebraicPageRank.hpp:34-116: M[j, i] = damp *
    A[i, j] / rowsum_i (plain out-weight sum — the algebraic variant does
    NOT double self-loops, unlike PageRank.cpp's weightedDegree; on
    loop-free graphs the two agree), iterate rank = M (x) rank + teleport
    until the L2 step delta <= tol, then sum-normalize."""
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")
    teleport = (1.0 - damp) / n
    outsum = graph.edges.groupBy("src").agg(F.sum("weight").alias("os"))
    M = materialize(
        graph.edges.join(outsum, "src")
        .filter(F.col("os") != 0)
        .select(
            F.col("dst").alias("row"),
            F.col("src").alias("col"),
            (F.lit(damp) * F.col("weight").cast("double") / F.col("os")).alias("val"),
        )
    )
    rank = graph.vertices.select("id", F.lit(1.0 / n).alias("value")).localCheckpoint(
        eager=True
    )
    it = 0
    while True:
        it += 1
        new = (
            mxv(M, rank, "arithmetic", vertices=graph.vertices)
            .select("id", (F.col("value") + F.lit(teleport)).alias("value"))
            .localCheckpoint(eager=True)
        )
        delta2 = (
            new.withColumnRenamed("value", "nv")
            .join(rank, "id")
            .agg(F.sum((F.col("nv") - F.col("value")) ** 2).alias("d"))
            .first()["d"]
            or 0.0
        )
        rank = new
        if math.sqrt(delta2) <= tol or (
            max_iterations is not None and it >= max_iterations
        ):
            break
    total = rank.agg(F.sum("value")).first()[0] or 1.0
    return rank.select("id", (F.col("value") / F.lit(total)).alias("score"))


def algebraic_triangle_counting(graph: Graph) -> DataFrame:
    """(id, score) — AlgebraicTriangleCounting.hpp:58-72: score[i] =
    diag(A^3)[i], halved for undirected graphs and truncated to a count
    like the reference's double->count assignment. Expressed as the
    3-walk closure join over the nonzeros (two equi-joins + one
    partial-agg groupBy) rather than a literal matrix power — same
    diagonal, declared plan. Unoriented, so ~3x the oriented join of
    operators/triangles.py, which stays the production path at scale."""
    A = materialize(adjacency(graph))
    e1 = A.select(F.col("row").alias("i"), F.col("col").alias("j"), F.col("val").alias("v1"))
    e2 = A.select(F.col("row").alias("j"), F.col("col").alias("k"), F.col("val").alias("v2"))
    e3 = A.select(F.col("row").alias("k"), F.col("col").alias("i2"), F.col("val").alias("v3"))
    walks = (
        e1.join(e2, "j")
        .join(e3, "k")
        .filter(F.col("i2") == F.col("i"))
        .groupBy(F.col("i").alias("id"))
        .agg(F.sum(F.col("v1") * F.col("v2") * F.col("v3")).alias("d3"))
    )
    half = F.col("d3") if graph.directed else F.col("d3") / F.lit(2.0)
    return (
        graph.vertices.select("id")
        .join(walks, "id", "left")
        .select(
            "id",
            F.floor(F.coalesce(half, F.lit(0.0))).cast("long").alias("score"),
        )
    )
