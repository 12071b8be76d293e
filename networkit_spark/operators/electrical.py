"""Commute-time distance via a distributed Laplacian solve (ref:
networkit/cpp/distance/CommuteTimeDistance.cpp:172-189 runSinglePair —
solve L x = e_u - e_v, return sqrt(|x_u - x_v| * vol(G)); the reference
solves with the Lamg multigrid from numerics/).

Spark-first re-expression: the Laplacian never materializes — a damped
Jacobi iteration x' = (1-w)x + w D^{-1}(b + A x) needs only the adjacency
matvec, which is the engine's standard one-join-one-agg superstep (the
same shape as PageRank's score push and algebraic_loads' smoothing). All
k requested pairs are solved SIMULTANEOUSLY as k DOUBLE columns of one
DataFrame, so the per-superstep cost is one O(m)-row shuffle regardless
of k.

Fixed-iteration damped Jacobi (not Lamg/CG) is chosen deliberately: it is
a pure deterministic function of the graph, so the DuckDB oracle can
unroll the identical supersteps and hash-match — the same trade
algebraic.py makes. Semantics: for b ⊥ 1 on a connected graph the Jacobi
error's only non-decaying mode is the constant vector, which the
difference x_u - x_v cancels, so the pair distance converges (damping
w < 1 also kills the bipartite -1 mode); the pytest checks convergence
against a numpy pseudo-inverse ground truth. At production scale the
natural upgrade is Chebyshev acceleration or CG over the same matvec
superstep — the plan shape does not change.

Self-loops carry no current: they cancel out of L = D - A, so the solve
uses loop-free adjacency/degrees. vol(G) follows GraphTools::volume
(weightedDegree summed over nodes, self-loops counted twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def commute_time_distance(
    graph: Graph,
    pairs: list[tuple[int, int]],
    num_iters: int = 40,
    omega: float = 0.5,
) -> DataFrame:
    """(u, v, ctd) for each requested pair. Undirected graphs only
    (CommuteTimeDistance.cpp:21-23)."""
    if graph.directed:
        raise ValueError("commute time distance needs an undirected graph")
    spark = graph.vertices.sparkSession
    cols = [f"x{j}" for j in range(len(pairs))]

    adj = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("d"))
    # vol = sum of weighted degrees, self-loops twice (GraphTools::volume)
    vol = float(
        graph.edges.agg(
            (
                F.sum(F.col("weight").cast("double"))
                + F.sum(
                    F.when(F.col("src") == F.col("dst"), F.col("weight"))
                    .otherwise(F.lit(0.0))
                    .cast("double")
                )
            ).alias("v")
        ).collect()[0][0]
    )

    b_exprs = [
        F.when(F.col("id") == int(u), F.lit(1.0))
        .when(F.col("id") == int(v), F.lit(-1.0))
        .otherwise(F.lit(0.0))
        .alias(f"b{j}")
        for j, (u, v) in enumerate(pairs)
    ]
    state0 = graph.vertices.select(
        "id", *b_exprs, *[F.lit(0.0).alias(c) for c in cols]
    ).join(deg, "id", "left")
    x = materialize(state0)

    state = IterationState(None, "commute_time")
    for t in range(1, num_iters + 1):
        nbr = (
            adj.join(x.select(F.col("id").alias("dst"), *cols), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.sum(F.col("w") * F.col(c)).alias(f"v_{c}") for c in cols])
        )
        x = x.join(nbr, "id", "left").select(
            "id",
            *[F.col(f"b{j}") for j in range(len(pairs))],
            *[
                F.when(
                    F.col("d").isNotNull(),
                    (1.0 - omega) * F.col(c)
                    + omega
                    * (F.col(f"b{j}") + F.coalesce(F.col(f"v_{c}"), F.lit(0.0)))
                    / F.col("d"),
                )
                .otherwise(F.col(c))
                .alias(c)
                for j, c in enumerate(cols)
            ],
            "d",
        )
        x = state.advance(t, x)
    state.close()

    want = sorted({int(n) for p in pairs for n in p})
    got = {
        r["id"]: r
        for r in x.filter(F.col("id").isin(want)).collect()
    }
    rows = []
    for j, (u, v) in enumerate(pairs):
        c = cols[j]
        diff = abs(got[int(u)][c] - got[int(v)][c])
        rows.append((int(u), int(v), float((diff * vol) ** 0.5)))
    return spark.createDataFrame(rows, "u long, v long, ctd double")


def spanning_edge_scores(
    graph: Graph,
    num_systems: int = 8,
    num_iters: int = 40,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, sec) per canonical (src < dst) undirected edge —
    approximate spanning-edge centrality / effective resistance.

    Reference: networkit/cpp/centrality/SpanningEdgeCentrality.cpp:68-104
    runApproximation — k Johnson-Lindenstrauss sketches: per sketch j,
    every edge draws a sign r in {+1,-1}/sqrt(k); rhs accumulates +r at
    the lower endpoint and -r at the higher; solve L x_j = rhs_j; then
    sec(e) = sum_j (x_j[u] - x_j[v])^2.  The reference draws signs from
    its RNG and solves with Lamg; here the signs are hash-derandomized
    (md5 of (seed, j, src, dst) — a pure function both engines compute
    identically) and the solve is the same fixed-superstep damped Jacobi
    as commute_time_distance, so the DuckDB oracle can unroll the exact
    computation.  All k systems ride as k DOUBLE columns of one
    DataFrame: one O(m)-row shuffle per superstep regardless of k, and
    the final score is one join of the solution against the canonical
    edge table — nothing vertex-sized is collected or broadcast.
    """
    x, signs = _jl_solutions(graph, num_systems, num_iters, omega, seed)
    cols = [f"x{j}" for j in range(num_systems)]
    xu = x.select(F.col("id").alias("src"), *[F.col(c).alias(f"u_{c}") for c in cols])
    xv = x.select(F.col("id").alias("dst"), *[F.col(c).alias(f"v_{c}") for c in cols])
    score = sum(
        (F.col(f"u_{c}") - F.col(f"v_{c}")) * (F.col(f"u_{c}") - F.col(f"v_{c}"))
        for c in cols
    )
    return (
        signs.select("src", "dst")
        .join(xu, "src")
        .join(xv, "dst")
        .select("src", "dst", score.alias("sec"))
    )


def _jl_solutions(graph, num_systems, num_iters, omega, seed):
    """(x, signs): the k damped-Jacobi solutions of L x_j = B^T q_j for
    hash-derandomized JL sign sketches q_j — the shared core of
    spanning_edge_scores and approx_electrical_closeness."""
    from networkit_spark.functions.hashing import md5_long_sql

    if graph.directed:
        raise ValueError("the JL Laplacian sketch needs an undirected graph")
    k = num_systems
    r = 1.0 / (k ** 0.5)
    cols = [f"x{j}" for j in range(k)]

    adj = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("d"))
    canon = adj.filter(F.col("src") < F.col("dst")).select("src", "dst")
    sign_exprs = [
        F.when(
            F.expr(
                md5_long_sql(
                    f"(CONCAT('{seed}:sec:{j}:', CAST(src AS STRING), ':', "
                    f"CAST(dst AS STRING)))"
                )
            )
            % 2
            == 0,
            F.lit(r),
        )
        .otherwise(F.lit(-r))
        .alias(f"s{j}")
        for j in range(k)
    ]
    signs = materialize(canon.select("src", "dst", *sign_exprs))

    ends = signs.select(
        F.col("src").alias("id"), *[F.col(f"s{j}") for j in range(k)]
    ).unionByName(
        signs.select(
            F.col("dst").alias("id"), *[(-F.col(f"s{j}")).alias(f"s{j}") for j in range(k)]
        )
    )
    b = ends.groupBy("id").agg(
        *[F.sum(f"s{j}").alias(f"b{j}") for j in range(k)]
    )
    x = materialize(
        graph.vertices.select("id")
        .join(b, "id", "left")
        .join(deg, "id", "left")
        .select(
            "id",
            *[F.coalesce(F.col(f"b{j}"), F.lit(0.0)).alias(f"b{j}") for j in range(k)],
            *[F.lit(0.0).alias(c) for c in cols],
            "d",
        )
    )

    state = IterationState(None, "spanning_edge")
    for t in range(1, num_iters + 1):
        nbr = (
            adj.join(x.select(F.col("id").alias("dst"), *cols), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.sum(F.col("w") * F.col(c)).alias(f"v_{c}") for c in cols])
        )
        x = x.join(nbr, "id", "left").select(
            "id",
            *[F.col(f"b{j}") for j in range(k)],
            *[
                F.when(
                    F.col("d").isNotNull(),
                    (1.0 - omega) * F.col(c)
                    + omega
                    * (F.col(f"b{j}") + F.coalesce(F.col(f"v_{c}"), F.lit(0.0)))
                    / F.col("d"),
                )
                .otherwise(F.col(c))
                .alias(c)
                for j, c in enumerate(cols)
            ],
            "d",
        )
        x = state.advance(t, x)
    state.close()

    return x, signs


def approx_electrical_closeness(
    graph: Graph,
    num_systems: int = 8,
    num_iters: int = 40,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(id, score) — approximate electrical (current-flow) closeness:
    score(v) = (n-1) / sum_u r_eff(v, u).

    Reference: centrality/ApproxElectricalCloseness.cpp (Angriman et al.
    2020) estimates diag(L+) with uniform spanning trees sampled by
    Wilson's algorithm — loop-erased sequential random walks, a poor
    distributed fit. Documented deviation with the same estimand: the
    SpanningEdgeCentrality JL machinery already solves L x_j = B^T q_j
    for k hash-derandomized sign sketches (q_j ~ +/-1/sqrt(k)); the
    solution covariance is E[x x^T] = L+ B^T B L+ = L+ on unweighted
    graphs, so diag(L+)_v ~ sum_j x_j[v]^2. The farness identity
    sum_u r(v,u) = n*L+_vv + tr(L+) - 2*(L+ 1)_v loses its cross term
    because L+ annihilates the all-ones vector, leaving one scan:
    score(v) = (n-1) / (n*diag_v + trace). Cost: the same k-column
    Jacobi supersteps as spanning_edge_scores plus two aggregations."""
    sols, _signs = _jl_solutions(graph, num_systems, num_iters, omega, seed)
    cols = [f"x{j}" for j in range(num_systems)]
    n = graph.num_nodes()
    diag = sols.select(
        "id", sum((F.col(c) * F.col(c)) for c in cols).alias("dg")
    )
    trace = diag.agg(F.sum("dg")).first()[0] or 0.0
    return diag.select(
        "id",
        (F.lit(float(n - 1)) / (F.lit(float(n)) * F.col("dg") + F.lit(float(trace)))).alias(
            "score"
        ),
    )
