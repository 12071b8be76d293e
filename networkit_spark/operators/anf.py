"""ANF sketches: approximate neighborhood function, effective diameter,
hop plot — Flajolet-Martin bitmask supersteps.

References:
- networkit/cpp/distance/NeighborhoodFunctionApproximation.cpp:35-150 —
  k per-node FM bitmasks, init bit i with P=0.5^(i+1); per hop every node
  ORs its neighbors' previous masks into its own; the estimate is
  2^(avg lowest-unset-bit / k) / 0.77351; N(h) = the sum of estimates over
  all nodes (finished nodes keep contributing their frozen estimate).
- networkit/cpp/distance/EffectiveDiameterApproximation.cpp:20-120 — same
  sketch; a node "finishes" at the first hop h where its estimate reaches
  ceil(ratio*n) or its masks equal the global OR of all initial masks;
  effectiveDiameter = sum of finish hops / n.
- networkit/cpp/distance/HopPlotApproximation.cpp — same sketch, reported
  as the fraction of connected pairs per hop.

Derandomization: the reference draws Aux::Random per (node, sketch); for
cross-engine determinism bit positions come from the trailing zeros of a
seeded 48-bit md5 (exactly the geometric P(i)=0.5^(i+1) law). The
reference refuses disconnected graphs; we instead cap at ``max_h`` and
document that never-finished nodes contribute the cap.

Spark-first plan: masks live as k BIGINT columns on a vertex DataFrame;
one superstep = edges-join + groupBy(dst).bit_or per column + coalesce OR
with the node's own mask — all JVM-side integer ops, partial-aggregated
map-side, no Python in the loop. Because masks are monotone under OR and
bounded by the global OR, a finished node's estimate freezes by itself —
no active-set bookkeeping is needed, so the loop is a pure fixed-H
superstep chain bounded by IterationState. At 10^9 vertices this is the
diameter path you'd actually run (exact APSP is off the table), and the
sketch width grows only as log2(n)+r bits.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import (
    fm_init_mask_sql,
    lowest_unset_bit_pos_sql,
    md5_long_sql,
)
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize

FM_CORRECTION = 0.77351  # NeighborhoodFunctionApproximation.cpp:111


def anf_estimates(
    graph: Graph,
    k: int = 8,
    r: int = 7,
    seed: int = 42,
    max_h: int = 16,
) -> DataFrame:
    """(id, h, b_sum, est, finished) for h = 1..max_h: per node the integer
    sum of lowest-unset-bit indices over the k sketches, the FM estimate of
    |ball(id, h)| it induces, and whether the masks hit the global maximum
    (the reference's nodeFinished). One row per node per hop."""
    g = graph.to_undirected() if graph.directed else graph
    n = g.num_nodes()
    width = math.ceil(math.log2(max(n, 2))) + r
    edges = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )

    mcols = [f"m{j}" for j in range(k)]
    init = [
        F.expr(
            fm_init_mask_sql(
                md5_long_sql(f"('{seed}:anf:{j}:' || CAST(id AS STRING))"), width
            )
        ).alias(mcols[j])
        for j in range(k)
    ]
    masks = materialize(g.vertices.select("id", *init))
    # global OR of initial masks = every node's fixed point (1 row, k cols)
    highest = masks.agg(
        *[F.expr(f"bit_or({c})").alias(f"h_{c}") for c in mcols]
    )

    b_sum = "(" + " + ".join(lowest_unset_bit_pos_sql(c) for c in mcols) + ")"
    est = F.expr(f"POWER(2, CAST({b_sum} AS DOUBLE) / {k}) / {FM_CORRECTION}")
    fin = F.expr(" AND ".join(f"({c} = h_{c})" for c in mcols))

    state = IterationState(None, "anf")
    snaps: list[DataFrame] = []
    for h in range(1, max_h + 1):
        nbr = (
            edges.join(masks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(*[F.expr(f"bit_or({c})").alias(f"n_{c}") for c in mcols])
        )
        masks = masks.join(nbr, "id", "left").select(
            "id",
            *[
                F.expr(f"{c} | COALESCE(n_{c}, CAST(0 AS BIGINT))").alias(c)
                for c in mcols
            ],
        )
        masks = state.advance(h, masks)
        snaps.append(
            masks.crossJoin(F.broadcast(highest)).select(
                "id",
                F.lit(h).cast("int").alias("h"),
                F.expr(b_sum).cast("int").alias("b_sum"),
                est.alias("est"),
                fin.alias("finished"),
            )
        )
    state.close()
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out


def neighborhood_function_approx(
    graph: Graph,
    k: int = 8,
    r: int = 7,
    seed: int = 42,
    max_h: int = 16,
    estimates: DataFrame | None = None,
) -> DataFrame:
    """(h, nf, hop_plot): N(h) = Σ_v est(v, h) and the hop plot
    min(1, N(h)/n²) (HopPlotApproximation.cpp normalization)."""
    est = (
        estimates
        if estimates is not None
        else anf_estimates(graph, k=k, r=r, seed=seed, max_h=max_h)
    )
    n = graph.num_nodes()
    return (
        est.groupBy("h")
        .agg(F.sum("est").alias("nf_raw"))
        .select(
            "h",
            F.round("nf_raw", 4).alias("nf"),
            F.round(F.least(F.lit(1.0), F.col("nf_raw") / (n * n)), 6).alias(
                "hop_plot"
            ),
        )
        .orderBy("h")
    )


def fm_finish_cutoff(k: int, threshold: int) -> int:
    """Smallest integer bit-sum S with 2^(S/k)/0.77351 >= threshold. The
    estimate-vs-threshold comparison reduces to an integer compare, so the
    Spark and DuckDB sides can never disagree on a float boundary."""
    return math.ceil(k * math.log2(max(threshold, 1) * FM_CORRECTION) - 1e-12)


def effective_diameter_approx(
    graph: Graph,
    ratio: float = 0.9,
    k: int = 8,
    r: int = 7,
    seed: int = 42,
    max_h: int = 16,
    estimates: DataFrame | None = None,
) -> DataFrame:
    """One row (eff_diameter double): mean over nodes of the first hop
    where the node's estimate reaches ceil(ratio*n) or its masks are
    globally maximal; never-finished nodes contribute max_h (see module
    docstring on the disconnected-graph deviation)."""
    est = (
        estimates
        if estimates is not None
        else anf_estimates(graph, k=k, r=r, seed=seed, max_h=max_h)
    )
    n = graph.num_nodes()
    s_cut = fm_finish_cutoff(k, math.ceil(ratio * n))
    # integer compare — the estimate is monotone in b_sum, so crossing the
    # ratio threshold is exactly b_sum >= s_cut (no float boundary to
    # disagree on across engines)
    crossed = F.col("finished") | (F.col("b_sum") >= F.lit(s_cut))
    done = (
        est.filter(crossed)
        .groupBy("id")
        .agg(F.min("h").alias("done_h"))
    )
    return (
        est.select("id")
        .distinct()
        .join(done, "id", "left")
        .select(F.coalesce("done_h", F.lit(max_h)).alias("done_h"))
        .agg(F.round(F.sum("done_h") / n, 6).alias("eff_diameter"))
    )


def neighborhood_function_heuristic(
    graph, n_samples: int = 0, max_depth: int | None = None
) -> DataFrame:
    """(dist, nf) for dist = 1..diameter — sampled-BFS neighborhood
    function (distance/NeighborhoodFunctionHeuristic.cpp:40-139, SPLIT
    strategy): nodes sorted by degree ascending (ties by id — the
    reference's parallel sort leaves equal-degree order unspecified; the
    id tie-break pins it, same policy as every other ordering in this
    engine), every (n // nSamples)-th node is a BFS source, per-distance
    pair counts scale by n/nSamples, and the two exact enhancements
    replace the estimated endpoints: N(1) = 2m, N(diameter) = n(n-1)
    (cpp:76-83). Interior values accumulate floor(count*n/s + 0.5)
    increments — floor(x+0.5) == std::round for these positive values,
    and the identical expression runs on the oracle side so both engines
    round the same doubles. Default nSamples = ceil(max(0.15 n, sqrt m))
    (cpp:22-25). Raises on directed or disconnected input like the
    reference (cpp:28-33).

    Distributed shape: one global_cumsum rank (range-partitioned, no
    single-task window) picks the sample set, multi_source_hops advances
    all samples per superstep, and the only driver-side state is the
    <= diameter-row per-distance histogram (bounded by the diameter, the
    same class as distance.py's radius grid)."""
    import math as _math

    from networkit_spark.functions.ordering import global_cumsum
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.distance import (
        diameter_exact,
        multi_source_hops,
    )

    if graph.directed:
        raise ValueError(
            "neighborhood_function_heuristic expects an undirected graph"
        )
    if connected_components(graph).select("label").distinct().count() > 1:
        raise ValueError(
            "neighborhood_function_heuristic expects a connected graph"
        )
    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    m = graph.num_edges()
    if n_samples <= 0:
        n_samples = int(_math.ceil(max(0.15 * n, _math.sqrt(m))))
    n_samples = min(n_samples, n)
    dia = diameter_exact(graph)
    if dia <= 1:
        return spark.createDataFrame([(1, n * (n - 1))], "dist long, nf long")

    ranked = global_cumsum(
        graph.degrees().select("id", "degree").withColumn("_one", F.lit(1)),
        ["degree", "id"],
        ["_one"],
    ).select("id", (F.col("cum__one") - 1).alias("rk"))
    stepw = n // n_samples
    samples = ranked.filter(
        (F.col("rk") % stepw == 0) & (F.col("rk") < n_samples * stepw)
    ).select("id")
    # The reference runs each sampled BFS to completion (cpp:40-139); only
    # distances 2..dia-1 feed the interior estimate, so dia-1 supersteps
    # suffice exactly.  max_depth is an optional explicit cap for callers
    # that want to bound supersteps on huge-diameter graphs (documented
    # truncation: interior counts past the cap come out zero).
    depth = dia - 1 if max_depth is None else min(dia - 1, max_depth)
    hops = multi_source_hops(graph, sources=samples, max_depth=depth)
    counts = {
        int(r["dist"]): int(r["c"])
        for r in hops.filter((F.col("dist") >= 2) & (F.col("dist") <= dia - 1))
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    norm = n / n_samples
    rows = [(1, 2 * m)]
    for d in range(2, dia):
        inc = int(_math.floor(counts.get(d, 0) * norm + 0.5))
        rows.append((d, rows[-1][1] + inc))
    rows.append((dia, n * (n - 1)))
    return spark.createDataFrame(rows, "dist long, nf long")
