"""PLM (parallel Louvain method) — synchronous distributed variant.

Reference: networkit/cpp/community/PLM.cpp:29-140 (326 LoC) and the fork's
MPLM/ONPL/OVPL perf variants (community/MPLM.cpp:64, ONPL.cpp:74,
OVPL.cpp:106 — identical semantics, SIMD-only changes, SURVEY.md §2.7).
Phases reproduced:

1. singleton init zeta[v] = v (PLM.cpp move-phase entry)
2. move phase: for each node u, affinity[C] = Σ weight(u, v in C, v != u);
   modularity gain of moving u from D to C (PLM.cpp:129-135):
       Δmod = (aff_C - aff_D\\u)/ω + γ·vol(u)·(vol(D\\u) - vol(C))/(2ω²)
   move to argmax-gain community when gain > 0; repeat up to maxIter sweeps
3. coarsen by the resulting partition (ParallelPartitionCoarsening), recurse
   on the coarse graph, project labels back (ClusteringProjector)

The reference's sweep is racy/async (vectgraph.tex:333-335); this engine
pins the deterministic synchronous variant: every sweep computes all gains
from the previous sweep's partition and applies all positive moves at once,
ties broken by the smallest candidate community label. vol(v) counts
self-loops twice (Modularity.cpp:46-53 volume accumulation); ω is the
undirected total edge weight (PLM.cpp:42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import coarsen, project_back
from networkit_spark.plans.checkpoint import IterationState, materialize


def _move_phase(
    g: Graph, gamma: float, max_sweeps: int, min_moves: int,
    exact_sweeps: bool = False,
) -> DataFrame:
    """One level's local-move loop; returns labels(id, label).

    ``exact_sweeps=True`` runs exactly ``max_sweeps`` sweeps with no early
    stop and no oscillation guard — the pinned variant the driver's
    unrolled SQL oracle mirrors sweep-for-sweep (a converged sweep applies
    no moves, so extra pinned sweeps are deterministic no-ops on both
    engines)."""
    omega = g.total_edge_weight()
    if omega <= 0:
        return g.vertices.select("id", F.col("id").alias("label"))

    vol = materialize(g.degrees().select("id", F.col("wdeg").alias("vol")))
    nonloop = materialize(
        g.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )

    labels = g.vertices.select("id", F.col("id").alias("label"))
    state = IterationState(None, "plm-move")
    labels = state.advance(0, labels)

    sweep = 0
    seen_sigs: set[int] = set()
    while sweep < max_sweeps:
        sweep += 1
        comm_vol = (
            labels.join(vol, "id").groupBy("label").agg(F.sum("vol").alias("cvol"))
        )
        # affinity of u to each neighboring community
        aff = (
            nonloop.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("dlabel")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("dlabel").alias("cand"))
            .agg(F.sum("w").alias("aff"))
        )
        base = (
            labels.join(vol, "id")
            .join(
                comm_vol.withColumnRenamed("label", "label").withColumnRenamed(
                    "cvol", "dvol"
                ),
                "label",
            )
            .select("id", "label", "vol", "dvol")
        )
        own_aff = (
            aff.join(
                labels.withColumnRenamed("label", "own"), "id"
            )
            .filter(F.col("cand") == F.col("own"))
            .select("id", F.col("aff").alias("own_aff"))
        )
        cand = (
            aff.join(base, "id")
            .join(own_aff, "id", "left")
            .join(
                comm_vol.select(
                    F.col("label").alias("cand"), F.col("cvol").alias("cand_vol")
                ),
                "cand",
            )
            .filter(F.col("cand") != F.col("label"))
            .select(
                "id",
                "cand",
                (
                    (F.col("aff") - F.coalesce("own_aff", F.lit(0.0))) / omega
                    + F.lit(gamma)
                    * F.col("vol")
                    * ((F.col("dvol") - F.col("vol")) - F.col("cand_vol"))
                    / (2.0 * omega * omega)
                ).alias("gain"),
            )
        )
        best = (
            cand.filter(F.col("gain") > 1e-15)
            .groupBy("id")
            .agg(
                F.max_by(
                    "cand", F.struct(F.col("gain"), (-F.col("cand")).alias("nc"))
                ).alias("new_label")
            )
        )
        new = state.advance(
            sweep,
            labels.join(best, "id", "left").select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                (F.col("new_label").isNotNull() & (F.col("new_label") != F.col("label"))).alias(
                    "moved"
                ),
            ),
        )
        labels = new.select("id", "label")
        if exact_sweeps:
            continue
        # one scan of the materialized sweep: move count + an exact state
        # signature (order-insensitive hash of the (id, label) multiset)
        row = new.agg(
            F.sum(F.col("moved").cast("long")).alias("m"),
            # xor-fold: order-insensitive, overflow-free under ANSI mode
            F.expr("bit_xor(xxhash64(id, label))").alias("sig"),
        ).first()
        n_moved = row["m"] or 0
        if n_moved <= min_moves:
            break
        # synchronous sweeps can 2-cycle (a pair of nodes swapping
        # communities forever — the async reference never faces this); a
        # REVISITED partition state is a deterministic cycle, so stop.
        # (The round-1 guard keyed on a plateaued move COUNT, which can
        # also fire on legitimate constant-rate progress.)
        if row["sig"] in seen_sigs:
            break
        seen_sigs.add(row["sig"])

    result = labels.localCheckpoint(eager=True)
    state.close()
    return result


def plm(
    graph: Graph,
    gamma: float = 1.0,
    max_sweeps: int = 25,
    max_levels: int = 5,
    min_moves: int = 0,
    level_modularities: list | None = None,
) -> DataFrame:
    """labels(id, label) in the ORIGINAL id space — multilevel Louvain.
    max_sweeps mirrors the reference's <=25 move passes per level
    (SURVEY.md §2.7); levels recurse while the partition keeps contracting
    meaningfully (PLM.cpp coarsen+recurse), composing fine->coarse maps.

    Levels are accepted MONOTONICALLY in modularity (projected to the
    original graph): a level whose partition scores below the best seen so
    far — possible because the synchronous move phase breaks on a revisited
    state signature, unlike the reference's per-move-improving async sweeps
    (PLM.cpp:129-135 only applies positive-gain moves) — is rejected and
    the best partition returned, with the all-singletons start as the
    baseline. This restores the reference's guarantee that PLM never
    returns a partition worse than its starting point. When
    ``level_modularities`` is a list, the modularity of the baseline and of
    every ACCEPTED level is appended (a non-decreasing sequence by
    construction; the gate row asserts the computed values confirm it)."""
    from networkit_spark.operators.coarsening import modularity

    g0 = graph.to_undirected() if graph.directed else graph
    g = g0
    # fine-id -> current-level-id composition (identity at level 0)
    fine_map = g.vertices.select("id", F.col("id").alias("cur"))

    best = g0.vertices.select("id", F.col("id").alias("label"))
    best_q = modularity(g0, best)
    if level_modularities is not None:
        level_modularities.append(best_q)

    level = 0
    while True:
        level += 1
        labels_g = _move_phase(g, gamma, max_sweeps, min_moves)
        proj = project_back(
            fine_map.withColumnRenamed("cur", "coarse_id"), labels_g
        ).localCheckpoint(eager=True)
        q = modularity(g0, proj)
        if q < best_q - 1e-12:
            break  # reject the level, keep the best partition so far
        best, best_q = proj, q
        if level_modularities is not None:
            level_modularities.append(q)
        n_g = g.num_nodes()
        n_comms = labels_g.select("label").distinct().count()
        # stop when done, or when contraction stalls (<10% shrink buys
        # nothing and each level costs a full move-phase loop)
        if level >= max_levels or n_comms <= 1 or n_comms >= 0.9 * n_g:
            break
        coarse_g, f2c = coarsen(g, labels_g)  # f2c: (id in g, coarse_id)
        fine_map = (
            fine_map.join(f2c.withColumnRenamed("id", "cur"), "cur")
            .select("id", F.col("coarse_id").alias("cur"))
            .localCheckpoint(eager=True)
        )
        g = coarse_g

    return best


def plm_pinned(graph: Graph, gamma: float = 1.0, sweeps: int = 3) -> DataFrame:
    """Single-level synchronous move phase with a PINNED sweep count — the
    oracle-checkable PLM variant (entrylib.sql_plm_pinned unrolls the same
    ``sweeps`` gain computations in SQL). Gains are ratios of exactly-
    representable integer sums (weights are occurrence counts), so the
    argmax/tie-break ordering is engine-portable bit-for-bit."""
    g = graph.to_undirected() if graph.directed else graph
    return _move_phase(g, gamma, sweeps, 0, exact_sweeps=True)


def detect_communities(graph: Graph, algo: str = "plm", **kw) -> DataFrame:
    """Convenience driver (ref: networkit/community.pyx:1159-1177
    detectCommunities defaulting to PLM)."""
    if algo == "plm":
        return plm(graph, **kw)
    if algo == "plp":
        from networkit_spark.operators.labelprop import label_propagation

        return label_propagation(graph, **kw)
    raise ValueError(f"unknown algo {algo!r}")
