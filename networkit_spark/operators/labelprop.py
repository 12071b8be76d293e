"""Synchronous label-propagation community detection (PLP semantics).

Reference: networkit/cpp/community/PLP.cpp (138 LoC) and the fork's MPLP
(networkit/cpp/community/MPLP.cpp). Semantics reproduced:

1. singleton init: label[v] = v; isolated nodes stay singletons
   (PLP.cpp:31-35, 50-56)
2. update-threshold heuristic theta = n/1e5 when unset; loop while
   nUpdated > theta and iter < maxIterations                (PLP.cpp:41-43, 69)
3. per node with degree>0: weight each neighboring label by incident edge
   weight, adopt the heaviest                               (PLP.cpp:80-92)
4. tie-break: on equal weight the SMALLEST label id wins — explicit in
   MPLP.cpp:122-128 ((w > best) || (w == best && heaviest > lw))

The reference sweep is asynchronous (benign races, nondeterministic across
runs); this engine pins the deterministic synchronous (Jacobi) variant — all
updates computed from iteration i-1's labels — with identical weighting and
tie-break, validated against a single-threaded numpy oracle (SURVEY.md §5).

Spark-first plan per superstep: edges x labels hash join on src, then ONE
partial+final aggregation — max_by(label, struct(weight, -label)) after a
groupBy(dst, label) weight-sum. Both aggs partial-aggregate map-side, so hub
vertices never concentrate raw edge rows on one reducer (the reference's
balancedParallelForNodes analogue); no window function in the hot path.
Like the reference, only labels that actually flipped count toward nUpdated,
and the active set shrinks to flipped nodes + their neighbors.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, require_fixture_scale
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState


def _heaviest_label(edge_labels: DataFrame) -> DataFrame:
    """(id, cand) — per dst, the label with max summed incident weight,
    smallest label on ties. max_by over struct orders lexicographically:
    (wsum asc, -label asc) -> max = heaviest weight, then smallest label."""
    return (
        edge_labels.groupBy("dst", "label")
        .agg(F.sum(F.col("weight").cast("double")).alias("wsum"))
        .groupBy("dst")
        .agg(
            F.max_by(
                "label", F.struct(F.col("wsum"), (-F.col("label")).alias("nl"))
            ).alias("cand")
        )
        .withColumnRenamed("dst", "id")
    )


def label_propagation(
    graph: Graph,
    theta: int | None = None,
    max_iterations: int | None = 100,
    checkpoint: CheckpointManager | None = None,
    impl: str = "expr",
    num_blocks: int | None = None,
) -> DataFrame:
    """labels(id: long, label: long) at the synchronous-PLP fixed point.

    Unlike the reference's async sweep, synchronous LP can 2-cycle on
    bipartite structures, so max_iterations defaults to a finite cap (the
    reference leaves it unbounded, PLP.hpp:31-53, relying on async updates
    to break oscillation).

    Self-loops are KEPT in the label weighting: PLP.cpp:83-86
    forNeighborsOf visits the loop, whose weight counts toward the node's
    own current label (pure label inertia) — the loop row is stored once
    in this engine's undirected layout, matching the reference's
    single-visit adjacency."""
    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession
    n = g.num_nodes()
    if theta is None:
        theta = max(0, int(n / 1e5))  # PLP.cpp:41-43

    from networkit_spark.plans.checkpoint import materialize

    edges = materialize(g.edges)

    csr = None
    if impl == "csr":
        from networkit_spark.blocks import CsrBlocks

        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions"))
        csr = CsrBlocks.build(edges, num_blocks, val_col="weight")

    labels = g.vertices.select("id", F.col("id").alias("label"))
    state = IterationState(checkpoint, "labelprop")
    labels = state.advance(0, labels)
    frontier = labels.select("id")

    iteration = 0
    while True:
        iteration += 1
        t0 = time.time()
        # only frontier nodes recompute their label; everyone else keeps it
        if csr is not None:
            # the weight-sum needs ALL neighbors' labels, so every label is
            # routed; the frontier restriction applies to which dsts adopt
            cand = csr.gather_heaviest_label(
                labels.select(F.col("id").alias("src"), "label")
            ).join(frontier, "id", "semi")
        else:
            active_edges = edges.join(
                frontier.withColumnRenamed("id", "dst"), "dst", "semi"
            )
            el = active_edges.join(labels.withColumnRenamed("id", "src"), "src").select(
                "dst", "label", "weight"
            )
            cand = _heaviest_label(el)
        step = state.advance(
            iteration,
            labels.join(cand, "id", "left").select(
                "id",
                F.coalesce(F.col("cand"), F.col("label")).alias("new_label"),
                F.col("label").alias("old_label"),
            ),
        )
        flipped = step.filter(F.col("new_label") != F.col("old_label")).select("id")
        n_updated = flipped.count()
        labels = step.select("id", F.col("new_label").alias("label"))

        if checkpoint is not None:
            checkpoint.record(
                "labelprop",
                iteration,
                n_updated=int(n_updated),
                wall_ms=(time.time() - t0) * 1000.0,
            )

        if n_updated <= theta or (
            max_iterations is not None and iteration >= max_iterations
        ):
            break

        # next frontier: flipped nodes + their neighbors (PLP.cpp:94-102)
        nbrs = edges.join(
            flipped.withColumnRenamed("id", "src"), "src", "semi"
        ).select(F.col("dst").alias("id"))
        frontier = flipped.unionByName(nbrs).distinct()

    result = labels.localCheckpoint(eager=True)
    state.close()
    if csr is not None:
        csr.unpersist()
    if checkpoint is not None:
        checkpoint.flush_metrics(spark)
    return result


def stable_partition_fraction(graph: Graph, labels: DataFrame) -> float:
    """Fraction of STABLE nodes under the reference's exact criterion
    (community/StablePartitionNodes.cpp:42-70): a node with neighbors is
    stable iff its own label's incident weight is positive AND STRICTLY
    greater than every other label's incident weight — any tie with a
    different label (lw.second >= ownWeight) marks it unstable, and a
    plurality-winner compare would miss that (a tie the smallest-label
    tie-break happens to hand to the own label would wrongly read
    stable). Self-loops count toward the own label (forNeighborsOf
    visits them); isolated nodes are stable (cpp:43)."""
    g = graph.to_undirected() if graph.directed else graph
    lw = (
        g.edges
        .join(
            labels.select(
                F.col("id").alias("src"), F.col("label").alias("nlabel")
            ),
            "src",
        )
        .groupBy(F.col("dst").alias("id"), "nlabel")
        .agg(F.sum(F.col("weight").cast("double")).alias("w"))
    )
    per = (
        labels.join(lw, "id", "left")
        .groupBy("id", "label")
        .agg(
            F.max(
                F.when(F.col("nlabel") == F.col("label"), F.col("w"))
            ).alias("own_w"),
            F.max(
                F.when(F.col("nlabel") != F.col("label"), F.col("w"))
            ).alias("other_max"),
            F.count("nlabel").alias("nn"),
        )
    )
    stable = per.filter(
        (F.col("nn") == 0)
        | (
            (F.coalesce("own_w", F.lit(0.0)) > 0)
            & (
                F.coalesce("own_w", F.lit(0.0))
                > F.coalesce("other_max", F.lit(0.0))
            )
        )
    ).count()
    total = labels.count()
    return stable / total if total else 1.0


def lp_degree_ordered(
    graph: Graph, theta: int | None = None, max_m: int = 200_000
) -> DataFrame:
    """(id, label) — LPDegreeOrdered (community/LPDegreeOrdered.cpp:26-87):
    ASYNCHRONOUS label propagation visiting nodes in degree-ASCENDING
    order, each node immediately adopting the dominant label among its
    neighbors' CURRENT labels; inactive nodes reactivate when a neighbor
    flips; sweeps repeat while more than theta = n // 1e5 nodes updated
    (zero at fixture sizes -> run to a stable labeling). Dominant-label
    ties break to the SMALLEST label — the reference takes the first
    maximum of an unordered_map iteration, which is unspecified; the pin
    makes the port deterministic. Equal degrees order by id ascending
    (the reference's parallel sort leaves them unspecified too).

    The async immediate-adoption visit order IS the algorithm (labels
    read mid-sweep), so this is fixture-tier driver-sequential; the
    synchronous PLP (`graph_labelprop`, oracle-checked) is the
    distributed path."""
    require_fixture_scale(graph, max_m, "lp_degree_ordered")
    spark = graph.vertices.sparkSession
    adj: dict[int, list[int]] = {}
    # self-loops stay in the neighbor list: forNeighborsOf visits them
    # (LPDegreeOrdered.cpp:40-42), adding one count of inertia for the
    # node's own current label — same loop contract as label_propagation
    for r in graph.edges.select("src", "dst").distinct().collect():
        u, v = int(r["src"]), int(r["dst"])
        adj.setdefault(u, []).append(v)
    ids = sorted(int(r["id"]) for r in graph.vertices.collect())
    for u in adj:
        adj[u] = sorted(set(adj[u]))
    n = len(ids)
    if theta is None:
        theta = n // 100000
    labels = {u: u for u in ids}
    active = {u: True for u in ids}
    order = sorted(ids, key=lambda u: (len(adj.get(u, [])), u))
    n_updated = n
    while n_updated > theta:
        n_updated = 0
        for v in order:
            if not active.get(v) or not adj.get(v):
                continue
            counts: dict[int, int] = {}
            for w in adj[v]:
                counts[labels[w]] = counts.get(labels[w], 0) + 1
            dominant = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if labels[v] != dominant:
                labels[v] = dominant
                n_updated += 1
                for w in adj[v]:
                    active[w] = True
            else:
                active[v] = False
    return spark.createDataFrame(
        sorted(labels.items()), "id long, label long"
    )
