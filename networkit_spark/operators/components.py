"""Hash-min connected components with active-set (frontier) iteration.

Reference: networkit/cpp/components/ParallelConnectedComponents.cpp (198 LoC):
init each node's label to its own id (allToSingletons, lines 30-31); loop:
each active node takes min(own, neighbors' labels) (lines 56-63), reactivating
only neighbors lacking the smaller label (lines 65-76); stop when nothing
changes (line 50). The fixed point — min reachable id per component — is
schedule-independent, so this synchronous Spark version converges to labels
identical to both the reference's parallel and sequential variants
(asserted equal in components/test/ConnectedComponentsGTest.cpp:76-91).

Spark-first plan per superstep: candidates = edges semi-filtered to the
frontier, joined with labels on src, min-aggregated on dst (partial+final
hash agg = map-side combine); new label = least(old, candidate); frontier =
changed rows only. Directed graphs are symmetrized first (weakly connected
components, the reference's WeaklyCC route, ConnectedComponentsImpl:13-20).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState


def connected_components(
    graph: Graph,
    max_iterations: int | None = None,
    checkpoint: CheckpointManager | None = None,
    impl: str = "expr",
    num_blocks: int | None = None,
) -> DataFrame:
    """labels(id: long, label: long) — label == min member id of component.

    ``impl="csr"`` runs the candidate step as the CSR-block min-gather
    kernel (networkit_spark.blocks.gather_min_label); frontier semantics
    are preserved by routing only the frontier vertices' labels.
    """
    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession

    from networkit_spark.plans.checkpoint import materialize

    edges = materialize(
        g.edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    )

    csr = None
    if impl == "csr":
        from networkit_spark.blocks import CsrBlocks

        if num_blocks is None:
            num_blocks = int(spark.conf.get("spark.sql.shuffle.partitions"))
        csr = CsrBlocks.build(edges.withColumn("val", F.lit(1.0)), num_blocks, "val")

    labels = g.vertices.select("id", F.col("id").alias("label"))
    state = IterationState(checkpoint, "components")
    labels = state.advance(0, labels)
    frontier = labels.select("id")  # every node active initially

    iteration = 0
    while True:
        iteration += 1
        t0 = time.time()
        # propagate candidates only FROM the frontier (the activeNodes
        # optimization, ParallelConnectedComponents.cpp:56-76)
        if csr is not None:
            cand = csr.gather_min_label(
                labels.join(frontier, "id", "semi").select(
                    F.col("id").alias("src"), "label"
                )
            )
        else:
            active_edges = edges.join(
                frontier.withColumnRenamed("id", "src"), "src", "semi"
            )
            cand = (
                active_edges.join(labels.withColumnRenamed("id", "src"), "src")
                .groupBy("dst")
                .agg(F.min("label").alias("cand"))
                .withColumnRenamed("dst", "id")
            )
        # one checkpointed step DF per iteration; labels/frontier are cheap
        # projections over the materialized blocks
        step = state.advance(
            iteration,
            labels.join(cand, "id", "left").select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("cand"), F.col("label"))
                ).alias("new_label"),
                F.col("label").alias("old_label"),
            ),
        )
        changed = step.filter(F.col("new_label") < F.col("old_label")).count()
        labels = step.select("id", F.col("new_label").alias("label"))
        frontier = step.filter(F.col("new_label") < F.col("old_label")).select("id")

        if checkpoint is not None:
            checkpoint.record(
                "components",
                iteration,
                frontier=int(changed),
                wall_ms=(time.time() - t0) * 1000.0,
            )
        if changed == 0 or (max_iterations is not None and iteration >= max_iterations):
            break

    result = labels.localCheckpoint(eager=True)
    state.close()
    if csr is not None:
        csr.unpersist()
    if checkpoint is not None:
        checkpoint.flush_metrics(spark)
    return result


def num_components(labels: DataFrame) -> int:
    return labels.select("label").distinct().count()


def component_sizes(labels: DataFrame) -> DataFrame:
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("size"))


def extract_largest_component(graph: Graph, labels: DataFrame | None = None) -> Graph:
    """Induced subgraph of the largest component
    (ref: ConnectedComponentsImpl.cpp:71-96)."""
    if labels is None:
        labels = connected_components(graph)
    top = (
        component_sizes(labels)
        .orderBy(F.desc("size"), F.asc("label"))
        .limit(1)
        .select("label")
    )
    members = labels.join(F.broadcast(top), "label", "semi").select("id")
    return graph.subgraph_from_nodes(members)


def canonicalize_labels(labels: DataFrame) -> DataFrame:
    """Relabel each group to its min member id — the comparison
    canonicalization used by the pytest oracles (FIXTURES.md §3)."""
    m = labels.groupBy("label").agg(F.min("id").alias("canon"))
    # m is label-count-sized (vertex-sized for a singleton partition):
    # let AQE pick broadcast when it fits
    return labels.join(m, "label").select(
        "id", F.col("canon").alias("label")
    )
