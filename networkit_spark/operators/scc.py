"""Strongly connected components of a DIRECTED graph.

Reference: networkit/cpp/components/StronglyConnectedComponents.cpp (Tarjan,
inherently sequential DFS — does not distribute). The distributed-standard
replacement is the coloring algorithm (Orzan 2004; FW-BW family): repeat on
the live subgraph
  1. color(v) <- min id that reaches v: propagate min along edge direction
     to fixpoint (hash-min supersteps, same shape as connected components);
  2. roots r: color(r) == r — each root's SCC is exactly the vertices of
     its color that can reach it BACKWARD through same-colored vertices;
  3. mark those by backward supersteps, assign them label = color, remove
     them from the live set.
Every round settles at least one SCC per color class; labels come out as
the MIN MEMBER id of each SCC (Tarjan's arbitrary component numbering
canonicalized — the same canonical form the oracle computes from mutual
reachability).

Scale shape: each superstep is a join + min-agg (map-side combined); round
count is bounded by the longest root-chain in the SCC condensation —
power-law web/transcript graphs settle the giant SCC in round 1 and the
tail in a few more (the published behavior of FW-BW/coloring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def strongly_connected_components(
    graph: Graph, max_rounds: int | None = None
) -> DataFrame:
    """labels(id: long, label: long), label = min member id of the SCC.
    Requires a directed graph (undirected input would just be CC —
    mirroring the reference's warning, StronglyConnectedComponents.cpp:22-24)."""
    spark = graph.vertices.sparkSession
    all_edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    live = materialize(graph.vertices.select("id"))
    assigned: DataFrame | None = None

    rounds = 0
    while True:
        rounds += 1
        if live.limit(1).count() == 0:
            break
        edges = materialize(
            all_edges.join(live.withColumnRenamed("id", "src"), "src", "semi")
            .join(live.withColumnRenamed("id", "dst"), "dst", "semi")
            .select("src", "dst")
        )

        # 1. forward hash-min coloring to fixpoint
        state = IterationState(None, f"scc-color-{rounds}")
        color = state.advance(0, live.select("id", F.col("id").alias("color")))
        while True:
            cand = (
                edges.join(
                    color.select(F.col("id").alias("src"), "color"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("cand"))
            )
            step = state.advance(
                1,
                color.join(cand, "id", "left").select(
                    "id",
                    F.least(F.col("color"), F.coalesce("cand", F.col("color"))).alias(
                        "new_color"
                    ),
                    F.col("color").alias("old_color"),
                ),
            )
            changed = step.filter(F.col("new_color") < F.col("old_color")).count()
            color = step.select("id", F.col("new_color").alias("color"))
            if changed == 0:
                break
        state.close()

        # 2+3. backward marking from roots within color classes
        marked = materialize(
            color.filter(F.col("id") == F.col("color")).select("id", "color")
        )
        bstate = IterationState(None, f"scc-mark-{rounds}")
        frontier = marked
        while True:
            # v (unmarked) with edge v -> w, w marked, same color
            nxt = (
                edges.join(
                    frontier.select(F.col("id").alias("dst"), "color"), "dst"
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(
                    color.withColumnRenamed("color", "vcolor"), "id"
                )
                .filter(F.col("color") == F.col("vcolor"))
                .select("id", "color")
                .join(marked.select("id"), "id", "anti")
            )
            nxt = bstate.advance(1, nxt)
            if nxt.limit(1).count() == 0:
                break
            marked = materialize(marked.unionByName(nxt))
            frontier = nxt
        bstate.close()

        found = marked.select("id", F.col("color").alias("label"))
        assigned = (
            found if assigned is None else assigned.unionByName(found)
        )
        assigned = materialize(assigned)
        live = materialize(live.join(marked.select("id"), "id", "anti"))
        if max_rounds is not None and rounds >= max_rounds:
            break

    if assigned is None:
        return spark.createDataFrame([], "id long, label long")
    return assigned
