"""GraphEvent batch-incremental updates (ref: networkit/cpp/dynamics/
GraphEvent.hpp + the Dyn* algorithm family, networkit/components.pyx:411-570).

Events are rows (etype, u, v, w):

    NODE_ADD, NODE_REMOVE, EDGE_ADD, EDGE_REMOVE, EDGE_WEIGHT_UPDATE

``apply_events`` folds a batch of events into a Graph (the DGSReader /
GraphUpdater path); ``update_components_incremental`` reproduces
DynConnectedComponents' cheap path — on edge ADDITIONS, components can only
merge, so the existing labels seed a hash-min loop whose frontier is just
the touched endpoints (O(diameter-of-change) supersteps instead of a full
recompute). Removals may split components; like the reference's DynCC
backbone-invalidation fallback, that case recomputes from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from networkit_spark.graph import Graph

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("etype", T.StringType(), False),
        T.StructField("u", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("w", T.FloatType(), True),
    ]
)


def apply_events(graph: Graph, events: DataFrame) -> Graph:
    """Fold one event batch into the graph (bulk, set-oriented: each event
    class is one union/anti-join — never row-at-a-time).

    No persist on the batch: event batches are small relative to the
    graph, re-scanning the source five times (one filter per event class)
    is cheaper than pinning one cached RDD per fold — a long stream of
    batches would otherwise leak block-manager storage until driver GC
    (stepwise fold_events already localCheckpoints the stream once)."""
    ev = events

    # NODE_RESTORE (dynamic-GEXF restoration, GraphEvent.hpp NODE_RESTORATION)
    # re-registers the id — identical to addition in this set-oriented fold
    node_add = ev.filter("etype IN ('NODE_ADD', 'NODE_RESTORE')").select(
        F.col("u").alias("id")
    )
    node_rm = ev.filter("etype = 'NODE_REMOVE'").select(F.col("u").alias("id"))
    edge_add = ev.filter("etype = 'EDGE_ADD'").select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.coalesce("w", F.lit(1.0)).cast("float").alias("weight"),
    )
    edge_rm = ev.filter("etype = 'EDGE_REMOVE'").select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    w_upd = ev.filter("etype = 'EDGE_WEIGHT_UPDATE'").select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("w").cast("float").alias("weight"),
    )

    vertices = graph.vertices.select("id").unionByName(node_add).distinct()
    vertices = vertices.join(node_rm, "id", "anti")

    if not graph.directed:
        edge_add = edge_add.unionByName(
            edge_add.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        edge_rm = edge_rm.unionByName(
            edge_rm.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        w_upd = w_upd.unionByName(
            w_upd.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )

    edges = graph.edges.unionByName(edge_add)
    edges = edges.join(edge_rm.distinct(), ["src", "dst"], "anti")
    # removing a node removes its incident edges (Graph.cpp removeNode)
    edges = edges.join(node_rm.withColumnRenamed("id", "src"), "src", "anti")
    edges = edges.join(node_rm.withColumnRenamed("id", "dst"), "dst", "anti")
    # weight updates replace the existing weight.  A batch is a SET of
    # simultaneous events, so two updates to the same edge in one batch have
    # no defined order — dedup to one row per edge (max is the pinned
    # tie-break) or the left join would duplicate the edge row into a
    # multigraph.  Callers with an ordered stream pre-reduce last-wins by
    # time before batching (fold_events does).
    upd = (
        w_upd.groupBy("src", "dst")
        .agg(F.max("weight").cast("float").alias("new_w"))
    )
    edges = (
        edges.join(upd, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("new_w", "weight").alias("weight"))
    )
    return Graph(vertices, edges, graph.directed, graph.weighted)


def update_components_incremental(
    graph_after: Graph, old_labels: DataFrame, added_edges: DataFrame
) -> DataFrame:
    """New component labels after EDGE_ADD events. Seeds hash-min with the
    previous labels; only the added edges' endpoints start active, so a
    batch that merges two components costs supersteps proportional to the
    merge's reach, not the graph's diameter from scratch."""
    g = graph_after.to_undirected() if graph_after.directed else graph_after
    edges = g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).persist()
    edges.count()

    labels = (
        g.vertices.select("id")
        .join(old_labels, "id", "left")
        .select("id", F.coalesce("label", "id").alias("label"))
        .localCheckpoint(eager=True)
    )
    frontier = (
        added_edges.select(F.col("src").alias("id"))
        .unionByName(added_edges.select(F.col("dst").alias("id")))
        .distinct()
    )

    while True:
        cand = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src", "semi")
            .join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        step = (
            labels.join(cand, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("cand", F.col("label"))).alias(
                    "new_label"
                ),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = step.filter(F.col("new_label") < F.col("old_label"))
        n_changed = changed.count()
        labels = step.select("id", F.col("new_label").alias("label"))
        if n_changed == 0:
            break
        frontier = changed.select("id")

    edges.unpersist()
    return labels


def update_bfs_incremental(
    graph_after: Graph, old_dist: DataFrame, added_edges: DataFrame
) -> DataFrame:
    """New hop-distance table after EDGE_ADD events (DynBFS, ref:
    networkit/cpp/distance/DynBFS.cpp:45-103).

    Unweighted edge additions can only SHORTEN distances, so the previous
    ``dist(id, dist)`` table (unreachable vertices absent, per bfs_hops)
    seeds a monotone relaxation whose initial frontier is just the added
    arcs' improved heads. The reference drains per-level queues seeded the
    same way (DynBFS.cpp:49-57); a synchronous frontier relaxation reaches
    the identical fixed point — min over in-neighbors of dist+1 — without
    the sequential level scan, in supersteps proportional to the reach of
    the change, not a from-scratch BFS. Vertices that *become* reachable
    through an added edge are discovered too (the reference caps its queue
    array at the old maxDistance and documents the same additions-only
    contract we require here).
    """
    edges = (
        graph_after.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    edges.count()

    add = added_edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if not graph_after.directed:
        add = add.unionByName(
            add.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    dist = old_dist.select("id", F.col("dist").cast("long").alias("dist"))
    dist = dist.localCheckpoint(eager=True)

    # seed: heads of added arcs whose tail is reachable
    cand = (
        add.join(
            dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")), "src"
        )
        .groupBy("dst")
        .agg(F.min(F.col("ds") + F.lit(1)).alias("cand"))
        .withColumnRenamed("dst", "id")
    )
    while True:
        merged = (
            dist.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(2**62)),
                    F.coalesce(F.col("cand"), F.lit(2**62)),
                ).alias("new_dist"),
                F.col("dist").alias("old_dist"),
            )
            .localCheckpoint(eager=True)
        )
        improved = merged.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        )
        n_improved = improved.count()
        dist = merged.select("id", F.col("new_dist").alias("dist"))
        if n_improved == 0:
            break
        frontier = improved.select("id", F.col("new_dist").alias("dist"))
        cand = (
            edges.join(
                frontier.select(F.col("id").alias("src"), F.col("dist").alias("ds")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min(F.col("ds") + F.lit(1)).alias("cand"))
            .withColumnRenamed("dst", "id")
        )

    edges.unpersist()
    return dist


def graph_difference(g1: Graph, g2: Graph) -> DataFrame:
    """Edit script turning ``g1`` into ``g2`` (ref: networkit/cpp/dynamics/
    GraphDifference.cpp:19-140). Set-oriented re-expression: each edit
    class is one anti- or full-outer join — node removals = V1 \\ V2,
    additions = V2 \\ V1, edge edits from a full join of the canonical
    (src <= dst for undirected) weighted edge sets. Events come back
    unordered; ``apply_events`` already applies classes in the reference's
    remove-edges / fix-nodes / add-edges order, and
    ``apply_events(g1, graph_difference(g1, g2)) == g2`` is the pytest
    contract. The reference's NODE_RESTORATION / id-bound padding
    (GraphDifference.cpp:44-60) is an artifact of its compact id arrays;
    explicit vertex DataFrames need only additions and removals."""
    if g1.directed != g2.directed:
        raise ValueError("both or neither graph must be directed")

    def canon(g: Graph) -> DataFrame:
        e = g.edges.select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
        if not g.directed:
            e = e.filter(F.col("src") <= F.col("dst"))
        return e.groupBy("src", "dst").agg(F.sum("w").alias("w"))

    def ev(etype, u, v, w):
        return F.struct(
            F.lit(etype).alias("etype"),
            u.cast("long").alias("u"),
            v.cast("long").alias("v"),
            w.cast("float").alias("w"),
        )

    null_l = F.lit(None).cast("long")
    null_f = F.lit(None).cast("float")

    nrm = g1.vertices.join(g2.vertices, "id", "anti").select(
        ev("NODE_REMOVE", F.col("id"), null_l, null_f).alias("e")
    )
    nadd = g2.vertices.join(g1.vertices, "id", "anti").select(
        ev("NODE_ADD", F.col("id"), null_l, null_f).alias("e")
    )
    j = (
        canon(g1).withColumnRenamed("w", "w1")
        .join(canon(g2).withColumnRenamed("w", "w2"), ["src", "dst"], "full")
    )
    erm = j.filter(F.col("w2").isNull()).select(
        ev("EDGE_REMOVE", F.col("src"), F.col("dst"), null_f).alias("e")
    )
    eadd = j.filter(F.col("w1").isNull()).select(
        ev("EDGE_ADD", F.col("src"), F.col("dst"), F.col("w2")).alias("e")
    )
    wupd = j.filter(
        F.col("w1").isNotNull()
        & F.col("w2").isNotNull()
        & (F.col("w1") != F.col("w2"))
    ).select(
        ev("EDGE_WEIGHT_UPDATE", F.col("src"), F.col("dst"), F.col("w2")).alias("e")
    )
    out = nrm
    for part in (nadd, erm, eadd, wupd):
        out = out.unionByName(part)
    return out.select("e.etype", "e.u", "e.v", "e.w")


def update_sssp_incremental(
    graph_after: Graph, old_dist: DataFrame, added_edges: DataFrame
) -> DataFrame:
    """New weighted-distance table after EDGE_ADD / weight-DECREASE events
    (DynDijkstra, ref: networkit/cpp/distance/DynDijkstra.cpp:41-90).
    Distance-improving relaxations seeded from the touched arcs — the
    reference drains a priority queue seeded by updateQueue(u,v,w) on both
    endpoints; the synchronous frontier relaxation (same loop shape as
    sssp_weighted) reaches the identical fixed point. ``added_edges`` rows
    are (src, dst, weight); pass both a new edge and a decreased weight the
    same way. old_dist is (id, dist: double) with unreachable absent."""
    edges = (
        graph_after.edges.select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    edges.count()

    add = added_edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    ).filter(F.col("src") != F.col("dst"))
    if not graph_after.directed:
        add = add.unionByName(
            add.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )

    dist = old_dist.select("id", F.col("dist").cast("double").alias("dist"))
    dist = dist.localCheckpoint(eager=True)

    cand = (
        add.join(
            dist.select(F.col("id").alias("src"), F.col("dist").alias("ds")), "src"
        )
        .groupBy("dst")
        .agg(F.min(F.col("ds") + F.col("w")).alias("cand"))
        .withColumnRenamed("dst", "id")
    )
    while True:
        merged = (
            dist.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("cand"), F.lit(float("inf"))),
                ).alias("new_dist"),
                F.col("dist").alias("old_dist"),
            )
            .localCheckpoint(eager=True)
        )
        improved = merged.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        )
        n_improved = improved.count()
        dist = merged.select("id", F.col("new_dist").alias("dist"))
        if n_improved == 0:
            break
        frontier = improved.select("id", F.col("new_dist").alias("dist"))
        cand = (
            edges.join(
                frontier.select(F.col("id").alias("src"), F.col("dist").alias("ds")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min(F.col("ds") + F.col("w")).alias("cand"))
            .withColumnRenamed("dst", "id")
        )

    edges.unpersist()
    return dist


def update_apsp_incremental(
    graph_after: Graph, old_apsp: DataFrame, added_edges: DataFrame,
    max_rounds: int = 16,
) -> DataFrame:
    """New all-pairs hop-distance table (s, t, dist) after EDGE_ADD events
    (DynAPSP, ref: networkit/cpp/distance/DynAPSP.cpp:92-180). An added
    arc (u, v) can only create shortcuts through itself:
    d'(s, t) = min(d(s, t), d'(s, u) + 1 + d'(v, t)), so each round joins
    the current table onto both sides of every added arc and keeps the
    min — repeated to a fixed point because shortcuts can chain through
    several added arcs (the reference propagates the same relaxation from
    the affected-source/target sets). Unreachable pairs are absent; newly
    connected pairs appear through the joins. ``old_apsp`` is
    multi_source_hops output (s, id, dist) or (s, t, dist)."""
    cols = old_apsp.columns
    apsp = old_apsp.withColumnRenamed("id", "t") if "id" in cols else old_apsp
    apsp = apsp.select("s", "t", F.col("dist").cast("long").alias("dist"))
    apsp = apsp.localCheckpoint(eager=True)

    add = added_edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if not graph_after.directed:
        add = add.unionByName(
            add.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    add = add.localCheckpoint(eager=True)

    for _ in range(max_rounds):
        left = apsp.select("s", F.col("t").alias("src"), F.col("dist").alias("dsu"))
        right = apsp.select(
            F.col("s").alias("dst"), F.col("t").alias("t2"), F.col("dist").alias("dvt")
        )
        cand = (
            add.join(left, "src")
            .join(right, "dst")
            .groupBy("s", F.col("t2").alias("t"))
            .agg(F.min(F.col("dsu") + 1 + F.col("dvt")).alias("cand"))
        )
        merged = (
            apsp.join(cand, ["s", "t"], "full")
            .select(
                "s", "t",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(2**62)),
                    F.coalesce(F.col("cand"), F.lit(2**62)),
                ).alias("new_dist"),
                F.col("dist").alias("old_dist"),
            )
            .localCheckpoint(eager=True)
        )
        improved = merged.filter(
            F.col("old_dist").isNull() | (F.col("new_dist") < F.col("old_dist"))
        ).count()
        apsp = merged.select("s", "t", F.col("new_dist").alias("dist"))
        if improved == 0:
            break
    return apsp


def katz_levels(
    graph: Graph, alpha: float, beta: float, iters: int
) -> DataFrame:
    """(k, id, x) — the pre-normalization Katz iterate x_k for k = 0..iters
    under x_{k+1}[u] = beta + alpha*sum_{v->u} w*x_k[v], x_0 = 0 (the
    centrality.katz_centrality recurrence with a pinned iteration count).
    This is the state DynKatzCentrality maintains per level
    (centrality/DynKatzCentrality.cpp keeps bounded per-level walk counts)."""
    from networkit_spark.plans.checkpoint import materialize

    edges = materialize(
        graph.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )
    x = graph.vertices.select("id", F.lit(0.0).alias("x"))
    levels = x.withColumn("k", F.lit(0)).localCheckpoint(eager=True)
    for k in range(1, iters + 1):
        msgs = (
            edges.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("x") * F.col("w")).alias("mass"))
        )
        x = (
            graph.vertices.select("id")
            .join(msgs, "id", "left")
            .select(
                "id",
                (F.lit(beta) + F.lit(alpha) * F.coalesce("mass", F.lit(0.0))).alias(
                    "x"
                ),
            )
            .localCheckpoint(eager=True)
        )
        levels = levels.unionByName(x.withColumn("k", F.lit(k))).localCheckpoint(
            eager=True
        )
    return levels


def update_katz_incremental(
    graph_after: Graph,
    old_levels: DataFrame,
    added_edges: DataFrame,
    alpha: float,
    beta: float,
    iters: int,
) -> tuple[DataFrame, DataFrame]:
    """(new_levels, scores) after EDGE_ADD events — DynKatzCentrality
    semantics (centrality/DynKatzCentrality.cpp: update bounded per-level
    walk state instead of recomputing): with E+ the added arcs,
        delta_k(u) = alpha * ( sum_{(v,u) in E+} w * x'_{k-1}(v)
                             + sum_{(v,u) old}   w * delta_{k-1}(v) ),
    so deltas spread one hop per level from the added arcs' heads — a
    frontier superstep over the delta table, never a full recompute. The
    returned scores are L2-normalized like katz_centrality."""
    from networkit_spark.plans.checkpoint import materialize

    add = added_edges.select(
        "src", "dst", F.col("weight").cast("double").alias("w")
    )
    if not graph_after.directed:
        add = add.unionByName(
            add.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    add = materialize(add)
    old_edges = materialize(
        graph_after.edges.select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        ).subtract(
            graph_after.edges.select(
                "src", "dst", F.col("weight").cast("double").alias("w")
            ).join(add.select("src", "dst"), ["src", "dst"], "semi")
        )
    )

    delta = None  # delta_0 = 0 (x_0 = 0 regardless of edges)
    new_levels = old_levels.filter(F.col("k") == 0).localCheckpoint(eager=True)
    for k in range(1, iters + 1):
        prev_new = new_levels.filter(F.col("k") == k - 1).select("id", "x")
        from_new_edges = (
            add.join(prev_new.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("x") * F.col("w")).alias("m1"))
        )
        if delta is not None:
            from_deltas = (
                old_edges.join(delta.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("d") * F.col("w")).alias("m2"))
            )
            dk = (
                from_new_edges.join(from_deltas, "id", "full")
                .select(
                    "id",
                    (
                        F.lit(alpha)
                        * (
                            F.coalesce("m1", F.lit(0.0))
                            + F.coalesce("m2", F.lit(0.0))
                        )
                    ).alias("d"),
                )
            )
        else:
            dk = from_new_edges.select(
                "id", (F.lit(alpha) * F.col("m1")).alias("d")
            )
        delta = materialize(dk.filter(F.col("d") != 0.0))
        xk = (
            old_levels.filter(F.col("k") == k)
            .select("id", "x")
            .join(delta, "id", "left")
            .select("id", (F.col("x") + F.coalesce("d", F.lit(0.0))).alias("x"))
        )
        new_levels = new_levels.unionByName(
            xk.withColumn("k", F.lit(k))
        ).localCheckpoint(eager=True)

    final = new_levels.filter(F.col("k") == iters).select("id", "x")
    norm = final.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).first()[0] or 1.0
    scores = final.select("id", (F.col("x") / norm).alias("score"))
    return new_levels, scores


def update_betweenness_incremental(
    graph_before: Graph,
    graph_after: Graph,
    old_bc: DataFrame,
    added_edges: DataFrame,
) -> DataFrame:
    """Betweenness after EDGE_ADD events on an UNDIRECTED graph —
    DynBetweenness semantics (centrality/DynBetweenness.cpp, Bergamini et
    al.: recompute only what the insertion can affect). A source s is
    AFFECTED iff some added edge {u, v} lies on a no-longer-longest route:
    d(s,u) + 1 <= d(s,v) or d(s,v) + 1 <= d(s,u) (strict = distances
    change, equal = path counts change); every other source's BFS DAG and
    dependencies are untouched. The update subtracts the affected sources'
    old per-source contributions (one batched Brandes over A on the old
    graph) and adds their new ones (same over the new graph): cost
    2|A| source-BFS instead of n."""
    from networkit_spark.operators.betweenness import betweenness

    # the shared affected-source primitive (affected_nodes below): the
    # endpoint set stays a DataFrame — an event batch touching many
    # vertices never becomes a driver-side Python list
    affected = affected_nodes(graph_before, added_edges)
    if affected.limit(1).count() == 0:  # one scalar, not the id list
        return old_bc
    old_part = betweenness(graph_before, sources=affected)
    new_part = betweenness(graph_after, sources=affected)
    return (
        old_bc.withColumnRenamed("score", "bc")
        .join(old_part.withColumnRenamed("score", "o"), "id", "left")
        .join(new_part.withColumnRenamed("score", "nw"), "id", "left")
        .select(
            "id",
            (
                F.col("bc")
                - F.coalesce("o", F.lit(0.0))
                + F.coalesce("nw", F.lit(0.0))
            ).alias("score"),
        )
    )


def update_harmonic_incremental(
    old_apsp: DataFrame, new_apsp: DataFrame, old_scores: DataFrame
) -> DataFrame:
    """Harmonic closeness after EDGE_ADD events, from the DynAPSP tables
    (DynTopHarmonicCloseness role, centrality/DynTopHarmonicCloseness.cpp:
    distances only shrink under insertions, so the score delta is a scan
    of the CHANGED (s, t) pairs): score'(s) = score(s) +
    sum over changed pairs of (1/d_new - 1/d_old), with 1/d_old = 0 for
    newly reachable pairs."""
    o = old_apsp.select("s", F.col("t").alias("t"), F.col("dist").alias("od"))
    nw = new_apsp.select("s", "t", F.col("dist").alias("nd"))
    delta = (
        nw.join(o, ["s", "t"], "left")
        .filter(F.col("od").isNull() | (F.col("nd") != F.col("od")))
        .filter(F.col("nd") > 0)
        .groupBy(F.col("s").alias("id"))
        .agg(
            F.sum(
                1.0 / F.col("nd")
                - F.when(F.col("od") > 0, 1.0 / F.col("od")).otherwise(0.0)
            ).alias("dsc")
        )
    )
    return (
        old_scores.withColumnRenamed("score", "old")
        .join(delta, "id", "left")
        .select("id", (F.col("old") + F.coalesce("dsc", F.lit(0.0))).alias("score"))
    )


def affected_nodes(graph_before: Graph, added_edges: DataFrame) -> DataFrame:
    """(id) — vertices whose distance OR shortest-path-count vector can
    change under the EDGE_ADD batch (distance/AffectedNodes.cpp role, the
    primitive the Dyn* updaters share): q is affected iff some added edge
    {u, v} satisfies d(q,u) + 1 <= d(q,v) or d(q,v) + 1 <= d(q,u) on the
    old graph (strict: distances change; equal: path counts change) —
    the exact set update_betweenness_incremental recomputes over. One
    multi-source BFS from the added edges' endpoints; undirected graphs."""
    from networkit_spark.operators.distance import multi_source_hops

    g = graph_before.to_undirected() if graph_before.directed else graph_before
    eps = (
        added_edges.select(F.col("src").alias("id"))
        .unionByName(added_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    dp = multi_source_hops(g, sources=eps)
    add = added_edges.select("src", "dst")
    BIG = F.lit(2**62)
    a_tab = dp.select(
        F.col("s").alias("src"), F.col("id").alias("q"), F.col("dist").alias("a")
    )
    b_tab = dp.select(
        F.col("s").alias("dst"), F.col("id").alias("q"), F.col("dist").alias("b")
    )
    au = add.join(a_tab, "src").select("src", "dst", "q", "a")
    bv = add.join(b_tab, "dst").select("src", "dst", "q", "b")
    return (
        au.join(bv, ["src", "dst", "q"], "full")
        .select(
            "q", F.coalesce("a", BIG).alias("a"), F.coalesce("b", BIG).alias("b")
        )
        .filter((F.col("a") + 1 <= F.col("b")) | (F.col("b") + 1 <= F.col("a")))
        .select(F.col("q").alias("id"))
        .distinct()
    )


def update_approx_betweenness_incremental(
    graph_before: Graph,
    graph_after: Graph,
    old_scores: DataFrame,
    added_edges: DataFrame,
    num_samples: int = 32,
    max_depth: int = 8,
    seed: int = 42,
) -> DataFrame:
    """RK approximate betweenness after EDGE_ADD events —
    DynApproxBetweenness semantics (centrality/DynApproxBetweenness.cpp:
    119-178 updateBatch): for every sampled (s, t) pair whose SSSP from s
    was modified by the batch, subtract the old sampled path's 1/r
    credits and re-walk a new path; unmodified pairs keep their walks.

    Set-oriented port: a sample is MODIFIED iff its source s satisfies
    the DynBetweenness affected-source criterion for some added edge
    {u, v} — d(s,u)+1 <= d(s,v) or d(s,v)+1 <= d(s,u) (strict =
    distances change, equal = path counts change; exactly DynSSSP's
    modified() trigger). Because every pair draw and predecessor draw is
    md5-pinned, replaying ONLY the affected sample ids on the old and
    new graphs reproduces precisely the credits the reference subtracts
    and re-adds — the hash-pinned re-run IS the update, now at
    |affected| walk cost instead of r. Removal batches fall back to a
    full re-run (same fallback as DynCC's split case)."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.operators.betweenness import approx_betweenness_rk

    spark = graph_before.vertices.sparkSession
    n = graph_before.num_nodes()
    r = num_samples

    # the pinned sample table (same draws as approx_betweenness_rk)
    s_draw = F.expr(md5_long_sql(f"('{seed}:abs:' || CAST(i AS STRING))")) % F.lit(n)
    samples = spark.range(r).select(F.col("id").alias("i")).select(
        "i", s_draw.cast("long").alias("s")
    )

    # shared affected-source primitive (affected_nodes)
    affected_sources = affected_nodes(graph_before, added_edges).select(
        F.col("id").alias("s")
    )
    aff = samples.join(affected_sources, "s").select("i")
    if aff.limit(1).count() == 0:  # one scalar, not the id list
        return old_scores

    old_cr = approx_betweenness_rk(
        graph_before, num_samples=r, max_depth=max_depth, seed=seed,
        return_credits=True, sample_ids=aff,
    )
    new_cr = approx_betweenness_rk(
        graph_after, num_samples=r, max_depth=max_depth, seed=seed,
        return_credits=True, sample_ids=aff,
    )
    oc = old_cr.groupBy(F.col("p").alias("id")).agg(F.count(F.lit(1)).alias("o"))
    nc = new_cr.groupBy(F.col("p").alias("id")).agg(F.count(F.lit(1)).alias("nw"))
    return (
        old_scores.withColumnRenamed("score", "sc")
        .join(oc, "id", "left")
        .join(nc, "id", "left")
        .select(
            "id",
            (
                F.col("sc")
                + (
                    F.coalesce("nw", F.lit(0)) - F.coalesce("o", F.lit(0))
                ).cast("double")
                / F.lit(float(r))
            ).alias("score"),
        )
    )
