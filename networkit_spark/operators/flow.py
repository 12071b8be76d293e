"""Edmonds-Karp max-flow / min-cut (ref: networkit/cpp/flow/EdmondsKarp.cpp,
120 LoC; tests flow/test/EdmondsKarpGTest.cpp).

The reference runs sequential BFS augmenting paths over per-edge-id
flow/residFlow arrays. Distributed re-expression: the residual graph is a
``cap(src, dst, cap)`` DataFrame; each augmenting path is found by a
frontier-superstep BFS restricted to ``cap > 0`` arcs (the same loop shape
as ``bfs_hops``), tracking a deterministic min-id predecessor per newly
discovered vertex. The path is backtracked with path-length many one-row
lookups, its bottleneck gain computed by a path-sized broadcast join, and
the residual updated by one join (+gain on reverse arcs, -gain forward).

Undirected edges use the standard bidirected reduction — both stored arcs
start at capacity w; pushing f along u->v adds f to cap(v->u) — which
yields the same max-flow value as the reference's shared flow/residFlow
trick (EdmondsKarp.cpp:37-45). Directed graphs get explicit zero-capacity
reverse arcs.

Scale note: augmenting-path max-flow is inherently sequential in the
number of paths (the reference is too); each path costs O(dist(s,t))
supersteps. This is a fixture/subgraph-scale operator by design — at
cluster scale one would cut to a push-relabel formulation. The min-cut
``source_set`` (vertices residual-reachable from s at termination) is the
unique inclusion-minimal min-cut side, so it is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, require_fixture_scale

_EPS = 1e-9


def _residual_caps(graph: Graph) -> DataFrame:
    """Initial residual capacities. Parallel arcs merge by summed weight."""
    arcs = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(F.col("weight").cast("double")).alias("cap"))
    )
    # ensure every arc has its reverse present (cap 0 if absent) so residual
    # pushes have a row to land on
    rev = arcs.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(0.0).alias("cap"),
    )
    return (
        arcs.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("cap").alias("cap"))
    )


def _residual_bfs(
    caps: DataFrame, source: int, sink: int | None
) -> DataFrame:
    """BFS over cap>eps arcs; returns reach(id, dist, pred). Stops the level
    loop as soon as ``sink`` is discovered (shortest augmenting path —
    the Edmonds-Karp guarantee). ``sink=None`` explores to exhaustion
    (used for the final source-set)."""
    spark = caps.sparkSession
    arcs = caps.filter(F.col("cap") > _EPS).select("src", "dst")

    reach = spark.createDataFrame(
        [(int(source), 0, int(source))], "id long, dist long, pred long"
    ).localCheckpoint(eager=True)
    frontier = reach.select("id")
    level = 0
    while True:
        level += 1
        nxt = (
            arcs.join(frontier.withColumnRenamed("id", "src"), "src", "semi")
            .join(reach.select(F.col("id").alias("dst")), "dst", "anti")
            .groupBy("dst")
            .agg(F.min("src").alias("pred"))
            .select(
                F.col("dst").alias("id"),
                F.lit(level).cast("long").alias("dist"),
                "pred",
            )
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            return reach
        reach = reach.unionByName(nxt).localCheckpoint(eager=True)
        if sink is not None and nxt.filter(F.col("id") == sink).count() > 0:
            return reach
        frontier = nxt.select("id")


def edmonds_karp(
    graph: Graph, source: int, sink: int, max_paths: int = 10_000
) -> tuple[float, DataFrame]:
    """Max flow from ``source`` to ``sink``. Returns ``(flow_value,
    source_set)`` where source_set(id) is the residual-reachable min-cut
    side (EdmondsKarp.cpp:99-121 getSourceSet)."""
    if int(source) == int(sink):
        raise ValueError("source and sink must differ")
    spark = graph.vertices.sparkSession
    caps = _residual_caps(graph).localCheckpoint(eager=True)

    flow_value = 0.0
    for _ in range(max_paths):
        reach = _residual_bfs(caps, source, sink)
        pred_map = {
            r["id"]: r["pred"]
            for r in reach.filter(F.col("id") != F.col("pred")).collect()
        }
        if int(sink) not in pred_map:
            break
        # backtrack sink -> source (path-length sized, driver side)
        path = []
        v = int(sink)
        while v != int(source):
            u = int(pred_map[v])
            path.append((u, v))
            v = u
        path_df = spark.createDataFrame(path, "src long, dst long")
        gain = (
            caps.join(F.broadcast(path_df), ["src", "dst"])
            .agg(F.min("cap"))
            .collect()[0][0]
        )
        flow_value += float(gain)
        upd = path_df.select("src", "dst", F.lit(-float(gain)).alias("delta"))
        upd = upd.unionByName(
            path_df.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                F.lit(float(gain)).alias("delta"),
            )
        )
        caps = (
            caps.join(F.broadcast(upd), ["src", "dst"], "left")
            .select(
                "src", "dst",
                (F.col("cap") + F.coalesce("delta", F.lit(0.0))).alias("cap"),
            )
            .localCheckpoint(eager=True)
        )

    source_set = _residual_bfs(caps, source, None).select("id")
    return flow_value, source_set


def max_flow_value(graph: Graph, source: int, sink: int) -> float:
    value, _ = edmonds_karp(graph, source, sink)
    return value


def cut_clustering(
    graph: Graph, alpha: float, max_paths: int = 10_000, max_m: int = 200_000
) -> DataFrame:
    """(id, label) — CutClustering (Flake et al., "Graph Clustering and
    Minimum Cut Trees", Internet Mathematics 2004; ref
    community/CutClustering.cpp:19-84): augment the graph with a sink t
    joined to every node by an alpha-weight edge, then, visiting nodes in
    (degree DESC, id ASC) order (the reference's bucket sort,
    CutClustering.cpp:40-64), give every not-yet-assigned node u the
    min-cut source side between u and t as its cluster, labelled u.  A
    later source side may absorb earlier labels, exactly like the
    reference's overwrite loop (CutClustering.cpp:70-79).

    Determinism: edmonds_karp's ``source_set`` is the inclusion-MINIMAL
    min-cut side (residual reachability), which is unique for a given
    (graph, u, t) regardless of which max flow the path order found — so
    the partition matches the reference's bit-for-bit without replicating
    its path choices.

    Fixture-tier by design, like the reference: the outer loop is
    sequential in the number of clusters (each iteration one max flow,
    itself sequential in augmenting paths — see the module scale note).
    The alpha=0 / alpha>max-weight endpoints of the reference's
    getClusterHierarchy are closed-form (connected components /
    singletons, both implemented elsewhere); the interior breakpoint
    search is repeated run() calls at bracketing alphas.
    """
    if graph.directed:
        raise ValueError("cut_clustering expects an undirected graph")
    require_fixture_scale(graph, max_m, "cut_clustering")
    spark = graph.vertices.sparkSession
    order = [
        (int(r["id"]), int(r["degree"]))
        for r in graph.degrees().select("id", "degree").collect()
    ]
    order.sort(key=lambda p: (-p[1], p[0]))
    if not order:
        return spark.createDataFrame([], "id long, label long")
    t = max(i for i, _ in order) + 1
    sink_rows = [(i, t, float(alpha)) for i, _ in order]
    sink_edges = spark.createDataFrame(
        [(u, v, w) for u, v, w in sink_rows]
        + [(v, u, w) for u, v, w in sink_rows],
        "src long, dst long, weight double",
    )
    aug = Graph(
        graph.vertices.unionByName(
            spark.createDataFrame([(t,)], "id long")
        ),
        graph.edges.select(
            "src", "dst", F.col("weight").cast("double").alias("weight")
        ).unionByName(sink_edges),
        directed=False,
        weighted=True,
    )
    labels: dict[int, int] = {}
    for u, _deg in order:
        if u in labels:
            continue
        _, source_set = edmonds_karp(aug, u, t, max_paths=max_paths)
        for r in source_set.collect():
            labels[int(r["id"])] = u
    return spark.createDataFrame(
        sorted(labels.items()), "id long, label long"
    )
