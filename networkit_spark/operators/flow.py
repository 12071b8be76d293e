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

from networkit_spark.graph import Graph

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
