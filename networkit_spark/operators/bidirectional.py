"""Point-to-point distance queries — bidirectional BFS / Dijkstra.

Reference: networkit/cpp/distance/BidirectionalBFS.cpp:14-120 (two BFS
balls grown alternately from s and t, stop when they meet) and
BidirectionalDijkstra.cpp:14-150 (two Dijkstra balls with the classic
top(s)+top(t) >= best stopping rule).

Distributed formulation: each ball is a frontier superstep (the same shape
as bfs_hops / sssp); the reference's per-vertex queue alternation becomes
"expand whichever ball has the smaller frontier" (its ball-size heuristic,
BidirectionalBFS.cpp:96-104), and the meet test is one join between the
new frontier and the other ball's visited set. For BFS, at the first
nonempty intersection the exact distance is min over met vertices of
dS(v) + dT(v): meeting implies radius_s + radius_t >= d(s,t), at which
point the shortest path's vertex at distance radius_s from s is already
in both balls with sum exactly d(s,t). For Dijkstra the balls grow by
label-correcting waves and stop when min(frontier_s potential) +
min(frontier_t potential) >= best meet sum — no remaining relaxation can
improve a nonnegative-weight path. Work is O(ball sizes), the whole point
of the bidirectional tier vs a full SSSP."""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import materialize


def _frontier_expand(front, edges, visited, src_col="src", dst_col="dst"):
    return (
        front.withColumnRenamed("id", src_col)
        .join(edges, src_col)
        .select(F.col(dst_col).alias("id"))
        .distinct()
        .join(visited.select("id"), "id", "anti")
    )


def bidirectional_bfs_distance(graph: Graph, source: int, target: int) -> int | None:
    """Hop distance s->t, or None if unreachable. Directed graphs expand
    out-edges from s and IN-edges from t (BidirectionalBFS.cpp:66-82)."""
    if int(source) == int(target):
        return 0
    spark = graph.vertices.sparkSession
    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    vs = spark.createDataFrame([(int(source), 0)], "id long, d long")
    vt = spark.createDataFrame([(int(target), 0)], "id long, d long")
    vs, vt = vs.localCheckpoint(eager=True), vt.localCheckpoint(eager=True)
    fs, ft = vs, vt
    rs = rt = 0
    n = graph.num_nodes()
    while rs + rt <= n:
        cs, ct = fs.count(), ft.count()
        if cs == 0 and ct == 0:
            return None
        expand_s = ct == 0 or (cs != 0 and cs <= ct)
        if expand_s:
            rs += 1
            nxt = _frontier_expand(fs.select("id"), edges, vs).withColumn(
                "d", F.lit(rs).cast("long")
            )
            nxt = materialize(nxt)
            vs = materialize(vs.unionByName(nxt))
            fs = nxt
        else:
            rt += 1
            nxt = _frontier_expand(
                ft.select("id"), edges, vt, src_col="dst", dst_col="src"
            ).withColumn("d", F.lit(rt).cast("long"))
            nxt = materialize(nxt)
            vt = materialize(vt.unionByName(nxt))
            ft = nxt
        meet = (
            vs.withColumnRenamed("d", "ds")
            .join(vt.withColumnRenamed("d", "dt"), "id")
            .agg(F.min(F.col("ds") + F.col("dt")))
            .first()[0]
        )
        if meet is not None:
            return int(meet)
    return None


def bidirectional_dijkstra_distance(
    graph: Graph, source: int, target: int, max_rounds: int = 256
) -> float | None:
    """Weighted distance s->t with nonnegative weights, or None if
    unreachable (BidirectionalDijkstra.cpp semantics)."""
    if int(source) == int(target):
        return 0.0
    spark = graph.vertices.sparkSession
    edges = materialize(
        graph.edges.filter(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col("weight").cast("double").alias("w")
        )
    )

    def relax(front, dist, src_col, dst_col):
        cand = (
            front.withColumnRenamed("id", src_col)
            .join(edges, src_col)
            .groupBy(F.col(dst_col).alias("id"))
            .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
        )
        merged = dist.join(cand, "id", "full").select(
            "id", F.least("d", "nd").alias("d"), (F.col("nd") < F.coalesce("d", F.lit(float("inf")))).alias("chg")
        )
        return merged

    ds = spark.createDataFrame([(int(source), 0.0)], "id long, d double").localCheckpoint(eager=True)
    dt = spark.createDataFrame([(int(target), 0.0)], "id long, d double").localCheckpoint(eager=True)
    fs, ft = ds, dt
    best = None
    for _ in range(max_rounds):
        cs, ct = fs.count(), ft.count()
        if cs == 0 and ct == 0:
            break
        expand_s = ct == 0 or (cs != 0 and cs <= ct)
        if expand_s:
            merged = materialize(relax(fs, ds, "src", "dst"))
            fs = merged.filter(F.col("chg")).select("id", "d")
            ds = merged.select("id", "d")
        else:
            merged = materialize(relax(ft, dt, "dst", "src"))
            ft = merged.filter(F.col("chg")).select("id", "d")
            dt = merged.select("id", "d")
        meet = (
            ds.withColumnRenamed("d", "a")
            .join(dt.withColumnRenamed("d", "b"), "id")
            .agg(F.min(F.col("a") + F.col("b")))
            .first()[0]
        )
        if meet is not None:
            best = float(meet) if best is None else min(best, float(meet))
            pot_s = fs.agg(F.min("d")).first()[0]
            pot_t = ft.agg(F.min("d")).first()[0]
            pot = (pot_s if pot_s is not None else float("inf")) + (
                pot_t if pot_t is not None else float("inf")
            )
            if pot >= best:
                return best
    return best
