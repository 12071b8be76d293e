"""Deterministic distributed sampling (GraphTools.cpp:76-180:
randomNode / randomNodes / randomEdge / randomNeighbor).

The reference draws from a mutable RNG; a distributed engine wants samples
that are a pure function of (seed, data) — identical at any parallelism,
replayable, and expressible in the DuckDB oracle. Each element ranks by the
cross-engine 48-bit md5 hash of ``seed || ':' || key`` (functions/hashing)
and a sample is the k smallest ranks — a uniform-without-replacement draw
(distinct hashes induce a uniform random permutation) computed as a
distributed top-k, never a collect."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph


def _rank(expr_sql: str, seed: int) -> F.Column:
    # same text parses in Spark SQL and DuckDB (hashing.py contract)
    return F.expr(md5_long_sql(f"('{seed}:' || {expr_sql})"))


def sample_nodes(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """(id) — k nodes, uniform without replacement, deterministic in seed."""
    return (
        graph.vertices.select("id", _rank("CAST(id AS STRING)", seed).alias("rk"))
        .orderBy("rk", "id")
        .limit(k)
        .select("id")
    )


def sample_edges(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """(src, dst) — k canonical (src<=dst on undirected) edges."""
    e = graph.edges.select("src", "dst")
    if not graph.directed:
        e = e.filter(F.col("src") <= F.col("dst"))
    e = e.distinct()
    rk = _rank("(CAST(src AS STRING) || ':' || CAST(dst AS STRING))", seed)
    return e.select("src", "dst", rk.alias("rk")).orderBy("rk", "src", "dst").limit(k).select("src", "dst")


def random_neighbor(graph: Graph, node: int, seed: int = 42) -> int | None:
    """A deterministic uniform draw from N(node) (GraphTools::randomNeighbor)."""
    row = (
        graph.edges.filter(F.col("src") == int(node))
        .select(F.col("dst").alias("id"))
        .distinct()
        .select("id", _rank("CAST(id AS STRING)", seed).alias("rk"))
        .orderBy("rk", "id")
        .limit(1)
        .first()
    )
    return None if row is None else int(row["id"])


def sort_edges_by_weight(graph: Graph, decreasing: bool = False) -> DataFrame:
    """(src, dst, weight, pos) — per-src adjacency ranked by weight
    (GraphTools::sortEdgesByWeight, GraphTools.hpp:421; ties by dst id,
    matching the reference's stable id tie-break). A window over (src)
    partitions — hub rows stay on one reducer per src, same as the
    reference's per-node sort."""
    from pyspark.sql import Window

    order = [F.desc("weight") if decreasing else F.asc("weight"), F.asc("dst")]
    w = Window.partitionBy("src").orderBy(*order)
    return graph.edges.select(
        "src", "dst", "weight", (F.row_number().over(w) - 1).alias("pos")
    )


def bfs_sample(
    graph: Graph, source: int, k: int, max_iterations: int | None = None
) -> Graph:
    """Node-induced subgraph of the k nodes closest to ``source``
    (networkit/sampling.py:5-27 bfsSample).

    Documented deviation: the reference truncates mid-scan of a FIFO
    queue, so its node set depends on adjacency storage order; here the
    BFS is level-synchronous and the k nodes are taken in (dist, id)
    order — same "first k discovered" role, deterministic at any
    parallelism. Count deviation: the reference seeds closest={source}
    and then counts up to k *discovered* nodes, so it typically returns
    k+1 nodes (source + k); this port returns exactly k nodes including
    the source (pass k+1 to reproduce the reference's size). The selection is a distributed TakeOrderedAndProject
    (k is sample-sized by definition, never graph-sized)."""
    from networkit_spark.operators.centrality import bfs_hops

    dist = bfs_hops(graph, source=source, max_iterations=max_iterations)
    sel = dist.orderBy("dist", "id").limit(int(k)).select("id")
    return graph.subgraph_from_nodes(sel)


def gini(values: DataFrame, col: str) -> float:
    """Gini coefficient of a value column (networkit/stats.pyx gini):
    with x_(1) <= ... <= x_(n), G = 2*sum(i*x_(i))/(n*S) - (n+1)/n —
    algebraically identical to the reference's height/area fold. The rank
    is the range-partition cumsum (ties share arbitrary rank order, which
    cancels in sum(i*x) over equal values), so no single-task sort."""
    from networkit_spark.functions.ordering import global_cumsum

    base = (
        values.select(F.col(col).cast("double").alias("_x"))
        .withColumn("_t", F.monotonically_increasing_id())
        .withColumn("_one", F.lit(1))
    )
    ranked = global_cumsum(base, ["_x", "_t"], ["_one"])
    row = ranked.agg(
        F.sum(F.col("cum__one") * F.col("_x")).alias("ws"),
        F.sum("_x").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n, s = row["n"], row["s"]
    if not n or not s:
        return 0.0
    return 2.0 * row["ws"] / (n * s) - (n + 1.0) / n
