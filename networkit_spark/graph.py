"""Graph handle + core primitives (SURVEY.md §2.1, §2.8).

The reference Graph (include/networkit/graph/Graph.hpp:95-140) is an
adjacency-list class with (weighted, directed) flags; here a graph is two
DataFrames plus the same flags:

    vertices(id: long, ...)            -- the `exists` set; tombstone == absence
    edges(src: long, dst: long, weight: float)

Undirected graphs store BOTH directions of every edge (mirroring
Graph.cpp:595 storing u in outEdges[v]); self-loops are stored once and, as
in the reference, count twice toward weightedDegree when asked
(Graph.cpp:552-558).

All primitives are lazy DataFrame transforms; Catalyst handles pruning and
pushdown. Aggregate-returning helpers (num_nodes, total_edge_weight, ...)
are actions.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.FloatType(), False),
    ]
)


@dataclass
class Graph:
    """vertices + symmetrized (if undirected) edges + flags."""

    vertices: DataFrame
    edges: DataFrame
    directed: bool = False
    weighted: bool = True
    _degrees: DataFrame | None = field(default=None, repr=False)

    # -- construction ------------------------------------------------------
    @staticmethod
    def empty(spark, directed: bool = False, weighted: bool = True) -> "Graph":
        v = spark.createDataFrame([], "id long")
        e = spark.createDataFrame([], EDGE_SCHEMA)
        return Graph(v, e, directed, weighted)

    # -- scalar stats (ref: GraphTools.hpp:21-146) --------------------------
    def num_nodes(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        """Undirected edge count; self-loops counted once (Graph.cpp:562-610)."""
        if self.directed:
            return self.edges.count()
        row = self.edges.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("src") == F.col("dst")).cast("long")).alias("loops"),
        ).first()
        rows, loops = row["rows"], row["loops"] or 0
        return (rows - loops) // 2 + loops

    def total_edge_weight(self) -> float:
        """Sum of undirected edge weights (used by PLM.cpp:42)."""
        if self.directed:
            return self.edges.agg(F.sum("weight")).first()[0] or 0.0
        row = self.edges.agg(
            F.sum("weight").alias("w"),
            F.sum(F.when(F.col("src") == F.col("dst"), F.col("weight"))).alias("lw"),
        ).first()
        w, lw = row["w"] or 0.0, row["lw"] or 0.0
        return (w - lw) / 2.0 + lw

    def density(self) -> float:
        n = self.num_nodes()
        if n < 2:
            return 0.0
        m = self.num_edges()
        denom = n * (n - 1) if self.directed else n * (n - 1) / 2
        return m / denom

    # -- degrees (ref: Graph.hpp:1280-1319, Graph.cpp:552-558) ---------------
    def degrees(self) -> DataFrame:
        """(id, degree: long, wdeg: double) over OUT-edges; every vertex
        present (isolated -> 0). Self-loop counts twice toward wdeg on
        undirected graphs, matching Graph::weightedDegree(u, true) used by
        PageRank on undirected graphs.
        """
        if self._degrees is not None:
            return self._degrees
        loop_mult = 1.0 if self.directed else 2.0
        by_src = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree"),
            F.sum(
                F.when(
                    F.col("src") == F.col("dst"),
                    F.col("weight").cast("double") * loop_mult,
                ).otherwise(F.col("weight").cast("double"))
            ).alias("wdeg"),
        )
        deg = (
            self.vertices.select("id")
            .join(by_src, "id", "left")
            .fillna({"degree": 0, "wdeg": 0.0})
        )
        return deg

    def with_cached_degrees(self) -> "Graph":
        d = self.degrees().persist()
        return replace(self, _degrees=d)

    def isolated_nodes(self) -> DataFrame:
        return self.degrees().filter(F.col("degree") == 0).select("id")

    # -- transforms (ref: GraphTools.hpp:205-410) ----------------------------
    def transpose(self) -> "Graph":
        """Swap src/dst (directed only; undirected is symmetric already)."""
        e = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return replace(self, edges=e, _degrees=None)

    def to_undirected(self) -> "Graph":
        if not self.directed:
            return self
        rev = self.edges.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return Graph(self.vertices, self.edges.unionByName(rev), False, self.weighted)

    def to_unweighted(self) -> "Graph":
        e = self.edges.withColumn("weight", F.lit(1.0).cast("float"))
        return replace(self, edges=e, weighted=False, _degrees=None)

    def subgraph_from_nodes(self, node_ids: DataFrame) -> "Graph":
        """Induced subgraph (ref: GraphTools::subgraphFromNodes) — semi-join
        edges on both endpoints."""
        ids = node_ids.select("id")
        v = self.vertices.join(ids, "id", "semi")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "semi")
            .select("src", "dst", "weight")
        )
        return Graph(v, e, self.directed, self.weighted)

    def remove_nodes(self, node_ids: DataFrame) -> "Graph":
        """Tombstone via anti-join (ref: Graph.cpp:527-548 exists[] bitmap)."""
        ids = node_ids.select("id")
        v = self.vertices.join(ids, "id", "anti")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "anti")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "anti")
            .select("src", "dst", "weight")
        )
        return Graph(v, e, self.directed, self.weighted)

    def remove_edges(self, pairs: DataFrame) -> "Graph":
        """Anti-join on (src, dst); symmetrized automatically if undirected."""
        p = pairs.select("src", "dst")
        if not self.directed:
            p = p.unionByName(
                p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
        e = self.edges.join(p, ["src", "dst"], "anti")
        return replace(self, edges=e, _degrees=None)

    def has_edge(self, src: int, dst: int) -> bool:
        return (
            self.edges.filter(
                (F.col("src") == src) & (F.col("dst") == dst)
            ).limit(1).count()
            > 0
        )

    def index_edges(self) -> DataFrame:
        """(src, dst, weight, edge_id) — consecutive ids on canonical
        (src<=dst) representatives (ref: Graph::indexEdges, Graph.cpp:226)."""
        canon = self.edges.filter(F.col("src") <= F.col("dst"))
        from networkit_spark.edges import mint_dense_ids

        keyed = canon.withColumn(
            "key", F.format_string("%019d:%019d", "src", "dst")
        )
        ids = mint_dense_ids(keyed.select("key"), "key")
        # edge-id dictionary is EDGE-sized — never force-broadcast it
        return (
            keyed.join(ids, "key")
            .select("src", "dst", "weight", F.col("id").alias("edge_id"))
        )

    # -- set ops (ref: GraphTools::append / merge, GraphTools.hpp:360-369) ---
    def append(self, other: "Graph") -> "Graph":
        """Disjoint union: other's ids shifted past ours."""
        off = (self.vertices.agg(F.max("id")).first()[0] or -1) + 1
        v = self.vertices.select("id").unionByName(
            other.vertices.select((F.col("id") + off).alias("id"))
        )
        e = self.edges.unionByName(
            other.edges.select(
                (F.col("src") + off).alias("src"),
                (F.col("dst") + off).alias("dst"),
                "weight",
            )
        )
        return Graph(v, e, self.directed, self.weighted)

    def merge(self, other: "Graph") -> "Graph":
        """Union over shared id space; duplicate edges collapse (max weight)."""
        v = self.vertices.select("id").unionByName(other.vertices.select("id")).distinct()
        e = (
            self.edges.unionByName(other.edges)
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
        )
        return Graph(v, e, self.directed, self.weighted)

    # -- invariants (ref: Graph.hpp:1517 checkConsistency) --------------------
    def check_consistency(self) -> None:
        e = self.edges
        assert e.filter(F.col("src").isNull() | F.col("dst").isNull()).count() == 0
        dangling = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
            .join(self.vertices.select("id"), "id", "anti")
        )
        assert dangling.count() == 0, "edge endpoint missing from vertices"
        if not self.directed:
            rev = e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
            asym = e.unionByName(rev).groupBy("src", "dst", "weight").agg(
                F.count(F.lit(1)).alias("c")
            ).filter((F.col("c") % 2 != 0) & (F.col("src") != F.col("dst")))
            assert asym.count() == 0, "undirected edge table not symmetric"


def from_edge_rows(
    spark,
    rows: list[tuple],
    directed: bool = False,
    weighted: bool = True,
    num_nodes: int | None = None,
) -> Graph:
    """Build a Graph from (u, v[, w]) tuples — the test-fixture constructor
    (analogue of the hand-built GoogleTest graphs, e.g.
    components/test/ConnectedComponentsGTest.cpp:32-66). Symmetrizes when
    undirected; vertices = 0..max id (or num_nodes) so isolated nodes exist.
    """
    norm = [
        (int(u), int(v), float(w[0]) if w else 1.0) for (u, v, *w) in rows
    ]
    e = spark.createDataFrame(
        [(u, v, w) for u, v, w in norm], schema=EDGE_SCHEMA
    )
    if not directed:
        e = e.unionByName(
            spark.createDataFrame(
                [(v, u, w) for u, v, w in norm if u != v], schema=EDGE_SCHEMA
            )
        )
    if num_nodes is None:
        num_nodes = max((max(u, v) for u, v, _ in norm), default=-1) + 1
    v = spark.range(num_nodes).select(F.col("id").cast("long"))
    return Graph(v, e, directed, weighted)


def require_fixture_scale(graph: Graph, max_m: int, op: str) -> None:
    """Loud guard for documented fixture-tier operators (ones that, like
    their pure-Python / sequential reference counterparts, materialise the
    edge list on the driver): raise instead of silently collecting an
    at-scale graph into driver memory.  ``max_m`` bounds the DIRECTED
    stored edge count (undirected graphs store both directions); callers
    expose it as a parameter so a user who accepts the driver cost can
    raise it explicitly."""
    m = graph.edges.count()
    if m > max_m:
        raise ValueError(
            f"{op} is a fixture-tier (driver-sequential) operator; the graph "
            f"has m={m} stored edges > max_m={max_m}. Use the distributed "
            f"operators at scale, or pass a larger max_m explicitly."
        )
