"""Gephi graph-streaming event formatter.

Reference: networkit/gephi/streaming.py (GephiStreamingClient.exportGraph)
+ networkit/gephi/pyclient.py:68-83 — the client POSTs one JSON object per
line to the Gephi Streaming plugin: ``{"an": {"<node>": attrs}}`` add-node
events first (size 2.0, grey 0.6/0.6/0.6, nodes laid out on a deterministic
sqrt(n) x sqrt(n) grid spanning the +-1000 default viewport, since Gephi
0.9 forbids coincident coordinates), then ``{"ae": {"<edgeId>": {source,
target, directed}}}`` add-edge events with edge id "u->v" (directed) or
"min-max" (undirected); weights/attributes are not exported, matching
exportGraph's documented contract.

The reference is a socket client; the engine-side counterpart is this
DataFrame formatter — (seq, event) rows whose ``event`` strings ARE the
protocol lines in emission order (nodes before edges, both in id order), so
any sink (foreachBatch HTTP POST, file, kafka) can stream them to a Gephi
master. Pure JVM expressions: dense-rank the vertices for grid positions,
one to_json per row, zero driver-side iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph

_NODE_AREA_SIZE = 2000.0


def to_gephi_events(graph: Graph) -> DataFrame:
    """(seq, event) — the add-node / add-edge JSON event lines of
    exportGraph (streaming.py:39-77), in emission order by ``seq``."""
    n = graph.num_nodes()
    spark = graph.vertices.sparkSession
    if n == 0:
        return spark.createDataFrame([], "seq long, event string")
    side = math.ceil(math.sqrt(n))
    step = _NODE_AREA_SIZE / side
    offset = _NODE_AREA_SIZE / 2.0

    # node number = position in ascending-id iteration order (iterNodes);
    # numeric rank via the range-partition cumsum (no single-task window)
    nodes = (
        graph.vertices.select(F.col("id").cast("long").alias("id"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    from networkit_spark.functions.ordering import global_cumsum

    ranked = global_cumsum(nodes, ["id"], ["one"]).select(
        "id", (F.col("cum_one") - 1).alias("num")
    )
    node_attrs = F.struct(
        F.lit(2.0).alias("size"),
        F.lit(0.6).alias("r"),
        F.lit(0.6).alias("g"),
        F.lit(0.6).alias("b"),
        ((F.col("num") / side).cast("long") * step - offset).alias("y"),
        (F.pmod(F.col("num"), F.lit(side)) * step - offset).alias("x"),
    )
    node_events = ranked.select(
        F.col("num").alias("seq"),
        F.to_json(
            F.create_map(F.lit("an"), F.create_map(F.col("id").cast("string"), node_attrs))
        ).alias("event"),
    )

    e = graph.edges.select("src", "dst")
    if not graph.directed:
        e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        ).distinct()
        eid = F.concat_ws("-", F.col("src").cast("string"), F.col("dst").cast("string"))
    else:
        eid = F.concat_ws("->", F.col("src").cast("string"), F.col("dst").cast("string"))
    edge_attrs = F.struct(
        F.col("src").alias("source"),
        F.col("dst").alias("target"),
        F.lit(bool(graph.directed)).alias("directed"),
    )
    edge_ranked = global_cumsum(
        e.withColumn("one", F.lit(1).cast("long")), ["src", "dst"], ["one"]
    )
    edge_events = edge_ranked.select(
        (F.col("cum_one") - 1 + F.lit(n)).alias("seq"),
        F.to_json(F.create_map(F.lit("ae"), F.create_map(eid, edge_attrs))).alias(
            "event"
        ),
    )
    return node_events.unionByName(edge_events)
