"""NetworkX interop — the reference's nxadapter module.

Reference: networkit/nxadapter.py:20-70 (nx2nk / nk2nx). Same contract:
node ids map to consecutive integers in NetworkX insertion order, edges
are weighted only when a weight attribute is named (nx2nk's weightAttr),
directedness follows the source graph, and the reverse conversion emits
a networkx Graph/DiGraph with a `weight` attribute on weighted edges.

Fixture tier by design, exactly like the reference: both directions walk
a driver-resident NetworkX object edge by edge (NetworkX graphs ARE
driver memory), so the DataFrame side is a createDataFrame / collect
boundary — the distributed engine starts where the converted Graph is
consumed. The id map is returned alongside the graph (the reference
drops it, which loses the ability to read results back; callers that
want reference-exact behavior can ignore it).
"""

from __future__ import annotations

from networkit_spark.graph import Graph, from_edge_rows, require_fixture_scale


def nx_to_graph(spark, nx_graph, weight_attr: str | None = None):
    """(Graph, idmap) — convert a networkx (Di)Graph; idmap maps each
    original node object to its dense id (insertion order, nx2nk:29)."""
    idmap = {node: i for i, node in enumerate(nx_graph.nodes())}
    rows = []
    for u, v, data in nx_graph.edges(data=True):
        if weight_attr is not None:
            rows.append((idmap[u], idmap[v], float(data[weight_attr])))
        else:
            rows.append((idmap[u], idmap[v]))
    g = from_edge_rows(
        spark,
        rows,
        directed=nx_graph.is_directed(),
        weighted=weight_attr is not None,
        num_nodes=nx_graph.number_of_nodes(),
    )
    return g, idmap


def graph_to_nx(graph: Graph, max_m: int = 200_000):
    """Convert a Graph to networkx (nk2nx:51-70): DiGraph iff directed,
    `weight` edge attribute iff weighted, every vertex present (isolated
    nodes included). Undirected storage holds both directions, so each
    undirected edge is emitted once (src <= dst keeps the self-loop)."""
    import networkx as nx

    require_fixture_scale(graph, max_m, "graph_to_nx")
    out = nx.DiGraph() if graph.directed else nx.Graph()
    out.add_nodes_from(r["id"] for r in graph.vertices.select("id").collect())
    edges = graph.edges
    if not graph.directed:
        from pyspark.sql import functions as F

        edges = edges.filter(F.col("src") <= F.col("dst"))
    for r in edges.collect():
        if graph.weighted:
            out.add_edge(r["src"], r["dst"], weight=r["weight"])
        else:
            out.add_edge(r["src"], r["dst"])
    return out
