"""networkit_spark — a from-scratch PySpark-native link-graph analytics engine.

Reproduces the core algorithm surface of NetworKit (reference:
/root/reference, a C++/OpenMP + Cython library) re-expressed Spark-first:

- power-iteration PageRank        (ref: networkit/cpp/centrality/PageRank.cpp)
- hash-min connected components   (ref: networkit/cpp/components/ParallelConnectedComponents.cpp)
- label propagation communities   (ref: networkit/cpp/community/PLP.cpp, MPLP.cpp)
- wedge-based triangle counting   (ref: networkit/cpp/edgescores/TriangleEdgeScore.cpp)

over an edge table derived from multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts), plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus pipeline needs.

Everything is DataFrame-first: Catalyst plans the physical execution; the
engine contributes the fixpoint drivers, frontier/active-set management,
hub-vertex salting, dense-id dictionary minting, and checkpoint/lineage
truncation that Spark does not provide natively.
"""

from networkit_spark.graph import Graph, from_edge_rows
from networkit_spark.edges import derive_edges, mint_dense_ids
from networkit_spark.transcripts import synth_transcripts

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "from_edge_rows",
    "derive_edges",
    "mint_dense_ids",
    "synth_transcripts",
]
