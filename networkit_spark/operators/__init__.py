from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.labelprop import label_propagation
from networkit_spark.operators.triangles import (
    triangle_counts,
    global_triangle_count,
    local_clustering_coefficient,
    global_transitivity,
)

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "global_triangle_count",
    "local_clustering_coefficient",
    "global_transitivity",
]
