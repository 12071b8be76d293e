"""The driver-contract registry: Spark query callables + DuckDB oracle SQL.

Every operator claimed in SURVEY.md §2 has an entry here; the driver runs
both sides at sf=0.01 and hash-compares. Iteration-bearing queries are
pinned to fixed superstep counts (same count in the SQL) so pacing can never
diverge.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark import entrylib as L
from networkit_spark.functions import dedup, similarity, textstats
from networkit_spark.functions.multimodal import attach_binary, decode_images
from networkit_spark.operators.coarsening import coarsen, modularity
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.labelprop import label_propagation
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.triangles import (
    global_transitivity,
    global_triangle_count,
    local_clustering_coefficient,
    triangle_counts,
)

PR_ITERS = 12
CC_ITERS = 12
LP_ITERS = 4
EIG_ITERS = 10
KATZ_ITERS = 10
KATZ_ALPHA = 0.05
KATZ_BETA = 0.1
BFS_ITERS = 15
SSSP_ITERS = 15
KCORE_ITERS = 16  # h-index rounds; fixed point reached well before this
PLM_PINNED_SWEEPS = 3  # single-level Louvain move sweeps (oracle-unrolled)
APSP_ITERS = 8  # all-pairs BFS depth bound (events-graph diameter << this)
# hub-hinge cap for link prediction (mirrored in sql_linkpred): hinges with
# degree above this are dropped, bounding the wedge join at Σ min(deg,cap)².
# The sf0.01 events graph is hub-dominated (5 etype hubs at deg 154, users at
# deg 5), so any binding cap there empties the result; the gate runs the cap
# code path non-bindingly and tests/test_linkprediction.py exercises a
# binding cap on a hub fixture.
LINKPRED_HINGE_CAP = 10_000


# ---- graph family ---------------------------------------------------------


def q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return g.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))


def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return g.degrees().select("id", "degree", F.col("wdeg").cast("double").alias("wdeg"))


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    scores = pagerank(g, damp=0.85, tol=0.0, max_iterations=PR_ITERS)
    return scores.select("id", F.round("score", 6).alias("score"))


def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return connected_components(g, max_iterations=CC_ITERS).select("id", "label")


def q_graph_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return label_propagation(g, theta=-1, max_iterations=LP_ITERS).select("id", "label")


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return triangle_counts(g).select("id", F.col("triangles").cast("bigint").alias("triangles"))


def q_graph_triangle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    n = global_triangle_count(g)
    return spark.createDataFrame([(n,)], "triangles bigint")


def q_graph_lcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return local_clustering_coefficient(g).select("id", F.round("lcc", 6).alias("lcc"))


def q_graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    t = round(global_transitivity(g), 6)
    return spark.createDataFrame([(t,)], "transitivity double")


def q_graph_triangle_edge_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import triangle_edge_scores

    g, _ = L.events_graph(spark, sf_dir)
    return triangle_edge_scores(g).select(
        "src", "dst", F.col("score").cast("bigint").alias("score")
    )


def q_graph_transitivity_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.triangles import approx_transitivity

    g, _ = L.events_graph(spark, sf_dir)
    t = round(approx_transitivity(g, samples_per_vertex=8, seed=42), 6) + 0.0
    return spark.createDataFrame([(t,)], "approx_transitivity double")


def q_graph_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, verts = L.events_graph(spark, sf_dir)
    d = g.degrees()
    return (
        d.join(verts, "id")
        .select("key", "degree", F.col("wdeg").cast("double").alias("wdeg"))
        .orderBy(F.desc("wdeg"), F.asc("key"))
        .limit(20)
    )


def q_graph_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coarsen by LP communities (CC gives one part on this connected graph)
    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    cg, _ = coarsen(g, labels)
    return cg.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    m = round(modularity(g, labels), 6) + 0.0
    return spark.createDataFrame([(m,)], "modularity double")


# ---- CSR-block execution paths (same oracles as the expr paths) -----------


def q_graph_pagerank_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    scores = pagerank(g, damp=0.85, tol=0.0, max_iterations=PR_ITERS, impl="csr")
    return scores.select("id", F.round("score", 6).alias("score"))


def q_graph_components_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return connected_components(g, max_iterations=CC_ITERS, impl="csr").select(
        "id", "label"
    )


def q_graph_labelprop_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_graph(spark, sf_dir)
    return label_propagation(
        g, theta=-1, max_iterations=LP_ITERS, impl="csr"
    ).select("id", "label")


# ---- centrality / distance family ------------------------------------------


def q_centrality_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import degree_centrality

    g, _ = L.events_graph(spark, sf_dir)
    return degree_centrality(g).select("id", F.round("score", 6).alias("score"))


def q_centrality_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import eigenvector_centrality

    g, _ = L.events_graph(spark, sf_dir)
    s = eigenvector_centrality(g, tol=0.0, max_iterations=EIG_ITERS)
    return s.select("id", F.round("score", 6).alias("score"))


def q_centrality_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import katz_centrality

    g, _ = L.events_graph(spark, sf_dir)
    s = katz_centrality(
        g, alpha=KATZ_ALPHA, beta=KATZ_BETA, tol=0.0, max_iterations=KATZ_ITERS
    )
    return s.select("id", F.round("score", 6).alias("score"))


def q_centrality_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.betweenness import betweenness

    g, _ = L.events_graph(spark, sf_dir)
    s = betweenness(g, max_depth=APSP_ITERS)
    return s.select("id", F.round("score", 6).alias("score"))


def q_centrality_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import harmonic_closeness

    g, _ = L.events_graph(spark, sf_dir)
    s = harmonic_closeness(g)
    return s.select("id", F.round("score", 6).alias("score"))


def q_centrality_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import closeness

    g, _ = L.events_graph(spark, sf_dir)
    s = closeness(g, variant="standard")
    return s.select("id", F.round("score", 6).alias("score"))


NFH_SAMPLES = 20


def q_graph_neighborhood_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-BFS neighborhood function, SPLIT strategy
    (anf.neighborhood_function_heuristic): degree-asc rank sampling,
    n/s-scaled per-distance counts, exact N(1)/N(diameter) endpoints."""
    from networkit_spark.operators.anf import neighborhood_function_heuristic

    g, _ = L.events_graph(spark, sf_dir)
    return neighborhood_function_heuristic(g, n_samples=NFH_SAMPLES)


def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import diameter_exact

    g, _ = L.events_graph(spark, sf_dir)
    d = diameter_exact(g)
    return spark.createDataFrame([(d,)], "diameter bigint")


def q_graph_sample_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.sampling import sample_nodes

    g, _ = L.events_graph(spark, sf_dir)
    return sample_nodes(g, k=10, seed=42)


def q_graph_sample_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.sampling import sample_edges

    g, _ = L.events_graph(spark, sf_dir)
    return sample_edges(g, k=10, seed=42)


def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scc import strongly_connected_components

    g, _ = L.events_digraph(spark, sf_dir)
    return strongly_connected_components(g).select("id", "label")


def q_graph_digraph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    g, _ = L.events_digraph(spark, sf_dir)
    return g.edges.select("src", "dst", F.col("weight").cast("double").alias("weight"))


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import bfs_hops

    g, _ = L.events_graph(spark, sf_dir)
    return bfs_hops(g, source=0, max_iterations=BFS_ITERS).select("id", "dist")


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import sssp_weighted

    g, _ = L.events_graph(spark, sf_dir)
    d = sssp_weighted(g, source=0, max_iterations=SSSP_ITERS)
    return d.select("id", F.round("dist", 6).alias("dist"))


def q_graph_core_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import core_decomposition

    g, _ = L.events_graph(spark, sf_dir)
    return core_decomposition(g, max_iterations=KCORE_ITERS).select("id", "core")


def q_graph_plm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-running multilevel Louvain, checked through CLOSED-FORM
    INVARIANTS (the gen_rmat_invariants pattern — VERDICT r2 task 7): the
    raw partition has no SQL oracle (sweep/level counts are
    data-dependent), but (a) every vertex carries exactly one label,
    (b) the modularity sequence [singleton baseline, accepted level 1,
    ...] projected to the original graph is finite, inside the
    mathematical [-0.5, 1] range, and non-decreasing (plm accepts levels
    monotonically, restoring the reference's never-worse-than-start
    guarantee). The oracle recomputes n_nodes from the edge derivation
    and pins the booleans to TRUE."""
    from networkit_spark.operators.louvain import plm

    g, _ = L.events_graph(spark, sf_dir)
    qs: list[float] = []
    labels = plm(g, level_modularities=qs)
    n = g.num_nodes()
    assigned = labels.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("id").alias("ids"),
        F.count(F.when(F.col("label").isNull(), 1)).alias("nulls"),
    ).first()
    import math

    row = [
        (
            int(n),
            int(assigned["rows"]),
            int(assigned["ids"]),
            int(assigned["nulls"]),
            bool(len(qs) >= 1),
            bool(all(math.isfinite(q) and -0.5 <= q <= 1.0 for q in qs)),
            bool(all(qs[i] <= qs[i + 1] + 1e-12 for i in range(len(qs) - 1))),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_nodes bigint, n_rows bigint, n_ids bigint, null_labels bigint, "
        "has_levels boolean, q_in_range boolean, q_nondecreasing boolean",
    )


def q_graph_plm_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.louvain import plm_pinned

    g, _ = L.events_graph(spark, sf_dir)
    return plm_pinned(g, sweeps=PLM_PINNED_SWEEPS).select("id", "label")


def q_graph_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.linkprediction import link_prediction_scores

    g, _ = L.events_graph(spark, sf_dir)
    s = link_prediction_scores(g, max_hinge_degree=LINKPRED_HINGE_CAP)
    return s.select(
        "u", "v", "cn",
        F.round("aa", 6).alias("aa"),
        F.round("ra", 6).alias("ra"),
        F.round("jaccard", 6).alias("jaccard"),
        "pa", "tn",
    )


# ---- community measures over the LP partition ------------------------------


def q_community_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NMI/Rand/Jaccard dissimilarity between the 4-sweep and 2-sweep LP
    partitions — the quantitative PLP-vs-PLP comparison surface."""
    from networkit_spark.operators.measures import partition_measures

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    eta = label_propagation(g, theta=-1, max_iterations=2)
    m = partition_measures(zeta, eta)
    return spark.createDataFrame(
        [
            (
                round(m["nmi_distance"], 6) + 0.0,
                round(m["rand_distance"], 6) + 0.0,
                round(m["jaccard_distance"], 6) + 0.0,
            )
        ],
        "nmi_distance double, rand_distance double, jaccard_distance double",
    )


def q_centrality_permanence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex permanence (PermanenceCentrality.cpp) against the
    1-sweep pinned LP partition."""
    from networkit_spark.operators.permanence import permanence_centrality

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=1)
    labels = labels.localCheckpoint(eager=True)
    return (
        permanence_centrality(g, labels)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.round("permanence", 6).alias("permanence"),
        )
        .orderBy("id")
    )


def q_centrality_spanning_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate spanning-edge centrality (JL sketch, k=4, 30 Jacobi
    supersteps) per canonical edge."""
    from networkit_spark.operators.electrical import spanning_edge_scores

    g, _ = L.events_graph(spark, sf_dir)
    return (
        spanning_edge_scores(g, num_systems=4, num_iters=30, omega=0.5, seed=42)
        .select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
            F.round("sec", 6).alias("sec"),
        )
        .orderBy("src", "dst")
    )


def q_centrality_betweenness_rk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Riondato-Kornaropoulos sampled-path betweenness estimate,
    32 md5-pinned (s,t) pairs, depth horizon 8."""
    from networkit_spark.operators.betweenness import approx_betweenness_rk

    g, _ = L.events_graph(spark, sf_dir)
    return (
        approx_betweenness_rk(g, num_samples=32, max_depth=8, seed=42)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("id")
    )


def q_centrality_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eppstein-Wang sampled closeness from 8 md5-pinned pivots — the
    scale path for closeness."""
    from networkit_spark.operators.distance import sampled_closeness

    g, _ = L.events_graph(spark, sf_dir)
    return (
        sampled_closeness(g, num_samples=8, seed=42)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.round("closeness_est", 6).alias("closeness_est"),
        )
        .orderBy("id")
    )


def q_centrality_local_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local partition coverage against the 1-sweep pinned LP
    partition."""
    from networkit_spark.operators.permanence import local_partition_coverage

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=1)
    labels = labels.localCheckpoint(eager=True)
    return (
        local_partition_coverage(g, labels)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.round("coverage", 6).alias("coverage"),
        )
        .orderBy("id")
    )


def q_community_partition_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster local evaluation of the 4-sweep LP partition:
    intrapartition density, hub dominance, isolated conductance/expansion."""
    from networkit_spark.operators.partition_eval import (
        intrapartition_density,
        isolated_interpartition_values,
        partition_hub_dominance,
    )

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=1)
    labels = labels.localCheckpoint(eager=True)
    d = intrapartition_density(g, labels)
    h = partition_hub_dominance(g, labels).select("label", "hub_dominance")
    i = isolated_interpartition_values(g, labels).select(
        "label", "iso_conductance", "iso_expansion"
    )
    return (
        d.join(h, "label")
        .join(i, "label")
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("size").cast("bigint").alias("size"),
            F.round("density", 6).alias("density"),
            F.round("hub_dominance", 6).alias("hub_dominance"),
            F.round("iso_conductance", 6).alias("iso_conductance"),
            F.round("iso_expansion", 6).alias("iso_expansion"),
        )
    )


def q_community_adjusted_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.measures import adjusted_rand_distance

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=2)
    eta = label_propagation(g, theta=-1, max_iterations=1)
    v = round(adjusted_rand_distance(zeta, eta), 6) + 0.0
    return spark.createDataFrame([(v,)], "adjusted_rand_distance double")


def q_community_sampled_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-derandomized sampled node-/graph-structural Rand distances
    between the 2-sweep and 1-sweep pinned LP partitions."""
    from networkit_spark.operators.measures import (
        sampled_graph_rand_distance,
        sampled_node_rand_distance,
    )

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=2).localCheckpoint(eager=True)
    eta = label_propagation(g, theta=-1, max_iterations=1).localCheckpoint(eager=True)
    nv = round(sampled_node_rand_distance(g, zeta, eta, 40), 6) + 0.0
    ev = round(sampled_graph_rand_distance(g, zeta, eta, 60), 6) + 0.0
    return spark.createDataFrame(
        [(nv, ev)], "sampled_node_rand double, sampled_graph_rand double"
    )


def q_community_graph_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.measures import graph_structural_rand

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=2)
    eta = label_propagation(g, theta=-1, max_iterations=1)
    v = round(graph_structural_rand(g, zeta, eta), 6) + 0.0
    return spark.createDataFrame([(v,)], "graph_structural_rand double")


def q_community_cover_hub_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping cover = pinned-LP subsets + component subsets (offset);
    every node holds two memberships, so the cover path is genuinely
    exercised."""
    from networkit_spark.operators.partition_eval import cover_hub_dominance

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=1).select(
        "id", F.col("label").alias("subset")
    )
    comp = connected_components(g, max_iterations=CC_ITERS).select(
        "id", (F.col("label") + F.lit(10_000_000)).alias("subset")
    )
    cover = zeta.unionByName(comp)
    return cover_hub_dominance(g, cover).select(
        F.col("subset").cast("bigint").alias("subset"),
        F.col("size").cast("bigint").alias("size"),
        F.round("hub_dominance", 6).alias("hub_dominance"),
    )


def q_community_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.partition_eval import partition_fragmentation

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=1)
    comp = connected_components(g, max_iterations=CC_ITERS)
    return partition_fragmentation(g, zeta, comp).select(
        F.col("label").cast("bigint").alias("label"),
        F.col("size").cast("bigint").alias("size"),
        F.round("fragmentation", 6).alias("fragmentation"),
    )


def q_community_overlapping_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.measures import overlapping_nmi_distance

    g, _ = L.events_graph(spark, sf_dir)
    n = g.num_nodes()
    cx = label_propagation(g, theta=-1, max_iterations=1).select(
        "id", F.col("label").alias("subset")
    ).unionByName(
        connected_components(g, max_iterations=CC_ITERS).select(
            "id", (F.col("label") + F.lit(10_000_000)).alias("subset")
        )
    )
    cy = label_propagation(g, theta=-1, max_iterations=2).select(
        "id", F.col("label").alias("subset")
    )
    v = round(overlapping_nmi_distance(cx, cy, n), 6) + 0.0
    return spark.createDataFrame([(v,)], "onmi_distance double")


def q_community_cover_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 of each LP community against the best-matching connected
    component — partitions viewed as covers (CoverF1Similarity.cpp)."""
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.partition_eval import cover_f1_similarity

    g, _ = L.events_graph(spark, sf_dir)
    zeta = label_propagation(g, theta=-1, max_iterations=1).select(
        "id", F.col("label").alias("subset")
    )
    ref = connected_components(g, max_iterations=CC_ITERS).select(
        "id", F.col("label").alias("subset")
    )
    return cover_f1_similarity(zeta, ref).select(
        F.col("subset").cast("bigint").alias("subset"),
        F.round("f1", 6).alias("f1"),
    )


def q_community_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.coarsening import coverage

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    c = round(coverage(g, labels), 6) + 0.0
    return spark.createDataFrame([(c,)], "coverage double")


def q_community_edgecut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.coarsening import edge_cut

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    c = round(edge_cut(g, labels), 6) + 0.0
    return spark.createDataFrame([(c,)], "edge_cut double")


def q_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.coarsening import conductance_per_cluster

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    return conductance_per_cluster(g, labels).select(
        "label", F.round("conductance", 6).alias("conductance")
    )


SPARSIFY_RATIO = 0.3
BFS_SAMPLE_K = 40
FIEDLER_ITERS = 20
PMDS_PIVOTS = 6
PMDS_DIM = 2
PMDS_ITERS = 40  # pinned power steps per dimension (oracle-replayable mode)


def q_viz_pivot_mds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PivotMDS layout (viz/PivotMDS.cpp:22-133) in pinned mode: md5-rank
    pivots, batched multi-pivot BFS, double centering, deflated power
    iteration on the k×k Gram, coordinates C·v rounded to 6dp. The hop
    (unweighted) metric is used — the entity graph's count weights are
    multiplicities, not lengths."""
    from networkit_spark.graph import Graph
    from networkit_spark.operators.layout import pivot_mds

    g, _ = L.events_graph(spark, sf_dir)
    gu = Graph(g.vertices, g.edges, g.directed, False)
    out = pivot_mds(
        gu, dim=PMDS_DIM, num_pivots=PMDS_PIVOTS, pinned_iters=PMDS_ITERS
    )
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        *[
            (F.round(F.col(f"x{d}"), 6) + F.lit(0.0)).alias(f"x{d}")
            for d in range(PMDS_DIM)
        ],
    )


def q_graph_spectral_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpectralPartitioner count=2 (networkit/partitioning.py:56-176) as
    supersteps: deflated power iteration for the Fiedler vector, balanced
    split at the floor(n/2)-th smallest value."""
    from networkit_spark.operators.spectral import spectral_bisection

    g, _ = L.events_graph(spark, sf_dir)
    return spectral_bisection(g, num_iters=FIEDLER_ITERS, balanced=True)


def q_graph_bfs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bfsSample (networkit/sampling.py:5-27): node-induced subgraph of
    the k nodes closest to source 0, levels filled in (dist, id) order."""
    from networkit_spark.operators.sampling import bfs_sample

    g, _ = L.events_graph(spark, sf_dir)
    s = bfs_sample(g, source=0, k=BFS_SAMPLE_K, max_iterations=BFS_ITERS)
    return s.edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )


def q_graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the degree and weighted-degree distributions
    (networkit/stats.pyx gini over centrality scores — the fork's
    inequality diagnostic)."""
    from networkit_spark.operators.sampling import gini

    g, _ = L.events_graph(spark, sf_dir)
    deg = g.degrees()
    return spark.createDataFrame(
        [(
            round(gini(deg, "degree"), 9) + 0.0,
            round(gini(deg, "wdeg"), 9) + 0.0,
        )],
        "degree_gini double, wdeg_gini double",
    )


def q_graph_sparsify_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getSparsifiedGraphOfSize (sparsification.pyx:696-786) Spark-first:
    keep the top ceil(ratio*m) canonical edges under (random score DESC,
    md5 tiebreak) with ONE distributed exact-rank pass instead of the
    reference's binary-search probe loop."""
    from networkit_spark.operators.sparsification import random_edge_score
    from networkit_spark.operators.sparsifiers import sparsify_to_ratio

    g, _ = L.events_graph(spark, sf_dir)
    sc = random_edge_score(g, seed=42)
    g2 = sparsify_to_ratio(g, sc, SPARSIFY_RATIO, seed=42)
    return (
        g2.edges.filter(F.col("src") < F.col("dst"))
        .select(
            "src", "dst",
            F.round(F.col("weight").cast("double"), 6).alias("weight"),
        )
    )


def q_community_clustering_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphClusteringTools over the LP partition: the compacted
    communication graph (cut weights between clusters) widened with the
    scalar utilities — imbalance, proper/one/singleton predicates, and
    edge-level equality vs the CC partition
    (community/GraphClusteringTools.cpp:10-116)."""
    from networkit_spark.operators.clustering_tools import (
        communication_graph,
        equal_clusterings,
        imbalance,
        is_one_clustering,
        is_proper_clustering,
        is_singleton_clustering,
    )

    g, _ = L.events_graph(spark, sf_dir)
    # 1 sweep keeps several clusters per component, so the communication
    # graph is non-trivial (fully-converged LP == components -> no cut edges)
    lp = label_propagation(g, theta=-1, max_iterations=1)
    cc = connected_components(g, max_iterations=CC_ITERS)
    scal = spark.createDataFrame(
        [(
            round(imbalance(lp), 6) + 0.0,
            is_proper_clustering(g, lp),
            is_one_clustering(g, lp),
            is_singleton_clustering(g, lp),
            equal_clusterings(lp, cc, g),
        )],
        "imbalance double, is_proper boolean, is_one boolean,"
        " is_singleton boolean, equals_cc boolean",
    )
    return (
        communication_graph(g, lp)
        .select("src", "dst", F.round("weight", 6).alias("weight"))
        .crossJoin(scal)
    )


def q_community_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.labelprop import stable_partition_fraction

    g, _ = L.events_graph(spark, sf_dir)
    labels = label_propagation(g, theta=-1, max_iterations=LP_ITERS)
    s = round(stable_partition_fraction(g, labels), 6) + 0.0
    return spark.createDataFrame([(s,)], "stable_fraction double")


# ---- generators ------------------------------------------------------------

RMAT_SCALE = 10
RMAT_EF = 8


def q_gen_rmat_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form invariants of the deterministic RMAT draw (the overdraw-
    with-retry path guarantees EXACTLY n*edge_factor distinct undirected
    edges): edge count, handshake degree sum = 2m, id-range containment.
    The oracle is the literal expected row — the generator itself is
    Spark-side xxhash64, so invariants are what SQL can check."""
    from networkit_spark.sources.generators import rmat

    g = rmat(spark, scale=RMAT_SCALE, edge_factor=RMAT_EF, seed=42)
    n = 1 << RMAT_SCALE
    deg = g.degrees()
    return (
        deg.agg(
            F.sum("degree").alias("degree_sum"),
            F.count(F.lit(1)).alias("n_vertices"),
        )
        .crossJoin(
            g.edges.agg(
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
                F.sum(
                    (
                        (F.col("src") < 0)
                        | (F.col("src") >= n)
                        | (F.col("dst") < 0)
                        | (F.col("dst") >= n)
                    ).cast("long")
                ).alias("out_of_range"),
            )
        )
        .select(
            F.col("n_vertices").cast("bigint").alias("n_vertices"),
            F.col("n_edges"),
            F.col("degree_sum").cast("bigint").alias("degree_sum"),
            F.col("out_of_range").cast("bigint").alias("out_of_range"),
        )
    )


# ---- pipeline family ------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = L.load(spark, sf_dir, "documents")
    # Byte-based split planning under-partitions small-but-CPU-dense text
    # tables: a few-MB parquet lands under openCostInBytes and becomes ONE
    # task, serializing the n-gram/array kernels (measured 53s single-task
    # quality pass at sf0.1 on 32 cores -> ~3s spread). Only repartition UP
    # — at real corpus scale the scan already has >= parallelism splits and
    # this is a no-op, so no extra shuffle appears at 100 TB.
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        df = df.repartition(p, "doc_id")
    return df


def q_token_stats(spark, sf_dir):
    return textstats.token_stats(_docs(spark, sf_dir))


PACK_CAPACITY = 2048


def q_text_pack_sequences(spark, sf_dir):
    """Contiguous-fill sequence packing into PACK_CAPACITY-token training
    bins along a deterministic hash order (functions/textstats.py
    pack_sequences)."""
    return textstats.pack_sequences(_docs(spark, sf_dir), capacity=PACK_CAPACITY)


def q_quality(spark, sf_dir):
    return textstats.quality_score(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return textstats.fingerprint(_docs(spark, sf_dir))


def q_token_topk(spark, sf_dir):
    return textstats.token_topk(_docs(spark, sf_dir), k=20)


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def q_ngram_repetition(spark, sf_dir):
    return dedup.ngram_repetition(_docs(spark, sf_dir), n=2)


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination: docs with doc_id % 23 == 0 stand in for
    the benchmark corpus; every other doc is scored for 3-gram overlap."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    target = docs.filter(F.col("doc_id") % 23 != 0)
    return dedup.decontaminate(target, bench, n=3)


def q_stratified_sample(spark, sf_dir):
    """Language-rebalanced corpus sampling (hash-derandomized Bernoulli
    per stratum — the pretraining mixture-rate step)."""
    return textstats.stratified_sample(
        _docs(spark, sf_dir),
        rates=L.STRAT_RATES,
        default_rate=L.STRAT_DEFAULT_RATE,
        seed=L.STRAT_SEED,
    )


def q_quality_filter(spark, sf_dir):
    """Composed C4/Gopher-style document filter (length floor + n-gram
    repetition ceiling + diversity floor)."""
    return textstats.quality_filter(_docs(spark, sf_dir))


def q_pii_redact(spark, sf_dir):
    """PII scrub over the corpus. The synthetic documents carry no PII, so
    the gate row deterministically injects one email, one IPv4, and one
    phone per doc (pure exprs, replayed identically in the oracle) — the
    redaction counts and the redacted-text fingerprint then carry real
    signal."""
    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ping 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    return textstats.pii_redact(aug)


def q_pipeline_corpus(spark, sf_dir):
    """The flagship end-to-end training-data pipeline: quality filter ->
    exact dedup -> minhash-LSH canonical election -> eval-set
    decontamination (docs with doc_id % 23 == 0 stand in for the held-out
    benchmark) -> language-rebalanced stratified sample. Every stage is
    individually gate-checked; this row checks the COMPOSITION value-exact
    (functions/pipeline.py)."""
    from networkit_spark.functions.pipeline import pretrain_corpus

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % L.PIPE_BENCH_MOD != 0)
    bench = docs.filter(F.col("doc_id") % L.PIPE_BENCH_MOD == 0)
    return pretrain_corpus(
        corpus,
        bench,
        strat_rates=L.STRAT_RATES,
        strat_default_rate=L.STRAT_DEFAULT_RATE,
        seed=L.STRAT_SEED,
    )


def q_source_profile(spark, sf_dir):
    """Per-source corpus profile (doc/token counts, language spread,
    repetition, quality-filter keep rate) — the aggregation behind
    source-level filtering and mixture weighting."""
    return textstats.source_profile(_docs(spark, sf_dir))


LM_VOCAB, LM_ADD_K = 1000, 0.5
DSIR_K, DSIR_BUCKETS, DSIR_ADD_K = 40, 512, 0.5


def q_text_dsir(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023 — textstats.
    dsir_resample): hashed unigram+bigram bucket multinomials for
    target (lang='en') vs the raw pool, add-k log-ratio weights,
    derandomized Gumbel top-k over the pool."""
    return textstats.dsir_resample(
        _docs(spark, sf_dir),
        F.col("lang") == "en",
        k=DSIR_K,
        buckets=DSIR_BUCKETS,
        add_k=DSIR_ADD_K,
    )


def q_text_lm_score(spark, sf_dir):
    """Unigram-LM quality proxy (CCNet-style perplexity filter with the
    KenLM n-gram replaced by a corpus-trained unigram — textstats.
    lm_quality_score): top-LM_VOCAB vocabulary + one <unk> bucket, add-k
    smoothing, per-doc mean ln p(token)."""
    return textstats.lm_quality_score(
        _docs(spark, sf_dir), vocab_size=LM_VOCAB, add_k=LM_ADD_K
    )


def q_minhash_bands(spark, sf_dir):
    sh = dedup.shingles(_docs(spark, sf_dir))
    return dedup.minhash_bands(sh, num_hashes=16, bands=4)


def q_dedup_canonical(spark, sf_dir):
    """Canonical doc per near-dup cluster (minhash pairs -> pinned
    min-label components -> lexicographic-min representative)."""
    sh = dedup.shingles(_docs(spark, sf_dir))
    bands = dedup.minhash_bands(sh, num_hashes=16, bands=4)
    pairs = dedup.minhash_candidate_pairs(bands, max_bucket=50)
    return dedup.canonical_docs(pairs, rounds=4).orderBy("id")


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), bits=32)


def q_jaccard_pairs(spark, sf_dir):
    sh = dedup.shingles(_docs(spark, sf_dir))
    return dedup.jaccard_pairs(sh, threshold=0.5, max_shingle_freq=100)


def q_cosine_topk(spark, sf_dir):
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, query_ids=list(range(5)), k=10)


def q_lsh_ann(spark, sf_dir):
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.lsh_ann_topk(emb, query_ids=list(range(5)), k=3, nbits=8)


def q_multimodal_meta(spark, sf_dir):
    return decode_images(attach_binary(_docs(spark, sf_dir))).orderBy("doc_id")


def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = L.load(spark, sf_dir, "events").withColumn(
        # parquet yields TIMESTAMP_NTZ; session tz is UTC so the cast is exact
        "ts_utc", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev", F.lag("ts_utc").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev").isNull()
            | (F.unix_micros("ts_utc") - F.unix_micros("prev") > 1800 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.max("n").cast("bigint").alias("max_session_len"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


# ---- sparsification / correlation / matching / effective diameter --------


def q_graph_sparsify_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators import sparsification as sp

    from networkit_spark.plans.checkpoint import materialize

    g, _ = L.events_graph(spark, sf_dir)
    base = materialize(sp.tri_deg_base(g))  # triangle listing computed once
    rand = sp.random_edge_score(g, seed=42).withColumnRenamed("score", "rand_score")
    scan = sp.scan_similarity_score(g, base).withColumnRenamed("score", "scan_score")
    chance = sp.chance_corrected_triangle_score(g, base).withColumnRenamed(
        "score", "chance_score"
    )
    ld = sp.local_degree_score(g).withColumnRenamed("score", "local_degree")
    ls = sp.local_similarity_score(g, base).withColumnRenamed("score", "local_sim")
    so = sp.simmelian_overlap_score(g, max_rank=10, base=base).withColumnRenamed(
        "score", "simmelian"
    )
    keys = ["src", "dst"]
    return (
        rand.join(scan, keys)
        .join(chance, keys)
        .join(ld, keys)
        .join(ls, keys)
        .join(so, keys)
    )


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.correlation import (
        degree_assortativity,
        nominal_assortativity,
    )

    g, verts = L.events_graph(spark, sf_dir)
    # vertex TYPE (user vs event-type entity) is the graph's real nominal
    # attribute — the partition the reference's nominal mode is for
    labels = verts.select(
        "id",
        F.when(F.col("key").startswith("user:"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("label"),
    )
    dr = round(degree_assortativity(g), 6) + 0.0
    nr = round(nominal_assortativity(g, labels), 6) + 0.0
    return spark.createDataFrame(
        [(dr, nr)], "degree_assort double, nominal_assort double"
    )


def q_graph_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.matching import local_max_matching

    g, _ = L.events_graph(spark, sf_dir)
    return local_max_matching(g).select(
        "u", "v", F.col("weight").cast("double").alias("weight")
    )


def q_graph_suitor_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.matching import suitor_matching

    g, _ = L.events_graph(spark, sf_dir)
    return suitor_matching(g).select(
        "u", "v", F.col("weight").cast("double").alias("weight")
    )


def q_graph_biconnected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node biconnected-block count + articulation flag. The oracle
    recomputes both from first principles: v's blocks biject with the
    connected components of G - v that contain a neighbor of v."""
    from networkit_spark.operators.biconnected import biconnected_node_summary

    g, _ = L.events_graph(spark, sf_dir)
    return biconnected_node_summary(g).select("id", "n_comps", "is_articulation")


def _triangle_score_table(spark: SparkSession, sf_dir: str):
    from networkit_spark.operators.triangles import triangle_edge_scores

    g, _ = L.events_graph(spark, sf_dir)
    return triangle_edge_scores(g).select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("score").cast("double").alias("score"),
    )


def q_graph_edge_score_utils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-score combinators over the triangle edge scores: geometric
    mean, [0,1] normalization, multiscale-backbone probability."""
    from networkit_spark.operators.edgescores import (
        edge_score_normalizer,
        geometric_mean_score,
        multiscale_score,
    )

    sc = _triangle_score_table(spark, sf_dir)
    gm = geometric_mean_score(sc)
    nm = edge_score_normalizer(sc).select("u", "v", "norm_score")
    ms = multiscale_score(sc)
    return (
        sc.join(gm, ["u", "v"]).join(nm, ["u", "v"]).join(ms, ["u", "v"])
        .select(
            "u",
            "v",
            F.col("score").cast("bigint").alias("raw"),
            F.round("gm_score", 6).alias("gm_score"),
            F.round("norm_score", 6).alias("norm_score"),
            F.round("ms_score", 6).alias("ms_score"),
        )
    )


def q_graph_quadrangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge 4-cycle counts (ChibaNishizekiQuadrangleEdgeScore)."""
    from networkit_spark.operators.edgescores import quadrangle_edge_score

    g, _ = L.events_graph(spark, sf_dir)
    return quadrangle_edge_score(g)


def q_graph_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixJaccardScore over the triangle edge scores."""
    from networkit_spark.operators.edgescores import prefix_jaccard_score

    sc = _triangle_score_table(spark, sf_dir)
    return prefix_jaccard_score(sc).select(
        "u", "v", F.round("pj_score", 6).alias("pj_score")
    )


def q_centrality_electrical_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx electrical closeness via the shared JL Laplacian sketch
    (k=4, 30 Jacobi supersteps)."""
    from networkit_spark.operators.electrical import approx_electrical_closeness

    g, _ = L.events_graph(spark, sf_dir)
    return approx_electrical_closeness(
        g, num_systems=4, num_iters=30, omega=0.5, seed=42
    ).select("id", F.round("score", 6).alias("score"))


LINKPRED_TEST_PM, LINKPRED_EVAL_CAP, LINKPRED_TOPK = 300, LINKPRED_HINGE_CAP, 50
KATZ_BETA_IDX = 0.005


def q_linkpred_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout split + distance-2 candidates + common-neighbor scores +
    exact ROC-AUC / precision@k (linkprediction/ evaluation pipeline)."""
    from networkit_spark.operators.linkpred_eval import (
        candidate_scores,
        holdout_split,
        roc_auc_summary,
    )

    g, _ = L.events_graph(spark, sf_dir)
    train, test = holdout_split(g, test_per_mille=LINKPRED_TEST_PM)
    preds = candidate_scores(train, max_hinge_degree=LINKPRED_EVAL_CAP)
    return roc_auc_summary(preds, test, train, k=LINKPRED_TOPK)


def q_linkpred_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KatzIndex (maxPathLength=3) damped walk counts on the holdout
    distance-2 candidate pairs."""
    from networkit_spark.operators.linkpred_eval import (
        candidate_scores,
        holdout_split,
        katz_scores,
    )

    g, _ = L.events_graph(spark, sf_dir)
    train, _test = holdout_split(g, test_per_mille=LINKPRED_TEST_PM)
    cand = candidate_scores(train, max_hinge_degree=LINKPRED_EVAL_CAP)
    # walks2/walks3 are the exact-integer invariant; the damped score is
    # rounded to 6dp on both engine and oracle sides because Spark and DuckDB
    # fold the beta^2*w2 + beta^3*w3 double chain in different orders (sub-1e-9
    # disagreement that still flips the driver's exact value hash).
    return katz_scores(train, cand, beta=KATZ_BETA_IDX).select(
        "u", "v", "walks2", "walks3", F.round("score", 6).alias("score")
    )


def q_graph_score_linearize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EdgeScoreLinearizer over the triangle edge scores: rank/(m-1) under
    (score, md5 tiebreak), plus the inverse ordering."""
    from networkit_spark.operators.edgescores import edge_score_linearizer

    sc = _triangle_score_table(spark, sf_dir)
    fwd = edge_score_linearizer(sc, inverse=False)
    inv = edge_score_linearizer(sc, inverse=True).withColumnRenamed(
        "lin_score", "lin_inv"
    )
    return (
        sc.join(fwd, ["u", "v"]).join(inv, ["u", "v"])
        .select(
            "u",
            "v",
            F.col("score").cast("bigint").alias("raw"),
            F.round("lin_score", 6).alias("lin_score"),
            F.round("lin_inv", 6).alias("lin_inv"),
        )
    )


def q_linkpred_indices_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the predictor family — NeighborhoodDistance,
    AdjustedRand (reference set_union quirk reproduced), U/VDegree,
    NeighborsMeasure (cn + 3-path count), SameCommunity over hash-min CC
    labels — one candidate-set pass."""
    from networkit_spark.operators.linkprediction import (
        extended_link_prediction_scores,
        same_community_index,
    )

    g, _ = L.events_graph(spark, sf_dir)
    s = extended_link_prediction_scores(g, max_hinge_degree=LINKPRED_HINGE_CAP)
    cc = connected_components(g, max_iterations=CC_ITERS).select("id", "label")
    return same_community_index(s, cc).select(
        "u", "v", "cn",
        F.round("nd", 6).alias("nd"),
        F.round("ari", 6).alias("ari"),
        "u_deg", "v_deg", "nm", "sc",
    )


def q_graph_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.mis import maximal_independent_set

    g, _ = L.events_graph(spark, sf_dir)
    return maximal_independent_set(g, seed=42)


def q_graph_neighborhood_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.anf import neighborhood_function_approx

    g, _ = L.events_graph(spark, sf_dir)
    return neighborhood_function_approx(g, k=4, r=7, seed=42, max_h=8)


def q_graph_effective_diameter_fm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.anf import effective_diameter_approx

    g, _ = L.events_graph(spark, sf_dir)
    return effective_diameter_approx(g, ratio=0.9, k=4, r=7, seed=42, max_h=8)


def q_scd_pagerank_nibble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.scd import pagerank_nibble

    g, _ = L.events_graph(spark, sf_dir)
    return pagerank_nibble(g, seeds=[0], alpha=0.15, eps=0.0, max_rounds=8)


def q_sim_seir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.epidemic import seir_simulation

    g, _ = L.events_graph(spark, sf_dir)
    return seir_simulation(g, zero=0, t_max=8, trans_p=0.5, e_time=2, i_time=7, seed=42)


def q_centrality_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import laplacian_centrality
    import pyspark.sql.functions as F

    g, _ = L.events_graph(spark, sf_dir)
    return laplacian_centrality(g, normalized=True).select(
        "id", F.round("score", 6).alias("score")
    )


def q_centrality_sfigality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.centrality import sfigality
    import pyspark.sql.functions as F

    g, _ = L.events_graph(spark, sf_dir)
    return sfigality(g).select("id", F.round("score", 6).alias("score"))


def q_embed_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.node2vec import biased_random_walks

    g, _ = L.events_graph(spark, sf_dir)
    w = biased_random_walks(g, p=4.0, q=0.25, walk_length=5, walks_per_node=1, seed=42)
    return w.select(
        F.col("walk_id").cast("bigint").alias("walk_id"),
        F.col("step").cast("int").alias("step"),
        F.col("node").cast("bigint").alias("node"),
    )


def q_embed_sgns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node2vec walks -> synchronous mean-gradient SGNS embeddings
    (embedding/LearnEmbedding.cpp role; deviations + bit-exact grid
    protocol documented in operators/sgns.py)."""
    from networkit_spark.operators.node2vec import biased_random_walks
    from networkit_spark.operators.sgns import train_sgns

    g, _ = L.events_graph(spark, sf_dir)
    w = biased_random_walks(g, p=4.0, q=0.25, walk_length=5, walks_per_node=2, seed=42)
    emb = train_sgns(
        w, g.vertices, dim=8, window=2, negatives=2, lr=4.0, epochs=3, seed=42
    )
    return emb.select(
        F.col("id").cast("bigint").alias("id"),
        *[
            (F.round(F.col("emb")[j], 6) + F.lit(0.0)).alias(f"e{j}")
            for j in range(8)
        ],
    ).orderBy("id")


def q_graph_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.spanning import max_spanning_forest

    g, _ = L.events_graph(spark, sf_dir)
    return max_spanning_forest(g).select(
        F.col("u").cast("bigint").alias("u"),
        F.col("v").cast("bigint").alias("v"),
        F.col("weight").cast("double").alias("weight"),
    )


def q_graph_umsf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of all maximum spanning forests (deferred-merge descending
    Kruskal's cut rule, UnionMaximumSpanningForest.cpp:46-80) as per-edge
    membership flags."""
    from networkit_spark.operators.spanning import union_max_spanning_forest

    g, _ = L.events_graph(spark, sf_dir)
    return union_max_spanning_forest(g).select(
        F.col("u").cast("bigint").alias("u"),
        F.col("v").cast("bigint").alias("v"),
        F.col("weight").cast("double").alias("weight"),
        "in_umsf",
    ).orderBy("u", "v")


def q_community_hash_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed overlap (HashingOverlapper.cpp k==2 path) of the LP and CC
    partitions, cells canonicalized to min member id."""
    from networkit_spark.operators.overlap import hashing_overlapper

    g, _ = L.events_graph(spark, sf_dir)
    lp = label_propagation(g, theta=-1, max_iterations=LP_ITERS).select("id", "label")
    cc = connected_components(g, max_iterations=CC_ITERS).select("id", "label")
    return hashing_overlapper(g.vertices, [lp, cc]).orderBy("id")


def q_graph_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit script from the even-event_id snapshot graph to the full graph,
    both mapped through the SAME dense-id dictionary. Filtering events
    rewires lag() transitions, so the snapshot has edges the full graph
    lacks and vice versa — the diff exercises ADD, REMOVE and
    WEIGHT_UPDATE together."""
    from networkit_spark.graph import Graph
    from networkit_spark.streaming.graph_events import graph_difference

    g2, verts = L.events_graph(spark, sf_dir)
    pairs1 = L.events_edge_keys(
        L.load(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    )
    da = verts.withColumnRenamed("key", "src_key").withColumnRenamed("id", "src")
    db = verts.withColumnRenamed("key", "dst_key").withColumnRenamed("id", "dst")
    half1 = (
        pairs1.join(da, "src_key")
        .join(db, "dst_key")
        .select("src", "dst", F.col("weight").cast("float").alias("weight"))
    )
    sym1 = half1.unionByName(
        half1.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    g1 = Graph(g2.vertices, sym1, directed=False, weighted=True)
    return graph_difference(g1, g2).select(
        "etype",
        F.col("u").cast("bigint").alias("u"),
        F.col("v").cast("bigint").alias("v"),
        F.col("w").cast("double").alias("w"),
    )


def q_graph_randomize_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant-style oracle (like gen_rmat_invariants): edge switching
    must preserve the unweighted non-loop degree histogram EXACTLY, so the
    oracle computes the histogram of the ORIGINAL graph in SQL while Spark
    computes it over the switched graph."""
    from networkit_spark.operators.randomization import edge_switching

    g, _ = L.events_graph(spark, sf_dir)
    r = edge_switching(g, rounds=3, seed=42)
    return (
        r.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            F.col("deg").cast("bigint").alias("degree"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
        )
    )


def q_graph_wilson_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant-style oracle (like graph_randomize_invariants): ANY
    uniform spanning forest has n - #components edges drawn from the
    graph and spans every component, whatever the seed — the SQL side
    computes those quantities from the graph alone while Spark checks
    them on the Wilson sample (centrality/ApproxSpanningEdge.cpp:43-110
    sampleUST)."""
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.spanning import wilson_spanning_forest
    from networkit_spark.graph import Graph

    g, _ = L.events_graph(spark, sf_dir)
    f = wilson_spanning_forest(g, seed=42)
    n_edges = f.count()
    canon = g.edges.select("src", "dst").distinct()
    bad = f.join(canon, ["src", "dst"], "anti").count()
    fg = Graph(
        g.vertices,
        f.unionByName(
            f.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).withColumn("weight", F.lit(1.0).cast("float")),
        False,
        False,
    )
    ncomp = connected_components(fg).select("label").distinct().count()
    return spark.createDataFrame(
        [(n_edges, bad, ncomp)],
        "n_edges bigint, bad_edges bigint, n_components bigint",
    )


def q_graph_global_curveball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant-style oracle (like graph_randomize_invariants): global
    curveball trades preserve the unweighted non-loop degree histogram
    EXACTLY (every accepted trade re-deals |pool| arcs with per-member
    counts fixed; reverts keep state), so the oracle computes the
    histogram of the ORIGINAL graph in SQL while Spark computes it over
    the traded graph."""
    from networkit_spark.operators.randomization import global_curveball

    g, _ = L.events_graph(spark, sf_dir)
    r = global_curveball(g, rounds=3, seed=42)
    return (
        r.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .select(
            F.col("deg").cast("bigint").alias("degree"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
        )
    )


CTD_PAIRS = [(0, 1), (0, 2), (1, 3)]
CTD_ITERS, CTD_OMEGA = 30, 0.5


def q_graph_commute_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.electrical import commute_time_distance

    g, _ = L.events_graph(spark, sf_dir)
    out = commute_time_distance(g, CTD_PAIRS, num_iters=CTD_ITERS, omega=CTD_OMEGA)
    return out.select("u", "v", F.round("ctd", 6).alias("ctd"))


GROUP_CLOSENESS_K = 4


def q_centrality_group_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groups import group_closeness

    g, _ = L.events_graph(spark, sf_dir)
    return group_closeness(g, k=GROUP_CLOSENESS_K)


def q_centrality_group_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy group-harmonic-closeness picks with cumulative score."""
    from networkit_spark.operators.groups import group_harmonic_closeness

    g, _ = L.events_graph(spark, sf_dir)
    return group_harmonic_closeness(g, k=GROUP_CLOSENESS_K).select(
        "rank", "id", F.round("score", 6).alias("score")
    )


GEDWALK_K, GEDWALK_ALPHA, GEDWALK_LEVELS, GEDWALK_POOL = 3, 0.1, 4, 6


SWAPS_K, SWAPS_ROUNDS = 4, 3


def q_centrality_group_swaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grow-shrink local swaps refining an md5-ranked (effectively
    random) initial group: one best strictly-improving swap per round."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.operators.groups import group_closeness_local_swaps

    g, _ = L.events_graph(spark, sf_dir)
    h = F.expr(md5_long_sql("('42:gsw:' || CAST(id AS STRING))"))
    # distributed top-k (TakeOrderedAndProject), not a global window rank
    group = [
        int(r["id"])
        for r in g.vertices.select("id", h.alias("_h"))
        .orderBy("_h", "id")
        .limit(SWAPS_K)
        .collect()
    ]
    return group_closeness_local_swaps(
        g, group, max_rounds=SWAPS_ROUNDS
    ).orderBy("round")


def q_centrality_gedwalk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy GedWalk group (pinned 4-level truncation, top-6-degree
    candidate pool) with cumulative GED score per pick."""
    from networkit_spark.operators.groups import ged_walk_group

    g, _ = L.events_graph(spark, sf_dir)
    return ged_walk_group(
        g,
        k=GEDWALK_K,
        alpha=GEDWALK_ALPHA,
        levels=GEDWALK_LEVELS,
        pool_size=GEDWALK_POOL,
    ).select("rank", "id", F.round("ged_score", 6).alias("ged_score"))


MAXFLOW_K, MAXFLOW_S, MAXFLOW_T = 16, 0, 1


def q_graph_maxflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edmonds-Karp on the K lowest-id vertices' induced subgraph (the
    alphabetically-first event-type hubs); the oracle enumerates all 2^K
    s-t cuts — max-flow/min-cut duality makes the two sides genuinely
    independent algorithms."""
    from networkit_spark.operators.flow import edmonds_karp

    g, _ = L.events_graph(spark, sf_dir)
    sub = g.subgraph_from_nodes(g.vertices.filter(F.col("id") < MAXFLOW_K))
    value, source_set = edmonds_karp(sub, MAXFLOW_S, MAXFLOW_T)
    n = source_set.count()
    return spark.createDataFrame(
        [(float(value), int(n))], "max_flow double, source_set_size bigint"
    )


def q_graph_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.reachability import exact_reachable_nodes

    g, _ = L.events_digraph(spark, sf_dir)
    return exact_reachable_nodes(g).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("reachable").cast("bigint").alias("reachable"),
    )


SP_SOURCE, SP_TARGET, SP_CUTOFF = 0, 1, 4
AD_SYSTEMS, AD_ITERS, AD_OMEGA, AD_NORM = 4, 3, 0.5, 2


def q_graph_simple_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.reachability import all_simple_paths

    g, _ = L.events_digraph(spark, sf_dir)
    p = all_simple_paths(g, SP_SOURCE, SP_TARGET, SP_CUTOFF)
    return p.select(
        F.array_join(F.col("path"), ",").alias("path"),
        (F.size("path") - 1).cast("bigint").alias("hops"),
    )


def q_graph_algdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.algebraic import algebraic_distance_edge_scores

    g, _ = L.events_graph(spark, sf_dir)
    s = algebraic_distance_edge_scores(
        g, num_systems=AD_SYSTEMS, num_iters=AD_ITERS, omega=AD_OMEGA, norm=AD_NORM
    )
    return s.select("src", "dst", F.round("ad", 6).alias("ad"))


def q_graph_edge_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.sparsification import (
        adamic_adar_distance_score,
        jaccard_distance_score,
        tri_deg_base,
    )

    g, _ = L.events_graph(spark, sf_dir)
    jd = jaccard_distance_score(g).select("src", "dst", F.round("jd", 6).alias("jd"))
    aa = adamic_adar_distance_score(g).select(
        "src", "dst", F.round("aa_dist", 6).alias("aa_dist")
    )
    return jd.join(aa, ["src", "dst"], "left")


GROUP_DEGREE_K = 4


def q_centrality_group_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.groups import group_degree

    g, _ = L.events_graph(spark, sf_dir)
    return group_degree(g, k=GROUP_DEGREE_K).select(
        F.col("rank").cast("bigint").alias("rank"),
        F.col("id").cast("bigint").alias("id"),
        F.col("gain").cast("bigint").alias("gain"),
    )


def q_graph_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.clique import maximal_cliques

    g, _ = L.events_graph(spark, sf_dir)
    return maximal_cliques(g).select(
        F.array_join(F.col("members"), ",").alias("clique"),
        F.size("members").cast("bigint").alias("size"),
    )


def q_scd_clique_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective community detection by cliques: the largest maximal
    clique containing each vertex (CliqueDetect.cpp)."""
    from networkit_spark.operators.clique import clique_detect

    g, _ = L.events_graph(spark, sf_dir)
    return (
        clique_detect(g)
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.size("members").cast("bigint").alias("size"),
            F.array_join(F.col("members"), ",").alias("clique"),
        )
        .orderBy("seed")
    )


def q_centrality_kpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-path centrality: 64 hash-derandomized self-avoiding walks,
    max length 4."""
    from networkit_spark.operators.kpath import kpath_centrality

    g, _ = L.events_graph(spark, sf_dir)
    return (
        kpath_centrality(g, k=4, num_walks=64, seed=42)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("id")
    )


def q_scd_gce_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GCE under the boundary-normalized objective L, pinned seeds/steps."""
    from networkit_spark.operators.scd import gce

    g, _ = L.events_graph(spark, sf_dir)
    return (
        gce(g, GCE_SEEDS, max_steps=GCE_STEPS, pinned=True, objective="L")
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.col("node").cast("bigint").alias("node"),
        )
        .orderBy("seed", "node")
    )


def q_scd_ground_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best Jaccard/F1/precision/recall of each pinned-seed GCE community
    against the 1-sweep LP partition viewed as ground truth."""
    from networkit_spark.operators.scd import gce, scd_ground_truth_comparison

    g, _ = L.events_graph(spark, sf_dir)
    found = gce(g, GCE_SEEDS, max_steps=GCE_STEPS, pinned=True)
    truth = label_propagation(g, theta=-1, max_iterations=1).select(
        "id", F.col("label").alias("subset")
    )
    return (
        scd_ground_truth_comparison(found, truth)
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.round("jaccard", 6).alias("jaccard"),
            F.round("f1", 6).alias("f1"),
            F.round("precision", 6).alias("precision"),
            F.round("recall", 6).alias("recall"),
        )
        .orderBy("seed")
    )


def q_community_map_equation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-equation (Infomap objective) synchronous local moving,
    4 pinned sweeps from singletons."""
    from networkit_spark.operators.mapequation import louvain_map_equation

    g, _ = L.events_graph(spark, sf_dir)
    return (
        louvain_map_equation(g, max_sweeps=4, pinned=True)
        .select(
            F.col("id").cast("bigint").alias("id"),
            F.col("label").cast("bigint").alias("label"),
        )
        .orderBy("id")
    )


GCE_SEEDS = [0, 1, 2, 3, 4, 5]
GCE_STEPS = 5


def q_scd_gce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy Community Expansion (objective M) from six pinned seeds,
    five pinned greedy steps."""
    from networkit_spark.operators.scd import gce

    g, _ = L.events_graph(spark, sf_dir)
    return (
        gce(g, GCE_SEEDS, max_steps=GCE_STEPS, pinned=True)
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.col("node").cast("bigint").alias("node"),
        )
        .orderBy("seed", "node")
    )


def q_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import eccentricity

    g, _ = L.events_graph(spark, sf_dir)
    return eccentricity(g).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("ecc").cast("bigint").alias("ecc"),
        F.col("farthest").cast("bigint").alias("farthest"),
    )


SPSP_SOURCES = [0, 1, 2, 3, 4, 5, 6, 7]


def q_graph_spsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import spsp

    g, _ = L.events_graph(spark, sf_dir)
    return spsp(g, SPSP_SOURCES).select(
        F.col("s").cast("bigint").alias("s"),
        F.col("t").cast("bigint").alias("t"),
        F.col("dist").cast("bigint").alias("dist"),
    )


VOLUME_RS = [1.0, 2.0, 4.0]


def q_graph_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import volume

    g, _ = L.events_graph(spark, sf_dir)
    return volume(g, VOLUME_RS, samples=25, seed=42).select(
        F.col("r").cast("double").alias("r"),
        F.round("volume", 6).alias("volume"),
    )


def q_centrality_top_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import top_closeness

    g, _ = L.events_graph(spark, sf_dir)
    return top_closeness(g, k=10)


def q_graph_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from networkit_spark.operators.distance import effective_diameter

    g, _ = L.events_graph(spark, sf_dir)
    d = effective_diameter(g, ratio=0.9)
    return spark.createDataFrame([(d,)], "eff_diameter bigint")


def q_embed_near_dup(spark, sf_dir):
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.embed_near_dup_pairs(emb, threshold=0.2, nbits=8, n_tables=2)


def q_embed_ivf_ann(spark, sf_dir):
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.ivf_ann_topk(
        emb, query_ids=list(range(5)), k=3, n_cells=8, nprobe=2
    )


SEMDEDUP_CELLS, SEMDEDUP_EPS, SEMDEDUP_MAX_CELL = 8, 0.35, 200


def q_dedup_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (similarity.semdedup): cluster-scoped
    cosine pruning over the embedding table, farthest-from-centroid
    survivor per duplicate group (Abbas et al. 2023)."""
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.semdedup(
        emb, n_cells=SEMDEDUP_CELLS, eps=SEMDEDUP_EPS, max_cell=SEMDEDUP_MAX_CELL
    )


CLUSTER_SAMPLE_CELLS, CLUSTER_SAMPLE_CAP = 8, 30


def q_embed_cluster_sample(spark, sf_dir):
    """Cluster-balanced subset selection (similarity.cluster_balanced_sample):
    nearest-centroid assignment via the IVF quantizer, then at most ``cap``
    members kept per cluster in derandomized md5 order (the D4-style
    cluster-budget curation step)."""
    emb = L.load(spark, sf_dir, "embeddings")
    return similarity.cluster_balanced_sample(
        emb, n_cells=CLUSTER_SAMPLE_CELLS, cap=CLUSTER_SAMPLE_CAP
    )


def q_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-data tier (operators.profile.profile_distributions): the
    vectors behind the reference's plot/profiling module — degree
    distribution, component-size distribution, mean LCC per degree —
    as one (kind, x, y) table (networkit/plot.py:39-95)."""
    from networkit_spark.operators.profile import profile_distributions

    g, _ = L.events_graph(spark, sf_dir)
    return profile_distributions(g, cc_iters=CC_ITERS)


HASHED_FEATURES_DIM = 64


def q_text_hashed_features(spark, sf_dir):
    """Signed feature hashing (textstats.hashed_doc_features): model-free
    sparse document vectors — md5 bucket % dim with an independent parity
    sign, integer signed counts per (doc, bucket) — feeding the
    embedding-space curation operators without a learned encoder."""
    return textstats.hashed_doc_features(
        _docs(spark, sf_dir), dim=HASHED_FEATURES_DIM
    )


SPAN_DEDUP_N, SPAN_DEDUP_THRESHOLD = 3, 0.65
MIXING_TARGET = 200


def q_text_source_mixing(spark, sf_dir):
    """Temperature-weighted source mixing (textstats.source_mixing):
    sqrt-weighted per-source take rates + derandomized md5 Bernoulli
    sampled counts (GPT-3/Pile corpus-mixture step)."""
    return textstats.source_mixing(_docs(spark, sf_dir), target=MIXING_TARGET)


def q_text_span_dedup(spark, sf_dir):
    """Cross-document duplicated-span filter (dedup.span_dedup): fraction
    of each doc's distinct word n-grams shared with any OTHER document,
    keep=false above the threshold (C4 repeated-span tier)."""
    return dedup.span_dedup(
        _docs(spark, sf_dir), n=SPAN_DEDUP_N, threshold=SPAN_DEDUP_THRESHOLD
    )


def q_profile_rank_correlation(spark, sf_dir):
    """Profiling stat-table tier (profiling/stat.py Correlation): pairwise
    covariance / Pearson / Spearman / Fechner between the degree, weighted-
    degree and PageRank score vectors of the events graph."""
    from networkit_spark.operators.profile import rank_correlation

    g, _ = L.events_graph(spark, sf_dir)
    deg = g.degrees()
    pr = pagerank(g, damp=0.85, tol=0.0, max_iterations=PR_ITERS).select(
        "id", F.round("score", 6).alias("score")
    )
    m = (
        deg.select(
            "id",
            F.lit("degree").alias("measure"),
            F.col("degree").cast("double").alias("x"),
        )
        .unionByName(
            pr.select("id", F.lit("pagerank").alias("measure"), F.col("score").alias("x"))
        )
        .unionByName(
            deg.select(
                "id",
                F.lit("wdeg").alias("measure"),
                F.col("wdeg").cast("double").alias("x"),
            )
        )
    )
    return rank_correlation(m)


def q_graph_algebraic_sssp(spark, sf_dir):
    """AlgebraicBellmanFord (algebraic/algorithms/AlgebraicBellmanFord.hpp)
    via the GraphBLAS semiring layer: MinPlus MxV relaxations pinned to
    SSSP_ITERS — the same fixpoint (and oracle) as the native
    sssp_weighted, reached through the algebraic surface."""
    from networkit_spark.operators.graphblas import algebraic_bellman_ford

    g, _ = L.events_graph(spark, sf_dir)
    d, _ = algebraic_bellman_ford(
        g, source=0, relaxations=SSSP_ITERS, detect_negative_cycle=False
    )
    return d.filter(F.col("dist") != float("inf")).select(
        "id", F.round("dist", 6).alias("dist")
    )


QCLS_POSITIVES = ("src0", "src1", "src2", "src3", "src4")
QCLS_DIM = 64
QCLS_LR = 4.0
QCLS_EPOCHS = 3


def q_text_quality_classifier(spark, sf_dir):
    """GPT-3 quality-classifier curation step (textstats.quality_classifier):
    logistic regression on signed hashed features with weak source labels,
    dyadic-grid deterministic training, Pareto keep rule."""
    return textstats.quality_classifier(
        _docs(spark, sf_dir),
        positive_sources=list(QCLS_POSITIVES),
        dim=QCLS_DIM,
        lr=QCLS_LR,
        epochs=QCLS_EPOCHS,
        seed=42,
    )


# ---- registry -------------------------------------------------------------

# Driver-gate rotation (VERDICT r2 task 1): the driver's correctness gate
# checks the FIRST ~50 keys in insertion order.  The dict below is written in
# registration blocks for readability; the reorder AFTER the dict moves every
# query that has never been value-hash-green in a prior CORRECTNESS_r*.json
# to the front (preserving relative order), so newly registered queries land
# inside the gate window automatically.  Everything is additionally
# full-sweep-verified by tools/check_correctness.py
# (tests/test_entry_contract.py runs a sample and guards the rotation).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ---- block 1: new or re-oracled in r3 (never checked by driver OR
    # judge — highest gate priority) ----------------------------------------
    "graph_plm": q_graph_plm,
    "graph_suitor_matching": q_graph_suitor_matching,
    "graph_biconnected": q_graph_biconnected,
    "linkpred_eval": q_linkpred_eval,
    "linkpred_katz": q_linkpred_katz,
    "linkpred_indices_ext": q_linkpred_indices_ext,
    "graph_edge_score_utils": q_graph_edge_score_utils,
    "graph_prefix_jaccard": q_graph_prefix_jaccard,
    "centrality_electrical_closeness": q_centrality_electrical_closeness,
    "graph_quadrangles": q_graph_quadrangles,
    "graph_score_linearize": q_graph_score_linearize,
    "text_ngram_repetition": q_ngram_repetition,
    "text_decontaminate": q_decontaminate,
    "text_sample_stratified": q_stratified_sample,
    "text_quality_filter": q_quality_filter,
    "text_source_profile": q_source_profile,
    "text_pii_redact": q_pii_redact,
    "pipeline_pretrain_corpus": q_pipeline_corpus,
    "graph_umsf": q_graph_umsf,
    "community_hash_overlap": q_community_hash_overlap,
    "community_clustering_tools": q_community_clustering_tools,
    "graph_sparsify_ratio": q_graph_sparsify_ratio,
    "graph_bfs_sample": q_graph_bfs_sample,
    "graph_degree_gini": q_graph_degree_gini,
    "graph_spectral_bisection": q_graph_spectral_bisection,
    "viz_pivot_mds": q_viz_pivot_mds,
    "text_pack_sequences": q_text_pack_sequences,
    # ---- block 2: registered in r2, judge-verified but never driver-checked
    "community_conductance": q_community_conductance,
    "community_stability": q_community_stability,
    "gen_rmat_invariants": q_gen_rmat_invariants,
    "graph_sparsify_scores": q_graph_sparsify_scores,
    "graph_assortativity": q_graph_assortativity,
    "graph_matching": q_graph_matching,
    "graph_effective_diameter": q_graph_effective_diameter,
    "centrality_top_closeness": q_centrality_top_closeness,
    "graph_mis": q_graph_mis,
    "graph_neighborhood_function": q_graph_neighborhood_function,
    "graph_effective_diameter_fm": q_graph_effective_diameter_fm,
    "scd_pagerank_nibble": q_scd_pagerank_nibble,
    "sim_seir": q_sim_seir,
    "centrality_laplacian": q_centrality_laplacian,
    "centrality_sfigality": q_centrality_sfigality,
    "embed_node2vec_walks": q_embed_node2vec_walks,
    "embed_sgns": q_embed_sgns,
    "graph_msf": q_graph_msf,
    "graph_maxflow": q_graph_maxflow,
    "graph_diff": q_graph_diff,
    "graph_randomize_invariants": q_graph_randomize_invariants,
    "graph_wilson_forest": q_graph_wilson_forest,
    "graph_global_curveball": q_graph_global_curveball,
    "graph_commute_time": q_graph_commute_time,
    "centrality_group_closeness": q_centrality_group_closeness,
    "centrality_group_harmonic": q_centrality_group_harmonic,
    "centrality_gedwalk": q_centrality_gedwalk,
    "centrality_group_swaps": q_centrality_group_swaps,
    "graph_reachable": q_graph_reachable,
    "graph_cliques": q_graph_cliques,
    "scd_clique_detect": q_scd_clique_detect,
    "scd_gce": q_scd_gce,
    "scd_ground_truth": q_scd_ground_truth,
    "scd_gce_l": q_scd_gce_l,
    "community_map_equation": q_community_map_equation,
    "centrality_kpath": q_centrality_kpath,
    "centrality_group_degree": q_centrality_group_degree,
    "graph_edge_distances": q_graph_edge_distances,
    "graph_simple_paths": q_graph_simple_paths,
    "graph_algdist": q_graph_algdist,
    "graph_eccentricity": q_graph_eccentricity,
    "graph_spsp": q_graph_spsp,
    "graph_volume": q_graph_volume,
    "dedup_embed_pairs": q_embed_near_dup,
    "embed_ivf_ann": q_embed_ivf_ann,
    "dedup_semdedup": q_dedup_semdedup,
    "embed_cluster_sample": q_embed_cluster_sample,
    "text_hashed_features": q_text_hashed_features,
    "graph_profile_distributions": q_graph_profile,
    "profile_rank_correlation": q_profile_rank_correlation,
    "graph_algebraic_sssp": q_graph_algebraic_sssp,
    "text_quality_classifier": q_text_quality_classifier,
    "text_span_dedup": q_text_span_dedup,
    "text_source_mixing": q_text_source_mixing,
    "graph_neighborhood_heuristic": q_graph_neighborhood_heuristic,
    "text_token_stats": q_token_stats,
    "text_quality": q_quality,
    "text_lang_id": q_lang_id,
    "text_fingerprint": q_fingerprint,
    "text_token_topk": q_token_topk,
    "text_lm_score": q_text_lm_score,
    "text_dsir_resample": q_text_dsir,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_bands": q_minhash_bands,
    "dedup_canonical": q_dedup_canonical,
    "dedup_simhash": q_simhash,
    "dedup_jaccard_pairs": q_jaccard_pairs,
    "embed_cosine_topk": q_cosine_topk,
    "embed_lsh_ann": q_lsh_ann,
    "multimodal_decode_meta": q_multimodal_meta,
    "events_sessionize": q_sessionize,
    # ---- block 3: hash-green in CORRECTNESS_r02.json ----------------------
    "graph_edges": q_graph_edges,
    "graph_degrees": q_graph_degrees,
    "graph_pagerank": q_graph_pagerank,
    "graph_components": q_graph_components,
    "graph_labelprop": q_graph_labelprop,
    "graph_triangles_per_node": q_graph_triangles,
    "graph_triangle_count": q_graph_triangle_global,
    "graph_lcc": q_graph_lcc,
    "graph_transitivity": q_graph_transitivity,
    "graph_transitivity_approx": q_graph_transitivity_approx,
    "graph_triangle_edge_scores": q_graph_triangle_edge_scores,
    "graph_top_entities": q_graph_top_entities,
    "graph_coarsen_by_community": q_graph_coarsen,
    "graph_modularity_lp": q_graph_modularity,
    "graph_pagerank_csr": q_graph_pagerank_csr,
    "graph_components_csr": q_graph_components_csr,
    "graph_labelprop_csr": q_graph_labelprop_csr,
    "centrality_degree": q_centrality_degree,
    "centrality_eigenvector": q_centrality_eigenvector,
    "centrality_katz": q_centrality_katz,
    "centrality_betweenness": q_centrality_betweenness,
    "centrality_harmonic": q_centrality_harmonic,
    "centrality_closeness": q_centrality_closeness,
    "graph_diameter": q_graph_diameter,
    "graph_sample_nodes": q_graph_sample_nodes,
    "graph_sample_edges": q_graph_sample_edges,
    "graph_scc": q_graph_scc,
    "graph_digraph_edges": q_graph_digraph_edges,
    "graph_bfs": q_graph_bfs,
    "graph_sssp": q_graph_sssp,
    "graph_core_decomposition": q_graph_core_decomposition,
    "graph_linkpred": q_graph_linkpred,
    "graph_plm_pinned": q_graph_plm_pinned,
    "community_measures": q_community_measures,
    "centrality_permanence": q_centrality_permanence,
    "centrality_spanning_edge": q_centrality_spanning_edge,
    "centrality_local_coverage": q_centrality_local_coverage,
    "centrality_closeness_sampled": q_centrality_closeness_sampled,
    "centrality_betweenness_rk": q_centrality_betweenness_rk,
    "community_partition_eval": q_community_partition_eval,
    "community_adjusted_rand": q_community_adjusted_rand,
    "community_graph_rand": q_community_graph_rand,
    "community_sampled_rand": q_community_sampled_rand,
    "community_cover_hub_dominance": q_community_cover_hub_dominance,
    "community_fragmentation": q_community_fragmentation,
    "community_overlapping_nmi": q_community_overlapping_nmi,
    "community_cover_f1": q_community_cover_f1,
    "community_coverage": q_community_coverage,
    "community_edgecut": q_community_edgecut,
}

# ---- driver-gate rotation v2 (VERDICT r4 task 1) --------------------------
# The gate checks the FIRST ~50 keys in insertion order.  The ordering is
# derived from the driver's own published artifacts (CORRECTNESS_r*.json at
# the repo root), so it never needs hand-bookkeeping:
#   tier 0 — never value-hash-green in any artifact (new registrations),
#   tier 1 — green only BEFORE a round that changed the query's semantics
#            (_SEMANTICS_CHANGED below: the one hand-maintained piece — add
#            `name: round` whenever a commit changes what a query computes
#            or its oracle, so stale greens get driver-re-verified),
#   tier 2 — everything else, oldest-checked round first,
# each tier ordered by (last-green round ascending, registration order).


def _artifact_green_rounds() -> dict[str, int]:
    """Query name -> latest driver round whose published CORRECTNESS_r*.json
    recorded hash_match=true (absent = never green)."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    rounds: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                rounds[name] = max(rounds.get(name, 0), int(m.group(1)))
    return rounds


# Semantics changes that can postdate a green check.  Commit 03c528c (r4)
# made label-propagation self-loops weighted (PLP.cpp:83-86), made
# stable_partition_fraction strict-dominance (StablePartitionNodes.cpp:42-70)
# and pipelined pii_redact counts — and changed the matching DuckDB oracles
# in the same commit — so every query consuming those paths needs a driver
# check from round >= 4 before its green is trustworthy.  Entries whose last
# green round is already >= the changed round fall through to tier 2
# automatically (e.g. text_pii_redact, scd_ground_truth, text_span_dedup and
# community_hash_overlap were re-checked inside the r4 window).
_SEMANTICS_CHANGED: dict[str, int] = {
    name: 4
    for name in (
        # direct: label_propagation / stable_partition_fraction / pii_redact
        "graph_labelprop", "graph_labelprop_csr", "community_stability",
        "text_pii_redact",
        # LP-derived partitions feed all of these
        "graph_modularity_lp", "graph_coarsen_by_community",
        "community_conductance", "community_coverage", "community_edgecut",
        "community_measures", "community_partition_eval",
        "community_adjusted_rand", "community_graph_rand",
        "community_sampled_rand", "community_overlapping_nmi",
        "community_cover_f1", "community_cover_hub_dominance",
        "community_fragmentation", "community_clustering_tools",
        "community_hash_overlap", "centrality_permanence",
        "centrality_local_coverage", "scd_ground_truth",
        # pii_redact feeds the corpus pipeline's redaction stage
        "pipeline_pretrain_corpus", "text_span_dedup",
    )
}
# r5: SGNS negative sampling moved from uniform to the word2vec
# unigram^0.75 quantized table (operators/sgns.py unigram_table + the
# matching utab oracle CTEs) — the r4 green predates the change.
_SEMANTICS_CHANGED["embed_sgns"] = 5
# r5: pagerank's fast path stores int32 ids (compact_ids auto) — same math,
# but hash partitioning over int keys changes double-summation order by
# ULPs under the 6dp rounding, so the driver should re-hash it (locally
# re-verified green via tools/check_correctness this round).
_SEMANTICS_CHANGED["graph_pagerank"] = 5

_GREEN_ROUNDS = _artifact_green_rounds()
# Kept under its historical name: tests/test_entry_contract.py pins this to
# the published artifacts (a hash-red query can never be hand-marked green).
_DRIVER_HASH_GREEN = set(_GREEN_ROUNDS)


def _gate_tier(name: str) -> int:
    last = _GREEN_ROUNDS.get(name, 0)
    if last == 0:
        return 0
    if last < _SEMANTICS_CHANGED.get(name, 0):
        return 1
    return 2


_REG_ORDER = {name: i for i, name in enumerate(QUERIES)}
QUERIES = dict(
    sorted(
        QUERIES.items(),
        key=lambda kv: (
            _gate_tier(kv[0]),
            _GREEN_ROUNDS.get(kv[0], 0),
            _REG_ORDER[kv[0]],
        ),
    )
)


def build_oracles() -> dict[str, str]:
    return {
        "graph_edges": L.sql_edges(),
        "graph_degrees": L.sql_degrees(),
        "graph_pagerank": L.sql_pagerank(PR_ITERS),
        "graph_components": L.sql_components(CC_ITERS),
        "graph_labelprop": L.sql_labelprop(LP_ITERS),
        "graph_triangles_per_node": L.sql_triangle_pernode(),
        "graph_triangle_count": L.sql_triangle_global(),
        "graph_lcc": L.sql_lcc(),
        "graph_transitivity": L.sql_transitivity(),
        "graph_transitivity_approx": L.sql_approx_transitivity(8, 42),
        "graph_triangle_edge_scores": L.sql_triangle_edge_scores(),
        "graph_top_entities": L.sql_top_entities(20),
        "graph_coarsen_by_community": L.sql_coarsen_lp(LP_ITERS),
        "graph_modularity_lp": L.sql_modularity(LP_ITERS),
        "graph_pagerank_csr": L.sql_pagerank(PR_ITERS),
        "graph_components_csr": L.sql_components(CC_ITERS),
        "graph_labelprop_csr": L.sql_labelprop(LP_ITERS),
        "centrality_degree": L.sql_degree_centrality(),
        "centrality_eigenvector": L.sql_eigenvector(EIG_ITERS),
        "centrality_katz": L.sql_katz(KATZ_ITERS, KATZ_ALPHA, KATZ_BETA),
        "centrality_betweenness": L.sql_betweenness(APSP_ITERS),
        "centrality_harmonic": L.sql_harmonic_closeness(APSP_ITERS),
        "centrality_closeness": L.sql_closeness(APSP_ITERS),
        "graph_diameter": L.sql_diameter(APSP_ITERS),
        "graph_neighborhood_heuristic": L.sql_neighborhood_heuristic(APSP_ITERS, NFH_SAMPLES),
        "graph_sample_nodes": L.sql_sample_nodes(10, 42),
        "graph_sample_edges": L.sql_sample_edges(10, 42),
        "graph_scc": L.sql_scc(),
        "graph_digraph_edges": L.sql_digraph_edges(),
        "graph_bfs": L.sql_bfs(BFS_ITERS),
        "graph_linkpred": L.sql_linkpred(LINKPRED_HINGE_CAP),
        "graph_sssp": L.sql_sssp(SSSP_ITERS),
        "graph_core_decomposition": L.sql_core_decomposition(KCORE_ITERS),
        "graph_plm_pinned": L.sql_plm_pinned(PLM_PINNED_SWEEPS),
        # graph_plm: the free-running multilevel Louvain partition itself is
        # not SQL-expressible, but its closed-form invariant row is (r3)
        "graph_plm": L.sql_plm_invariants(),
        "gen_rmat_invariants": (
            f"SELECT CAST({1 << RMAT_SCALE} AS BIGINT) AS n_vertices, "
            f"CAST({(1 << RMAT_SCALE) * RMAT_EF} AS BIGINT) AS n_edges, "
            f"CAST({2 * (1 << RMAT_SCALE) * RMAT_EF} AS BIGINT) AS degree_sum, "
            f"CAST(0 AS BIGINT) AS out_of_range"
        ),
        "graph_sparsify_scores": L.sql_sparsify_scores(42),
        "graph_assortativity": L.sql_assortativity(),
        "graph_matching": L.sql_matching(16),
        "graph_suitor_matching": L.sql_suitor_matching(16),
        "graph_biconnected": L.sql_biconnected_summary(),
        "linkpred_eval": L.sql_linkpred_eval(
            LINKPRED_TEST_PM, LINKPRED_EVAL_CAP, LINKPRED_TOPK
        ),
        "linkpred_katz": L.sql_linkpred_katz(
            LINKPRED_TEST_PM, LINKPRED_EVAL_CAP, KATZ_BETA_IDX
        ),
        "linkpred_indices_ext": L.sql_linkpred_ext(
            LINKPRED_HINGE_CAP, CC_ITERS
        ),
        "graph_edge_score_utils": L.sql_edge_score_utils(),
        "graph_prefix_jaccard": L.sql_prefix_jaccard(),
        "graph_score_linearize": L.sql_score_linearize(42),
        "centrality_electrical_closeness": L.sql_electrical_closeness(4, 30, 0.5),
        "graph_effective_diameter": L.sql_effective_diameter(APSP_ITERS, 0.9),
        "centrality_top_closeness": L.sql_top_closeness(APSP_ITERS, 10),
        "graph_mis": L.sql_mis(12, 42),
        "graph_neighborhood_function": L.sql_neighborhood_function(4, 7, 42, 8),
        "graph_effective_diameter_fm": L.sql_effective_diameter_fm(0.9, 4, 7, 42, 8),
        "scd_pagerank_nibble": L.sql_pagerank_nibble(0, 0.15, 8),
        "sim_seir": L.sql_seir(0, 8, 0.5, 2, 7, 42),
        "centrality_laplacian": L.sql_laplacian_centrality(True),
        "centrality_sfigality": L.sql_sfigality(),
        "embed_node2vec_walks": L.sql_node2vec_walks(4.0, 0.25, 5, 1, 42),
        "embed_sgns": L.sql_sgns(8, 2, 2, 4.0, 3, 42, 4.0, 0.25, 5, 2),
        "graph_msf": L.sql_msf(),
        "graph_umsf": L.sql_umsf(),
        "community_hash_overlap": L.sql_hash_overlap(LP_ITERS, CC_ITERS),
        "community_clustering_tools": L.sql_clustering_tools(1, CC_ITERS),
        "graph_sparsify_ratio": L.sql_sparsify_ratio(SPARSIFY_RATIO, 42),
        "graph_bfs_sample": L.sql_bfs_sample(BFS_ITERS, BFS_SAMPLE_K, 0),
        "graph_degree_gini": L.sql_degree_gini(),
        "graph_spectral_bisection": L.sql_spectral_bisection(FIEDLER_ITERS, 42),
        "viz_pivot_mds": L.sql_pivot_mds(
            APSP_ITERS, PMDS_PIVOTS, PMDS_DIM, PMDS_ITERS, 42
        ),
        "text_pack_sequences": L.sql_pack_sequences(PACK_CAPACITY, 42),
        "graph_maxflow": L.sql_maxflow(MAXFLOW_K, MAXFLOW_S, MAXFLOW_T),
        "graph_diff": L.sql_graph_diff(),
        "graph_randomize_invariants": L.sql_degree_histogram(),
        "graph_wilson_forest": L.sql_spanning_forest_invariants(CC_ITERS),
        "graph_global_curveball": L.sql_degree_histogram(),
        "graph_commute_time": L.sql_commute_time(CTD_PAIRS, CTD_ITERS, CTD_OMEGA),
        "centrality_group_closeness": L.sql_group_closeness(GROUP_CLOSENESS_K),
        "centrality_group_harmonic": L.sql_group_harmonic(GROUP_CLOSENESS_K),
        "centrality_group_swaps": L.sql_group_swaps(SWAPS_K, SWAPS_ROUNDS),
        "centrality_gedwalk": L.sql_ged_walk(
            GEDWALK_K, GEDWALK_ALPHA, GEDWALK_LEVELS, GEDWALK_POOL
        ),
        "graph_reachable": L.sql_reachable_nodes(),
        "graph_cliques": L.sql_maximal_cliques(),
        "scd_clique_detect": L.sql_clique_detect(),
        "scd_gce": L.sql_gce(GCE_SEEDS, GCE_STEPS),
        "scd_ground_truth": L.sql_scd_ground_truth(GCE_SEEDS, GCE_STEPS, 1),
        "scd_gce_l": L.sql_gce_l(GCE_SEEDS, GCE_STEPS),
        "community_map_equation": L.sql_map_equation(4),
        "centrality_kpath": L.sql_kpath(4, 64),
        "centrality_group_degree": L.sql_group_degree(GROUP_DEGREE_K),
        "graph_edge_distances": L.sql_edge_distances(),
        "graph_simple_paths": L.sql_all_simple_paths(SP_SOURCE, SP_TARGET, SP_CUTOFF),
        "graph_algdist": L.sql_algebraic_distance(AD_SYSTEMS, AD_ITERS, AD_OMEGA, AD_NORM),
        "graph_eccentricity": L.sql_eccentricity(APSP_ITERS),
        "graph_spsp": L.sql_spsp(APSP_ITERS, SPSP_SOURCES),
        "graph_volume": L.sql_volume(VOLUME_RS, 25, 42),
        "dedup_embed_pairs": L.sql_embed_near_dup(0.2, 8, 2, 42, 64),
        "embed_ivf_ann": L.sql_ivf_ann(5, 3, 8, 2),
        "dedup_semdedup": L.sql_semdedup(
            SEMDEDUP_CELLS, SEMDEDUP_EPS, SEMDEDUP_MAX_CELL
        ),
        "embed_cluster_sample": L.sql_cluster_sample(
            CLUSTER_SAMPLE_CELLS, CLUSTER_SAMPLE_CAP
        ),
        "text_hashed_features": L.sql_hashed_features(HASHED_FEATURES_DIM),
        "graph_profile_distributions": L.sql_profile_distributions(CC_ITERS),
        "profile_rank_correlation": L.sql_profile_rank_correlation(PR_ITERS),
        "graph_algebraic_sssp": L.sql_sssp(SSSP_ITERS),
        "text_quality_classifier": L.sql_quality_classifier(
            QCLS_POSITIVES, QCLS_DIM, QCLS_LR, QCLS_EPOCHS, 42
        ),
        "text_span_dedup": L.sql_span_dedup(SPAN_DEDUP_N, SPAN_DEDUP_THRESHOLD),
        "text_source_mixing": L.sql_source_mixing(MIXING_TARGET),
        "community_measures": L.sql_partition_measures(LP_ITERS, 2),
        "centrality_permanence": L.sql_permanence(1),
        "centrality_spanning_edge": L.sql_spanning_edge(4, 30, 0.5),
        "centrality_local_coverage": L.sql_local_coverage(1),
        "centrality_closeness_sampled": L.sql_sampled_closeness(8),
        "centrality_betweenness_rk": L.sql_approx_betweenness_rk(32, 8),
        "community_partition_eval": L.sql_partition_eval(1),
        "community_adjusted_rand": L.sql_adjusted_rand(2, 1),
        "community_sampled_rand": L.sql_sampled_rand(2, 1, 40, 60),
        "community_graph_rand": L.sql_graph_structural_rand(2, 1),
        "community_cover_hub_dominance": L.sql_cover_hub_dominance(1, CC_ITERS, 10_000_000),
        "community_fragmentation": L.sql_partition_fragmentation(1, CC_ITERS),
        "community_overlapping_nmi": L.sql_overlapping_nmi(CC_ITERS, 10_000_000),
        "community_cover_f1": L.sql_cover_f1(1, CC_ITERS),
        "community_coverage": L.sql_coverage(LP_ITERS),
        "community_edgecut": L.sql_edgecut(LP_ITERS),
        "community_conductance": L.sql_conductance(LP_ITERS),
        "community_stability": L.sql_stable_fraction(LP_ITERS),
        "text_token_stats": L.sql_token_stats(),
        "text_quality": L.sql_quality(),
        "text_lang_id": L.sql_lang_id(),
        "text_fingerprint": L.sql_fingerprint(),
        "text_token_topk": L.sql_token_topk(20),
        "text_lm_score": L.sql_lm_score(LM_VOCAB, LM_ADD_K),
        "text_dsir_resample": L.sql_dsir_resample(
            DSIR_K, DSIR_BUCKETS, DSIR_ADD_K
        ),
        "dedup_exact": L.sql_dedup_exact(),
        "graph_quadrangles": L.sql_quadrangles(),
        "text_ngram_repetition": L.sql_ngram_repetition(2),
        "text_decontaminate": L.sql_decontaminate(3, 23),
        "text_sample_stratified": L.sql_stratified_sample(),
        "text_quality_filter": L.sql_quality_filter(),
        "text_source_profile": L.sql_source_profile(),
        "text_pii_redact": L.sql_pii_redact(),
        "pipeline_pretrain_corpus": L.sql_pretrain_corpus(),
        "dedup_minhash_bands": L.sql_minhash_bands(16, 4),
        "dedup_canonical": L.sql_dedup_canonical(16, 4, 50, 4),
        "dedup_simhash": L.sql_simhash(32),
        "dedup_jaccard_pairs": L.sql_jaccard_pairs(0.5, 100),
        "embed_cosine_topk": L.sql_cosine_topk(5, 10),
        "embed_lsh_ann": L.sql_lsh_ann(5, 3, 8),
        "multimodal_decode_meta": L.sql_multimodal_meta(),
        "events_sessionize": L.sql_sessionize(1800),
    }
