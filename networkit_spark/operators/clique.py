"""Maximal clique enumeration.

Reference: networkit/cpp/clique/MaximalCliques.cpp — Bron-Kerbosch with
pivoting over a degeneracy ordering (Eppstein-Löffler-Strash): for each
vertex v in order, enumerate the maximal cliques whose minimum-ordered
member is v, with candidate set P = later neighbors and exclusion set
X = earlier neighbors. The output clique SET is ordering-invariant, so
this engine uses the (degree, id) ordering it already uses for triangle
orientation instead of the reference's core-decomposition ordering
(documented deviation: same cliques, slightly weaker worst-case bound).

Spark-first plan: the distributed part materializes one ego-net row set
per vertex — (v, a, b) induced-adjacency pairs restricted to a ∈ N⁺(v)
(later neighbors) — via the same wedge-join + edge-semi-join shape as
triangle listing, so the row count is Σ_v deg⁺(v)·deg(v) = O(m^1.5)
worst case, NOT Σ deg², and the per-ego candidate set is bounded by the
orientation's O(√m) out-degree. The per-ego Bron-Kerbosch runs in an
Arrow-batched applyInPandas kernel (grouped by v) — the documented
escape hatch for semantics DataFrame algebra can't express. A
``max_ego_degree`` cap drops hub egos for approximate listing at
extreme skew (same stop-hub pattern as link prediction / dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import materialize


def _ranked_neighbors(graph: Graph) -> DataFrame:
    """(v, nbr, later) — adjacency with the (degree, id) order flag."""
    g = graph.to_undirected() if graph.directed else graph
    edges = (
        g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    deg = g.degrees().select("id", "degree")
    e = (
        edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "sdeg")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("degree", "ddeg")
    )
    later = (F.col("ddeg") > F.col("sdeg")) | (
        (F.col("ddeg") == F.col("sdeg")) & (F.col("dst") > F.col("src"))
    )
    return e.select(F.col("src").alias("v"), F.col("dst").alias("nbr"), later.alias("later"))


def _bk_kernel(pdf):
    import pandas as pd

    v = int(pdf["v"].iloc[0])
    later, earlier = set(), set()
    adj: dict[int, set[int]] = {}
    for row in pdf.itertuples(index=False):
        if row.kind == 0:
            (later if row.later else earlier).add(int(row.a))
        elif row.kind == 1:
            a, b = int(row.a), int(row.b)
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

    out: list[list[int]] = []

    def bk(r: list[int], p: set[int], x: set[int]) -> None:
        if not p and not x:
            out.append(sorted(r))
            return
        empty: set[int] = set()
        pivot = max(p | x, key=lambda u: len(adj.get(u, empty) & p))
        for u in list(p - adj.get(pivot, set())):
            au = adj.get(u, set())
            bk(r + [u], p & au, x & au)
            p.discard(u)
            x.add(u)

    bk([v], set(later), set(earlier))
    return pd.DataFrame({"members": out or []}, dtype=object)


def maximal_cliques(graph: Graph, max_ego_degree: int | None = None) -> DataFrame:
    """(members: array<long>) — every maximal clique exactly once (listed
    from its minimum-(degree, id) member). ``max_ego_degree`` drops egos
    whose candidate count exceeds the cap (approximate under skew)."""
    nbrs = materialize(_ranked_neighbors(graph))
    if max_ego_degree is not None:
        keep = (
            nbrs.groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= int(max_ego_degree))
            .select("v")
        )
        nbrs = nbrs.join(keep, "v", "semi")

    und = nbrs.select(F.col("v").alias("a"), F.col("nbr").alias("b"))
    # induced ego pairs: a is a LATER neighbor of v, b any neighbor, (a,b)
    # an edge — every adjacency the BK recursion ever intersects
    pairs = (
        nbrs.filter("later")
        .select("v", F.col("nbr").alias("a"))
        .join(nbrs.select("v", F.col("nbr").alias("b")), "v")
        .filter(F.col("a") != F.col("b"))
        .join(und, ["a", "b"], "semi")
    )
    rows = (
        nbrs.select(
            "v",
            F.col("nbr").alias("a"),
            F.lit(None).cast("long").alias("b"),
            "later",
            F.lit(0).alias("kind"),
        )
        .unionByName(
            pairs.select(
                "v", "a", "b", F.lit(False).alias("later"), F.lit(1).alias("kind")
            )
        )
        .unionByName(
            graph.vertices.select(
                F.col("id").alias("v"),
                F.lit(None).cast("long").alias("a"),
                F.lit(None).cast("long").alias("b"),
                F.lit(False).alias("later"),
                F.lit(2).alias("kind"),
            )
        )
    )
    return rows.groupBy("v").applyInPandas(_bk_kernel, "members array<long>")


def clique_stats(cliques: DataFrame) -> DataFrame:
    """(size, n_cliques) — clique size histogram."""
    return (
        cliques.select(F.size("members").alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_cliques"))
    )


def clique_detect(graph: Graph, seeds: DataFrame | None = None) -> DataFrame:
    """(seed, members: array<long>) — selective community detection by
    cliques: for each seed s, the community is s plus the maximum clique
    among s's neighbors (ref: scd/CliqueDetect.cpp:17-39
    expandOneCommunity).

    A maximum clique C within N(s) extended by s is exactly the largest
    MAXIMAL clique of G containing s (any common neighbor of C + s would
    contradict C's maximality inside N(s)), so the operator is a rank over
    the already-distributed maximal-clique listing: explode members, take
    the largest clique per member.  The reference breaks size ties
    uniformly at random (IncrementalUniformRandomSelector); here ties go
    to the lexicographically smallest member array so both engines (and
    the DuckDB oracle) are deterministic.

    ``seeds`` (a DataFrame with column ``seed``) restricts the output;
    None returns every vertex that appears in some clique.
    """
    from pyspark.sql import Window

    cliques = maximal_cliques(graph).select(
        F.array_sort("members").alias("members")
    )
    ex = cliques.select(
        "members",
        F.size("members").alias("sz"),
        F.explode("members").alias("seed"),
    )
    if seeds is not None:
        ex = ex.join(seeds.select("seed"), "seed", "semi")
    w = Window.partitionBy("seed").orderBy(F.desc("sz"), F.asc("members"))
    return (
        ex.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("seed", "members")
    )
