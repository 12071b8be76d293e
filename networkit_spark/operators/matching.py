"""Local-max (Preis) weighted matching as synchronous supersteps.

Reference: networkit/cpp/matching/LocalMaxMatcher.cpp:21-84 — repeat until
no edges remain: every vertex points at its heaviest remaining incident
edge; an edge both of whose endpoints point at it is locally dominant and
enters the matching; edges touching matched vertices are discarded. The
result is a maximal matching with weight >= 1/2 optimum (Preis 1999).

The reference breaks weight ties by perturbing weights with Aux::Random
(LocalMaxMatcher.cpp:37); for cross-engine determinism we use the strict
total order (weight, min(u,v), max(u,v)) on edges instead — every vertex
has a unique best edge, so the algorithm is schedule-independent and the
DuckDB oracle reproduces it exactly.

Spark-first plan per round (no Python anywhere):
  best(v)   = max_by over v's remaining incident directed rows — one
              map-side-combined aggregation on the adjacency key;
  matched   = canonical edges where best(src) == best(dst) == the edge —
              one self-agreement join;
  remaining = edges anti-joined against the new matched vertex set.
Rounds are O(log n) expected; IterationState bounds plan growth the same
way the components loop does. At scale each round shuffles only the
remaining-edge table, which shrinks geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, require_fixture_scale
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState, materialize


def local_max_matching(
    graph: Graph,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """matching(u: long, v: long, weight: double) with u < v — the
    deterministic local-max matching of the undirected simple support.
    Self-loops are never matched (LocalMaxMatcher.cpp:64 u != v guard)."""
    return _dominant_matching(graph, "localmax", max_rounds, checkpoint)


def suitor_matching(
    graph: Graph,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """matching(u, v, weight) with u < v — the Suitor matching
    (matching/SuitorMatcher.cpp:56-87, Manne & Halappanavar "New Effective
    Multithreaded Matching Algorithms", IPDPS 2014).

    Documented distributed formulation: the reference's proposal /
    displacement chains are inherently sequential pointer-chasing, but the
    Suitor fixed point is exactly the GREEDY matching over the strict edge
    total order (w DESC, u ASC, v ASC) — the reference's two tie-breaks
    (findSuitor prefers the smaller neighbor id at equal weight,
    acceptance prefers the smaller proposer id, SuitorMatcher.cpp:64-66,
    75-76) are both consistent with that canonical-pair lexicographic
    order, and Manne-Halappanavar §3 prove Suitor returns the same
    matching as sequential greedy under any consistent order. Greedy over
    a strict total order is in turn the fixed point of locally-dominant
    edge rounds (Preis), so the same synchronous superstep machinery as
    local_max_matching computes it — each round every vertex 'proposes'
    along its best remaining edge and mutual proposals are accepted —
    with the suitor tie-break instead of local_max's (w, u, v)-max."""
    return _dominant_matching(graph, "suitor", max_rounds, checkpoint)


def _dominant_matching(
    graph: Graph,
    order: str,
    max_rounds: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
    )
    remaining = materialize(canon)
    spark = remaining.sparkSession
    matched = spark.createDataFrame([], "u long, v long, weight double")

    state = IterationState(checkpoint, "matching")
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        # directed view: one row per (node, nbr, edge) of the remaining set
        d = remaining.select(
            F.col("u").alias("node"), F.col("v").alias("nbr"), "u", "v", "w"
        ).unionByName(
            remaining.select(
                F.col("v").alias("node"), F.col("u").alias("nbr"), "u", "v", "w"
            )
        )
        # each vertex's unique best edge under the strict total order:
        # localmax = (w, u, v)-max; suitor = (w DESC, u ASC, v ASC)
        if order == "suitor":
            key = F.struct(
                F.col("w"), (-F.col("u")).alias("nu"), (-F.col("v")).alias("nv"),
                F.col("u"), F.col("v"),
            )
        else:
            key = F.struct("w", "u", "v")
        best = d.groupBy("node").agg(F.max(key).alias("b")).select(
            "node", F.col("b.u").alias("bu"), F.col("b.v").alias("bv")
        )
        # an edge is matched iff BOTH endpoints name it as their best
        agree = (
            remaining.join(
                best.select(F.col("node").alias("u"), F.col("bu").alias("u1"), F.col("bv").alias("v1")),
                "u",
            )
            .join(
                best.select(F.col("node").alias("v"), F.col("bu").alias("u2"), F.col("bv").alias("v2")),
                "v",
            )
            .filter(
                (F.col("u1") == F.col("u")) & (F.col("v1") == F.col("v"))
                & (F.col("u2") == F.col("u")) & (F.col("v2") == F.col("v"))
            )
            .select("u", "v", F.col("w").alias("weight"))
        )
        new_matched = matched.unionByName(agree)
        # drop every remaining edge touching a newly matched vertex
        mv = agree.select(F.col("u").alias("id")).unionByName(
            agree.select(F.col("v").alias("id"))
        )
        nxt = (
            remaining.join(mv.withColumnRenamed("id", "u"), "u", "anti")
            .join(mv.withColumnRenamed("id", "v"), "v", "anti")
            .select("u", "v", "w")
        )
        nxt = state.advance(rnd, nxt)
        left = nxt.count()
        matched = new_matched
        remaining = nxt
        if left == 0:
            break
    state.close()
    return materialize(matched.select("u", "v", "weight"))


def matching_weight(matching: DataFrame) -> float:
    """Total weight of a matching DataFrame (Matching.cpp::weight)."""
    return matching.agg(F.sum("weight")).first()[0] or 0.0


def path_growing_matching(graph: Graph, max_m: int = 200_000) -> DataFrame:
    """matching(u, v, weight), u < v — PathGrowingMatcher
    (matching/PathGrowingMatcher.cpp:31-156, Drake-Hougardy 1/2-approx):
    repeatedly take the highest-degree alive vertex (the reference's
    BucketPQ extractMin over -degree; ties by id ASC here — BucketPQ
    leaves them unspecified), grow a path by always stepping over the
    heaviest alive incident edge (ties to the SMALLEST neighbor id — the
    reference keeps the first maximum in adjacency order), assign path
    edges alternately to two matchings (the alternation flag persists
    across paths, cpp:96-105), kill each visited vertex, and return the
    heavier matching (m2 on ties, cpp:150-153 strict >).

    Fixture-tier driver-sequential like the reference (the path walk IS
    the algorithm); LocalMax and Suitor are the superstep-native matching
    paths. Raises on directed graphs and self-loops (checkInput)."""
    if graph.directed:
        raise ValueError("path_growing_matching expects an undirected graph")
    require_fixture_scale(graph, max_m, "path_growing_matching")
    spark = graph.vertices.sparkSession
    adj: dict[int, dict[int, float]] = {}
    for r in graph.edges.select("src", "dst", "weight").collect():
        u, v, w = int(r["src"]), int(r["dst"]), float(r["weight"])
        if u == v:
            raise ValueError("path_growing_matching expects no self-loops")
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w

    degrees = {u: len(nb) for u, nb in adj.items()}
    alive = {u for u, d in degrees.items() if d > 0}
    num_edges = sum(degrees.values()) // 2
    m = [[], []]
    take = 0
    while num_edges > 0:
        v = max(alive, key=lambda x: (degrees[x], -x))
        while degrees[v] > 0:
            # -inf init picks the true max-weight alive neighbor.  For
            # positive weights this matches the reference exactly
            # (PathGrowingMatcher.cpp:73 inits bestWeight=0); for
            # nonpositive weights the reference degenerately leaves
            # bestNeighbor=0 — this port instead matches the real argmax
            # (documented deviation; the crash-free sane extension).
            best_u, best_w = None, float("-inf")
            for u in sorted(adj[v]):
                if u in alive and adj[v][u] > best_w:
                    best_u, best_w = u, adj[v][u]
            m[take].append((min(v, best_u), max(v, best_u), best_w))
            take = 1 - take
            for u in adj[v]:
                if u in alive:
                    degrees[u] -= 1
                    num_edges -= 1
                    if degrees[u] == 0:
                        alive.discard(u)
            alive.discard(v)
            v = best_u
    w0 = sum(w for _, _, w in m[0])
    w1 = sum(w for _, _, w in m[1])
    winner = m[0] if w0 > w1 else m[1]
    return spark.createDataFrame(sorted(winner), "u long, v long, weight double")
