"""Edge-score sparsification family (ref: networkit/cpp/sparsification/).

The reference computes a per-edge "cohesion" score, then keeps the edges
above a global threshold (GlobalThresholdFilter.cpp) — the standard backbone
extraction pipeline. Every score here is a pure DataFrame expression over
the canonical (src < dst) undirected edge table joined with degrees and the
per-edge triangle counts the engine already produces — one or two joins, a
window where the reference ranks neighborhoods, zero Python.

Scale notes: scores are edge-partitioned (no vertex-sized broadcast, no
collect); the ranking scores (local_degree, local_similarity) shuffle once
on the neighborhood key, which is the same key the adjacency is already
hashed on. At 10^9 vertices the window over a hub's neighborhood is a
single skewed partition — the same skew AQE already splits for the triangle
joins; ranks are computed per-(node) group and hubs cap at deg(max) rows.

Scores implemented (semantics per the cited reference file):
  random_edge_score        RandomEdgeScore.cpp:17-24 (seeded-hash determinism
                           instead of Aux::Random so oracles reproduce it)
  scan_similarity_score    SCANStructuralSimilarityScore.cpp:11-14
  chance_corrected_triangle_score  ChanceCorrectedTriangleScore.cpp:22-29
  local_degree_score       LocalDegreeScore.cpp:39-80 (competition rank of
                           neighbors by degree desc; max over endpoints)
  local_similarity_score   LocalSimilarityScore.cpp:29-70 (row-number rank of
                           neighbors by per-edge Jaccard desc; reference
                           leaves tie order unspecified — we pin neighbor-id
                           asc so both engines agree)
  global_threshold_filter  GlobalThresholdFilter.cpp (keep score >= threshold)
  simmelian_overlap_score  SimmelianScore.cpp:17-46 + SimmelianOverlapScore.cpp:17-31

  forest_fire_score        ForestFireScore.cpp:22-92 — the reference burns
                           fires one at a time (queue + per-edge URNG
                           draws); the distributed analogue below runs a
                           BATCH of fires as synchronous supersteps with
                           hash-derandomized geometric burn counts. The
                           per-fire visit order differs from the sequential
                           process (two frontier nodes can burn edges to
                           the same target in one superstep), so this is a
                           same-family sampler, not a bit-exact port —
                           scores are checked by invariants (normalized to
                           max 1, only real edges, burnt mass >= target,
                           seed-deterministic), matching how the reference
                           itself is tested (sparsification GTests assert
                           ranges, not values, for randomized scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.operators.triangles import triangle_edge_scores

_HASH_SPAN = float(1 << 48)


def canonical_edges(graph: Graph) -> DataFrame:
    """One row per undirected simple edge: (src < dst)."""
    g = graph.to_undirected() if graph.directed else graph
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def random_edge_score(graph: Graph, seed: int = 42) -> DataFrame:
    """(src, dst, score) — uniform [0,1) per canonical edge, a pure function
    of (seed, src, dst) via the cross-engine 48-bit hash (the deterministic
    analogue of RandomEdgeScore.cpp:17-24's Aux::Random::probability)."""
    h = F.expr(
        md5_long_sql(
            f"('{seed}:re:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
        )
    )
    return canonical_edges(graph).select(
        "src", "dst", F.round(h / F.lit(_HASH_SPAN), 9).alias("score")
    )


def tri_deg_base(graph: Graph) -> DataFrame:
    """(src, dst, tri, sdeg, ddeg) per canonical edge — the shared input of
    the triangle-derived scores (degrees are simple-support). Compute ONCE
    and pass as ``base=`` when deriving several scores of the same graph —
    the triangle listing is the expensive part and need not be repeated."""
    tri = triangle_edge_scores(graph)
    g = graph.to_undirected() if graph.directed else graph
    deg = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        tri.withColumnRenamed("score", "tri")
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sdeg"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "ddeg"), "dst")
    )


def scan_similarity_score(graph: Graph, base: DataFrame | None = None) -> DataFrame:
    """(src, dst, score) — SCAN structural similarity
    (t+1)/sqrt((deg(u)+1)(deg(v)+1)), SCANStructuralSimilarityScore.cpp:11-14."""
    e = tri_deg_base(graph) if base is None else base
    return e.select(
        "src",
        "dst",
        F.round(
            (F.col("tri") + 1.0)
            / F.sqrt((F.col("sdeg") + 1.0) * (F.col("ddeg") + 1.0)),
            6,
        ).alias("score"),
    )


def chance_corrected_triangle_score(
    graph: Graph, base: DataFrame | None = None
) -> DataFrame:
    """(src, dst, score) — t(n-2)/((deg(u)-1)(deg(v)-1)) when t > 0, 1.0 when
    either endpoint has degree 1, else 0 (ChanceCorrectedTriangleScore.cpp:22-29).
    n is the graph's vertex count."""
    n = graph.num_nodes()
    e = tri_deg_base(graph) if base is None else base
    return e.select(
        "src",
        "dst",
        F.round(
            F.when(
                F.col("tri") > 0,
                F.col("tri") * F.lit(float(n - 2))
                / ((F.col("sdeg") - 1.0) * (F.col("ddeg") - 1.0)),
            )
            .when((F.col("sdeg") == 1) | (F.col("ddeg") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("score"),
    )


def _rank_exponent(per_direction: DataFrame, order_cols: list, use_row_number: bool) -> DataFrame:
    """Shared shape of LocalDegreeScore / LocalSimilarityScore: per directed
    neighborhood (partition by node) rank neighbors, exponent
    e = 1 - ln(rank)/ln(deg) (1.0 when deg <= 1), then per canonical edge
    keep the max over the two directions (the reference's atomic_max)."""
    w = Window.partitionBy("node").orderBy(*order_cols)
    rank_fn = F.row_number() if use_row_number else F.rank()
    ranked = per_direction.withColumn("rnk", rank_fn.over(w))
    scored = ranked.select(
        F.least("node", "nbr").alias("src"),
        F.greatest("node", "nbr").alias("dst"),
        F.when(F.col("ndeg") <= 1, F.lit(1.0))
        .otherwise(1.0 - F.log(F.col("rnk").cast("double")) / F.log(F.col("ndeg").cast("double")))
        .alias("e"),
    )
    return scored.groupBy("src", "dst").agg(F.round(F.max("e"), 6).alias("score"))


def local_degree_score(graph: Graph) -> DataFrame:
    """(src, dst, score) — LocalDegreeScore.cpp:39-80: from each endpoint i,
    competition-rank i's neighbors j by deg(j) descending (ties share the
    min rank, exactly `rank()`), exponent 1 - ln(rank)/ln(deg(i)) (or 1.0
    when deg(i) = 1), score = max over both endpoints."""
    g = graph.to_undirected() if graph.directed else graph
    e = (
        g.edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    per_dir = (
        e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .join(deg.withColumnRenamed("id", "node").withColumnRenamed("deg", "ndeg"), "node")
        .join(deg.withColumnRenamed("id", "nbr").withColumnRenamed("deg", "nbrdeg"), "nbr")
    )
    return _rank_exponent(per_dir, [F.desc("nbrdeg")], use_row_number=False)


def local_similarity_score(graph: Graph, base: DataFrame | None = None) -> DataFrame:
    """(src, dst, score) — LocalSimilarityScore.cpp:29-70: per endpoint i,
    rank neighbors by per-edge Jaccard sim = t/(deg(i)+deg(j)-t) descending
    (row_number; reference tie order is unspecified — pinned to neighbor-id
    asc), exponent 1 - ln(rank)/ln(deg(i)), score = max over endpoints."""
    e = tri_deg_base(graph) if base is None else base
    sim = e.withColumn(
        "sim",
        F.col("tri").cast("double")
        / (F.col("sdeg") + F.col("ddeg") - F.col("tri")).cast("double"),
    )
    d1 = sim.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr"),
        F.col("sdeg").alias("ndeg"), "sim",
    )
    d2 = sim.select(
        F.col("dst").alias("node"), F.col("src").alias("nbr"),
        F.col("ddeg").alias("ndeg"), "sim",
    )
    return _rank_exponent(
        d1.unionByName(d2), [F.desc("sim"), F.asc("nbr")], use_row_number=True
    )


def global_threshold_filter(
    graph: Graph, scores: DataFrame, threshold: float, above: bool = True
) -> Graph:
    """Keep the undirected edges whose score passes the threshold
    (GlobalThresholdFilter.cpp; above=True keeps score >= threshold).
    Returns a Graph over the same vertex set; kept edges re-symmetrized."""
    keep = scores.filter(
        (F.col("score") >= threshold) if above else (F.col("score") <= threshold)
    ).select("src", "dst")
    g = graph.to_undirected() if graph.directed else graph
    canon = g.edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    ).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    kept = canon.join(keep, ["src", "dst"], "semi")
    sym = kept.unionByName(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return Graph(graph.vertices, sym, directed=False, weighted=graph.weighted)


def simmelian_overlap_score(
    graph: Graph, max_rank: int = 10, base: DataFrame | None = None
) -> DataFrame:
    """(src, dst, score) — Simmelian overlap (non-parametric backbone
    input): per node, rank neighbors by per-edge triangle count descending
    (competition rank, best = 0, ties share the min rank —
    SimmelianScore.cpp:17-46); the score of edge (u,v) is the number of
    common neighbors ranked <= max_rank by BOTH endpoints
    (SimmelianOverlapScore.cpp:17-31, getOverlap match count).

    Scale shape: the ranked-prefix table keeps <= max_rank(+ties) rows per
    vertex, so the overlap wedge join has bounded fan-out per vertex —
    unlike a raw common-neighbor join, hubs contribute O(max_rank²) pairs,
    not O(deg²)."""
    e = tri_deg_base(graph) if base is None else base
    d1 = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), "tri")
    d2 = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"), "tri")
    w = Window.partitionBy("node").orderBy(F.desc("tri"))
    top = (
        d1.unionByName(d2)
        .withColumn("rnk", F.rank().over(w) - 1)
        .filter(F.col("rnk") <= max_rank)
        .select("node", "nbr")
    )
    canon = canonical_edges(graph)
    t1 = top.select(F.col("node").alias("src"), F.col("nbr").alias("w1"))
    t2 = top.select(F.col("node").alias("dst"), F.col("nbr").alias("w2"))
    ov = (
        canon.join(t1, "src")
        .join(t2, "dst")
        .filter(F.col("w1") == F.col("w2"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("ov"))
    )
    return (
        canon.join(ov, ["src", "dst"], "left")
        .fillna({"ov": 0})
        .select("src", "dst", F.col("ov").cast("double").alias("score"))
    )


def jaccard_distance_score(graph: Graph, base: DataFrame | None = None) -> DataFrame:
    """(src, dst, jd) — per-edge Jaccard distance
    1 - t/(deg(u) + deg(v) - t) (distance/JaccardDistance.cpp:39-41),
    over the shared triangle base (simple-support degrees, matching the
    rest of the edge-score family)."""
    e = tri_deg_base(graph) if base is None else base
    return e.select(
        "src",
        "dst",
        (1.0 - F.col("tri") / (F.col("sdeg") + F.col("ddeg") - F.col("tri"))).alias("jd"),
    )


def adamic_adar_distance_score(graph: Graph) -> DataFrame:
    """(src, dst, aa_dist) — per-edge Adamic-Adar distance
    (distance/AdamicAdarDistance.cpp:30-59): each triangle {u,v,w} adds
    1/ln(deg(w)) to edge (u,v) for all three role rotations, then the
    distance is the reciprocal of the sum; triangle-free edges have no
    finite distance and are reported NULL (the reference yields +inf).

    One triangle listing + one label-sized agg — the listing's O(sqrt(m))
    orientation bound is what makes this safe at scale."""
    from networkit_spark.operators.triangles import triangle_corners

    g = graph.to_undirected() if graph.directed else graph
    simple = (
        g.edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    deg = simple.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangle_corners(graph)

    def contrib(u, v, w):
        return tri.select(
            F.least(F.col(u), F.col(v)).alias("u"),
            F.greatest(F.col(u), F.col(v)).alias("v"),
            F.col(w).alias("w"),
        )

    contribs = (
        contrib("a", "b", "c")
        .unionByName(contrib("a", "c", "b"))
        .unionByName(contrib("b", "c", "a"))
        .join(deg.withColumnRenamed("id", "w"), "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("deg"))).alias("aa"))
    )
    canon = simple.filter(F.col("src") <= F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return canon.join(contribs, ["u", "v"], "left").select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.when(F.col("aa") > 0, 1.0 / F.col("aa")).alias("aa_dist"),
    )


def forest_fire_score(
    graph: Graph,
    pf: float = 0.7,
    target_burnt_ratio: float = 1.0,
    fires_per_batch: int = 32,
    seed: int = 42,
    max_batches: int = 16,
    max_rounds: int = 32,
) -> DataFrame:
    """(src, dst, score) for every canonical edge — burn frequency
    normalized by the max (ForestFireScore.cpp:80-92). Fires in a batch
    spread concurrently: per superstep every (fire, frontier-node) burns a
    Geometric(pf)-distributed number of its unvisited-in-that-fire
    neighbors, chosen by hash rank; k = floor(ln U / ln pf) reproduces the
    reference's draw-until-q>pf loop distribution exactly. Batches repeat
    until the burnt-edge mass reaches ``target_burnt_ratio * m``."""
    import math

    from networkit_spark.plans.checkpoint import materialize

    if not (0.0 < pf < 1.0):
        raise ValueError("pf must be in (0, 1)")
    canon = materialize(canonical_edges(graph))
    m = canon.count()
    if m == 0:
        return canon.withColumn("score", F.lit(0.0))
    adj = materialize(
        canon.select(F.col("src").alias("u"), F.col("dst").alias("x")).unionByName(
            canon.select(F.col("dst").alias("u"), F.col("src").alias("x"))
        )
    )
    ln_pf = math.log(pf)

    burnt = None
    total = 0
    for batch in range(max_batches):
        if total >= target_burnt_ratio * m:
            break
        starts = (
            graph.vertices.withColumn(
                "hstr",
                F.concat_ws(":", F.lit(str(seed)), F.lit("start"),
                            F.lit(str(batch)), F.col("id")),
            )
            .withColumn("h", F.expr(md5_long_sql("hstr")))
            .orderBy("h", "id")
            .limit(fires_per_batch)
            .select(F.col("id").alias("fire"), F.col("id").alias("node"))
        )
        visited = starts.localCheckpoint(eager=True)
        frontier = visited
        for rnd in range(max_rounds):
            cand = (
                frontier.join(adj, frontier.node == adj.u)
                .select("fire", "u", "x")
                .join(
                    visited.withColumnRenamed("node", "x"), ["fire", "x"], "anti"
                )
            )
            tag = f"{seed}:{batch}:{rnd}"
            u01 = (
                (F.expr(md5_long_sql("kstr")) + F.lit(1.0)) / F.lit(_HASH_SPAN + 2.0)
            )
            k = F.floor(F.log(u01) / F.lit(ln_pf))
            cand = cand.withColumn(
                "kstr",
                F.concat_ws(":", F.lit(tag), F.lit("k"), F.col("fire"), F.col("u")),
            ).withColumn("k", k)
            pick = F.concat_ws(
                ":", F.lit(tag), F.lit("p"), F.col("fire"), F.col("u"), F.col("x")
            )
            cand = cand.withColumn("pstr", pick).withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("fire", "u").orderBy(
                        F.expr(md5_long_sql("pstr")), "x"
                    )
                ),
            )
            burn = cand.filter(F.col("rk") <= F.col("k")).localCheckpoint(eager=True)
            if burn.isEmpty():
                break
            nb = (
                burn.select(
                    F.least("u", "x").alias("src"),
                    F.greatest("u", "x").alias("dst"),
                )
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            burnt = (
                nb
                if burnt is None
                else burnt.unionByName(nb)
                .groupBy("src", "dst")
                .agg(F.sum("cnt").alias("cnt"))
            ).localCheckpoint(eager=True)
            newv = burn.select("fire", F.col("x").alias("node")).distinct()
            visited = visited.unionByName(newv).localCheckpoint(eager=True)
            frontier = newv
        total = (
            0 if burnt is None
            else burnt.agg(F.sum("cnt")).collect()[0][0] or 0
        )
    if burnt is None:
        return canon.withColumn("score", F.lit(0.0))
    mx = float(burnt.agg(F.max("cnt")).collect()[0][0])
    return canon.join(burnt, ["src", "dst"], "left").select(
        "src", "dst",
        (F.coalesce("cnt", F.lit(0)).cast("double") / F.lit(mx)).alias("score"),
    )


def random_node_edge_score(
    graph: Graph, rne_ratio: float = 0.5, seed: int = 42
) -> DataFrame:
    """(u, v, score), u < v — RandomNodeEdgeScore (sparsification/
    RandomNodeEdgeScore.cpp:19-70): a sequential removal process scores
    every edge by its removal position / m; each step removes either a
    uniformly random remaining edge (probability 1 - rne_ratio) or a
    node-biased one (uniform random node with remaining degree, then
    uniform incident edge — GraphTools::randomEdge's non-uniform draw).
    Low scores = removed early under the mixed process; thresholding the
    scores replays the removal prefix.

    The score IS the stateful removal order (the skip rationale for three
    rounds), so this is fixture-tier driver-sequential with one seeded
    generator; the reference's pre-batched uniform edge buffer
    (cpp:33-44) is an amortization, not semantics. RandomEdgeScore
    (inside `graph_sparsify_scores`, hash-derandomized, oracle-checked)
    remains the distributed random-backbone path."""
    import numpy as np

    spark = graph.vertices.sparkSession
    adj: dict[int, set[int]] = {}
    for r in graph.edges.select("src", "dst").distinct().collect():
        u, v = int(r["src"]), int(r["dst"])
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    edges = sorted({(min(u, v), max(u, v)) for u, nb in adj.items() for v in nb})
    m = len(edges)
    remaining = set(edges)
    rng = np.random.default_rng(seed)
    scores: list[tuple[int, int, float]] = []
    removed = 0
    while remaining:
        if rng.random() >= rne_ratio:  # uniformly random edge
            pool = sorted(remaining)
            e = pool[int(rng.integers(0, len(pool)))]
        else:  # random node -> random incident edge
            alive = sorted(u for u in adj if adj[u])
            x = alive[int(rng.integers(0, len(alive)))]
            nbrs = sorted(adj[x])
            y = nbrs[int(rng.integers(0, len(nbrs)))]
            e = (min(x, y), max(x, y))
        scores.append((e[0], e[1], removed / m))
        remaining.discard(e)
        adj[e[0]].discard(e[1])
        adj[e[1]].discard(e[0])
        removed += 1
    return spark.createDataFrame(sorted(scores), "u long, v long, score double")
