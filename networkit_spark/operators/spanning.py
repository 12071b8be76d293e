"""Maximum-weight spanning forest via distributed Boruvka supersteps.

Reference: networkit/cpp/graph/RandomMaximumSpanningForest.cpp:34-80 (a
modified Kruskal over randomly-perturbed weights; attribute "is the edge in
the forest") and graph/SpanningForest.cpp (unweighted case). Kruskal's
sequential union-find does not distribute; Boruvka's algorithm computes the
SAME forest when edge weights are totally ordered, in O(log n) synchronous
rounds: every component selects its best incident cross edge, selected
edges join the forest, touched components contract, repeat until no cross
edges remain.

Determinism: the reference breaks weight ties with Aux::Random perturbation
(RandomMaximumSpanningForest.cpp:43); we use the strict total order
(w, u, v) lexicographic-max instead — under any strict total order the
maximum spanning forest is UNIQUE, so the result is schedule-independent
and exactly reproducible by the DuckDB oracle. A classic consequence of
distinct effective weights: the per-component best-edge pointer graph has
no cycles longer than 2, so contraction is conjoined-tree pointer
doubling, not general connected components.

Spark-first plan per round (no Python, no collect of edge data):
  comp labels  = vertex table (id, comp), joined onto the remaining-edge
                 table src- and dst-side (two shuffle joins on id);
  best(comp)   = one map-side-combined max(struct(w,u,v)) per component;
  contraction  = break 2-cycles (keep the smaller component as root), then
                 pointer-double labels to the root — successive squaring,
                 O(log depth) inner joins on the component table, which
                 shrinks geometrically across rounds.
The remaining-edge table also shrinks geometrically (intra-component edges
drop out), so late rounds are cheap; IterationState bounds plan growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph, require_fixture_scale
from networkit_spark.plans.checkpoint import CheckpointManager, IterationState, materialize


def max_spanning_forest(
    graph: Graph,
    max_rounds: int = 32,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """forest(u: long, v: long, weight: double), u < v — the unique
    maximum-weight spanning forest of the undirected simple support under
    the (weight, u, v) total order. Self-loops never enter a forest; for a
    MINIMUM forest pass negated weights and negate the result."""
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
    labels = materialize(
        g.vertices.select(F.col("id").alias("node"), F.col("id").alias("comp"))
    )
    forest = spark.createDataFrame([], "u long, v long, weight double")

    state = IterationState(checkpoint, "boruvka")
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        # cross edges under current labels (intra-component edges drop out
        # for good: overwrite `remaining` with the relabeled cross set)
        lab_u = labels.select(F.col("node").alias("u"), F.col("comp").alias("cu"))
        lab_v = labels.select(F.col("node").alias("v"), F.col("comp").alias("cv"))
        cross = materialize(
            remaining.join(lab_u, "u").join(lab_v, "v")
            .filter(F.col("cu") != F.col("cv"))
            .select("u", "v", "w", "cu", "cv")
        )
        if cross.isEmpty():
            break
        # every component's unique best incident edge under (w, u, v)
        cand = cross.select(F.col("cu").alias("comp"), "w", "u", "v", F.col("cv").alias("other")) \
            .unionByName(
                cross.select(F.col("cv").alias("comp"), "w", "u", "v", F.col("cu").alias("other"))
            )
        best = cand.groupBy("comp").agg(F.max(F.struct("w", "u", "v", "other")).alias("b"))
        chosen = materialize(
            best.select(
                F.col("b.u").alias("u"), F.col("b.v").alias("v"), F.col("b.w").alias("w")
            ).distinct()
        )
        forest = forest.unionByName(chosen.select("u", "v", F.col("w").alias("weight")))
        # parent pointer on components; 2-cycles (mutual picks) break to the
        # smaller endpoint, which becomes a self-rooted tree root
        ptr = best.select("comp", F.col("b.other").alias("parent"))
        p2 = ptr.select(F.col("comp").alias("c2"), F.col("parent").alias("gp"))
        ptr = (
            ptr.join(p2, ptr["parent"] == p2["c2"], "left")
            .select(
                "comp",
                F.when(
                    (F.col("gp") == F.col("comp")) & (F.col("comp") < F.col("parent")),
                    F.col("comp"),
                ).otherwise(F.col("parent")).alias("parent"),
            )
        )
        # pointer doubling to roots (successive squaring until fixpoint)
        ptr = materialize(ptr)
        for _ in range(64):
            sq = ptr.select(F.col("comp").alias("pc"), F.col("parent").alias("pp"))
            nxt = materialize(
                ptr.join(sq, ptr["parent"] == sq["pc"], "left")
                .select("comp", F.coalesce("pp", "parent").alias("parent"))
            )
            moved = nxt.join(
                ptr.select(F.col("comp").alias("oc"), F.col("parent").alias("op")),
                nxt["comp"] == F.col("oc"),
            ).filter(F.col("parent") != F.col("op")).isEmpty()
            ptr = nxt
            if moved:
                break
        # relabel vertices whose component moved; components without a cross
        # edge (isolated going forward) keep their label
        new_labels = (
            labels.join(ptr.withColumnRenamed("comp", "lc"), labels["comp"] == F.col("lc"), "left")
            .select("node", F.coalesce("parent", "comp").alias("comp"))
        )
        labels = state.advance(rnd, new_labels)
        remaining = cross.select("u", "v", "w")
    state.close()
    return materialize(forest.select("u", "v", "weight"))


def forest_weight(forest: DataFrame) -> float:
    """Total weight of a spanning forest DataFrame."""
    return forest.agg(F.sum("weight")).first()[0] or 0.0


def union_max_spanning_forest(
    graph: Graph,
    checkpoint: CheckpointManager | None = None,
    max_levels: int = 4096,
) -> DataFrame:
    """umsf(u: long, v: long, weight: double, in_umsf: boolean), u < v —
    per canonical edge of the undirected simple support, whether it belongs
    to AT LEAST ONE maximum-weight spanning forest.

    Reference: graph/UnionMaximumSpanningForest.cpp:46-80 — a descending
    Kruskal whose union-find merges are DEFERRED until the weight level
    changes, so every edge of one level is tested against the same state.
    That makes the membership criterion schedule-free: an edge (u, v, w) is
    in the UMSF iff u and v lie in different components of the
    strictly-heavier subgraph (the cut rule).

    Distributed form (matches the SQL oracle's shape): stack one stratum
    per weight level — stratum j holds the edges STRICTLY heavier than
    level j, nodes tagged (id, j) via composite ids — and run ONE hash-min
    component fixpoint over all strata at once (strata never interconnect,
    so labels stay per-stratum). An edge at level j is then in the UMSF iff
    its endpoints have different (or absent == singleton) labels inside
    stratum j. One fixpoint of O(max diameter) supersteps replaces a
    per-level fixpoint chain — at 1000 executors the barrier count, not
    the row count, is what a descending level loop would pay for.

    Scale note: the stacked size is sum_e rank(w(e)) <= m * |weight
    domain|; entity-graph weights are small integer counts, so the level
    count is bounded by the weight domain, not by n. The driver holds one
    scalar per distinct level (same bound). Because both bounds break
    silently on a continuous weight domain (e.g. a graph weighted by
    edge_score_as_weight, where |levels| ~= m makes the stacked build
    O(m^2) and the driver list m rows), ``max_levels`` ENFORCES the
    assumption: >max_levels distinct weights raises ValueError with a
    pointer at quantizing weights first (documented-lossy) instead of
    degrading silently."""
    from networkit_spark.operators.components import connected_components

    g = graph.to_undirected() if graph.directed else graph
    spark = g.vertices.sparkSession
    canon = materialize(
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
    )
    n_levels = canon.select("w").distinct().limit(max_levels + 1).count()
    if n_levels > max_levels:
        raise ValueError(
            f"union_max_spanning_forest: >{max_levels} distinct edge weights "
            "(continuous weight domain?) — the stacked-strata build is "
            "O(m * |levels|) and holds one driver scalar per level, which "
            "only scales for bounded weight ladders. Quantize weights first "
            "(e.g. F.round(weight, k) — documented-lossy) or raise max_levels "
            "explicitly."
        )
    levels = [
        r["w"] for r in canon.select("w").distinct().orderBy(F.desc("w")).collect()
    ]
    nlv = len(levels)
    base = canon.select("u", "v", F.col("w").alias("weight"))
    if nlv <= 1:
        # no strictly-heavier subgraph at the only level: every edge is in
        # some MSF (all strata empty)
        return materialize(base.withColumn("in_umsf", F.lit(True)))
    lvls = spark.createDataFrame(
        [(float(w), i) for i, w in enumerate(levels)], "lvl double, idx long"
    )
    # stratum j == edges with w > levels[j]; composite node id = id*nlv + j
    stacked = canon.join(F.broadcast(lvls), F.col("w") > F.col("lvl")).select(
        (F.col("u") * nlv + F.col("idx")).alias("src"),
        (F.col("v") * nlv + F.col("idx")).alias("dst"),
    )
    verts = (
        stacked.select(F.col("src").alias("id"))
        .unionByName(stacked.select(F.col("dst").alias("id")))
        .distinct()
    )
    sym = stacked.unionByName(
        stacked.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0).cast("float"))
    labels = connected_components(
        Graph(verts, sym, directed=False, weighted=False), checkpoint=checkpoint
    )
    keyed = canon.join(F.broadcast(lvls), F.col("w") == F.col("lvl")).select(
        "u", "v", F.col("w").alias("weight"),
        (F.col("u") * nlv + F.col("idx")).alias("ku"),
        (F.col("v") * nlv + F.col("idx")).alias("kv"),
    )
    lab_u = labels.select(F.col("id").alias("ku"), F.col("label").alias("cu"))
    lab_v = labels.select(F.col("id").alias("kv"), F.col("label").alias("cv"))
    # absent from the stratum == singleton there (no heavier incident edge),
    # hence disconnected from the (distinct) other endpoint
    return materialize(
        keyed.join(lab_u, "ku", "left")
        .join(lab_v, "kv", "left")
        .select(
            "u", "v", "weight",
            (
                F.col("cu").isNull()
                | F.col("cv").isNull()
                | (F.col("cu") != F.col("cv"))
            ).alias("in_umsf"),
        )
    )


def random_spanning_forest(
    graph: Graph, seed: int = 42, max_m: int = 200_000
) -> DataFrame:
    """(src, dst) tree edges — uniform random spanning forest via the
    Aldous-Broder first-entry walk (components/RandomSpanningForest.cpp:
    20-52): per connected component, start a simple random walk at a
    random root; the edge that FIRST enters each vertex joins the tree.
    The walk visits the whole component, so the result spans; first-entry
    edges cannot close a cycle, so it is a tree; Aldous-Broder samples
    uniformly among all spanning trees of the component.

    Fixture-tier driver-sequential like dynamic_forest_fire (adjacency in
    Python sets, one seeded RNG) — the walk is inherently sequential (the
    reference is too; its own skip rationale here for three rounds). The
    neighbor draw is uniform over the DISTINCT sorted neighbor list; the
    reference draws over its adjacency array — identical distribution on
    simple graphs. Components are processed in min-node-id order and the
    per-component root uses the reference's integer(size-1) draw shape,
    so one seed fixes the whole forest."""
    import numpy as np

    require_fixture_scale(graph, max_m, "random_spanning_forest")
    spark = graph.vertices.sparkSession
    adj, comps = _collect_walk_state(graph)
    rng = np.random.default_rng(seed)
    rows = _aldous_broder(adj, comps, rng)
    return spark.createDataFrame(rows, "src long, dst long")


def _collect_walk_state(graph: Graph):
    """Driver-side simple adjacency + component groups for the
    Aldous-Broder samplers (collected ONCE, reused across samples)."""
    from networkit_spark.operators.components import connected_components

    adj: dict[int, list[int]] = {}
    for r in graph.edges.select("src", "dst").distinct().collect():
        u, v = int(r["src"]), int(r["dst"])
        if u != v:
            # undirected simple support in BOTH directions — directed
            # input would otherwise strand the walk on a node whose only
            # incident edges point in (connected_components symmetrizes,
            # so the component says reachable while adj says dead end),
            # same to_undirected contract as max_spanning_forest above
            adj.setdefault(u, []).append(v)
            adj.setdefault(v, []).append(u)
    for u in adj:
        adj[u] = sorted(set(adj[u]))
    comp_of = {
        int(r["id"]): int(r["label"])
        for r in connected_components(graph).collect()
    }
    comps: dict[int, list[int]] = {}
    for node, lab in comp_of.items():
        comps.setdefault(lab, []).append(node)
    return adj, comps


def _aldous_broder(adj, comps, rng) -> list[tuple[int, int]]:
    """One uniform spanning forest (first-entry edges of a random walk per
    component, components in min-label order)."""
    rows: list[tuple[int, int]] = []
    for lab in sorted(comps):
        comp = sorted(comps[lab])
        curr = comp[int(rng.integers(0, len(comp)))]
        visited = {curr}
        steps, cap = 0, 1000 * max(1, len(comp)) ** 3
        while len(visited) < len(comp):
            steps += 1
            if steps > cap:  # cover-time guard: O(n*m) expected, n^3 worst
                raise RuntimeError("random walk exceeded the cover-time cap")
            nbrs = adj.get(curr, [])
            neigh = nbrs[int(rng.integers(0, len(nbrs)))]
            if neigh not in visited:
                rows.append((curr, neigh))
                visited.add(neigh)
            curr = neigh
    return rows


def kruskal_msf(graph: Graph, max_m: int = 200_000) -> DataFrame:
    """forest(u, v, weight), u < v — maximum spanning forest via Kruskal
    (graph/KruskalMSF.cpp:42-70: edges sorted DECREASING by weight, one
    union-find scan). The reference's parallel sort leaves equal weights
    in unspecified order; ties break by (u, v) DESCENDING here — the same
    strict (w, u, v)-max total order max_spanning_forest's per-component
    argmax uses — and under one strict order the maximum spanning forest
    is unique, so the two algorithms return the IDENTICAL forest, not
    just equal total weight (cross-checked in pytest).

    Fixture-tier driver-sequential (the globally sorted union-find scan
    is the algorithm); max_spanning_forest's superstep Boruvka is the
    distributed path."""
    require_fixture_scale(graph, max_m, "kruskal_msf")
    spark = graph.vertices.sparkSession
    canon = {}
    for r in graph.edges.select("src", "dst", "weight").collect():
        u, v = int(r["src"]), int(r["dst"])
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        w = float(r["weight"])
        if key not in canon or w > canon[key]:
            canon[key] = w
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    for (u, v), w in sorted(
        canon.items(), key=lambda kv: (kv[1], kv[0]), reverse=True
    ):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            rows.append((u, v, w))
    return spark.createDataFrame(sorted(rows), "u long, v long, weight double")


def approx_spanning_edge(
    graph: Graph, eps: float = 0.1, seed: int = 42, max_samples: int = 5000
) -> DataFrame:
    """(u, v, score), u < v — epsilon-approximate spanning-edge centrality
    by UST sampling (centrality/ApproxSpanningEdge.cpp:24-130): score(e) =
    fraction of sampled uniform spanning forests containing e, with the
    reference's Hoeffding sample count ceil(ln(2m/delta) / (2 eps^2)),
    delta = 1/n. The reference samples USTs with Wilson's loop-erased
    walk; this port samples with Aldous-Broder (random_spanning_forest's
    kernel) — both draw EXACTLY uniform spanning trees, so the estimator
    and its guarantee are unchanged (documented sampler swap).
    ``max_samples`` caps the driver loop (raise eps rather than exceed
    it). Fixture-tier like random_spanning_forest; the JL-sketch
    estimator (`centrality_spanning_edge`, oracle-checked) is the
    distributed approximation of the same quantity."""
    import math as _math

    import numpy as np

    spark = graph.vertices.sparkSession
    n = graph.num_nodes()
    m = graph.num_edges()
    if n == 0 or m == 0:
        return spark.createDataFrame([], "u long, v long, score double")
    n_samples = int(_math.ceil(_math.log(2.0 * m * n) / (2.0 * eps * eps)))
    if n_samples > max_samples:
        raise ValueError(
            f"eps={eps} needs {n_samples} samples > max_samples={max_samples}; "
            "raise eps or max_samples"
        )
    adj, comps = _collect_walk_state(graph)
    rng = np.random.default_rng(seed)
    counts: dict[tuple[int, int], int] = {}
    for _ in range(n_samples):
        for a, b in _aldous_broder(adj, comps, rng):
            counts[(min(a, b), max(a, b))] = counts.get((min(a, b), max(a, b)), 0) + 1
    rows = [
        (u, v, counts.get((u, v), 0) / n_samples)
        for u in sorted(adj)
        for v in adj[u]
        if u < v
    ]
    return spark.createDataFrame(rows, "u long, v long, score double")


def wilson_spanning_forest(
    graph: Graph, seed: int = 42, max_m: int = 200_000
) -> DataFrame:
    """(src, dst) tree edges — uniform random spanning forest via
    Wilson's loop-erased random walks (the sampler inside
    centrality/ApproxSpanningEdge.cpp:43-110 sampleUST): per component,
    root the tree at the minimum node id; for every remaining vertex in
    ascending order, walk uniformly until hitting the tree while
    overwriting a parent pointer per visited vertex (the overwrite IS the
    loop erasure), then commit the surviving parent path. Samples exactly
    uniformly over spanning trees — the same distribution as the
    Aldous-Broder kernel (random_spanning_forest), via the reference's
    other sampler.

    Fixture-tier driver-sequential like random_spanning_forest (the walk
    is inherently sequential; the reference runs it per thread). Neighbor
    draws are uniform over the DISTINCT sorted neighbor list
    (getIthNeighborWithId draws over the adjacency array — identical on
    simple graphs); the reference walks inside biconnected components
    with a size-3 fast path, a decomposition that only re-batches the
    walks without changing the sampled tree distribution, so this port
    walks whole components."""
    import numpy as np

    require_fixture_scale(graph, max_m, "wilson_spanning_forest")
    spark = graph.vertices.sparkSession
    adj, comps = _collect_walk_state(graph)
    rng = np.random.default_rng(seed)
    rows: list[tuple[int, int]] = []
    for lab in sorted(comps):
        nodes = sorted(comps[lab])
        root = nodes[0]
        in_tree = {root}
        parent: dict[int, int] = {}
        for start in nodes[1:]:
            if start in in_tree:
                continue
            cur = start
            while cur not in in_tree:
                nbrs = adj.get(cur, [])
                nxt = nbrs[int(rng.integers(0, len(nbrs)))]
                parent[cur] = nxt  # overwrite = loop erasure
                cur = nxt
            cur = start
            while cur not in in_tree:
                rows.append((cur, parent[cur]))
                in_tree.add(cur)
                cur = parent[cur]
    return spark.createDataFrame(rows, "src long, dst long")
