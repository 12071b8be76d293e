"""Dynamic graph generators — GraphEvent streams (ref: networkit/cpp/
generators/Dynamic*.cpp + DynamicGraphSource.cpp).

The reference's dynamic generators emit `std::vector<GraphEvent>` batches
(NODE_ADDITION / EDGE_ADDITION / TIME_STEP) that DynAlgorithm consumers
fold through GraphUpdater. Spark-native shape: one DataFrame of rows
(t, etype, u, v, w) where ``t`` is the reference's TIME_STEP counter made
an explicit column (the stream is set-oriented, so ordering lives in data,
not row order). Any prefix-by-``t`` filter + ``apply_events`` replays the
generator to that step — the streaming module's Dyn* updaters consume
per-step batches the same way.

Derandomization follows the static generators' rule: every draw is a pure
function of (seed, step index) so the same (seed, params) yield the same
stream at any parallelism. For Dorogovtsev-Mendes and Barabasi-Albert the
event stream REPLAYS the static generator's construction (same seed =>
folding the stream equals the static graph — tested), which resolves the
sequential pick chains by the same distributed pointer-halving instead of
the reference's stateful RNG (documented deviation; stream shape and model
semantics match, the RNG sequence does not).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import EDGE_SCHEMA, Graph
from networkit_spark.sources.generators import _dm_attach, barabasi_albert

EVENTS_T_SCHEMA = "t long, etype string, u long, v long, w float"


def _node_adds(df: DataFrame, t, u) -> DataFrame:
    return df.select(
        t.cast("long").alias("t"),
        F.lit("NODE_ADD").alias("etype"),
        u.cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("float").alias("w"),
    )


def _edge_adds(df: DataFrame, t, u, v, w=None) -> DataFrame:
    return df.select(
        t.cast("long").alias("t"),
        F.lit("EDGE_ADD").alias("etype"),
        u.cast("long").alias("u"),
        v.cast("long").alias("v"),
        (F.lit(1.0) if w is None else w).cast("float").alias("w"),
    )


def fold_events(spark: SparkSession, events: DataFrame, directed: bool = False,
                up_to: int | None = None, stepwise: bool = False) -> Graph:
    """Replay a (t, etype, u, v, w) stream into a Graph — the GraphUpdater
    fold (dynamics/GraphUpdater.cpp) from an empty graph, optionally only
    the prefix t <= up_to.

    Default is ONE set-oriented apply_events over the whole prefix —
    exact for streams that never re-add a previously removed node/edge
    (all the replay generators above emit additions only). Streams with
    churn (dynamic_pub_web: an edge can be removed at step t and become
    eligible again later) need ``stepwise=True``, which folds one t-batch
    at a time exactly like the reference's sequential GraphUpdater,
    checkpointing between steps to keep the plan bounded."""
    from networkit_spark.streaming.graph_events import apply_events

    if up_to is not None:
        events = events.filter(F.col("t") <= up_to)
    g = Graph(
        spark.createDataFrame([], "id long"),
        spark.createDataFrame([], EDGE_SCHEMA),
        directed=directed,
        weighted=False,
    )
    if not stepwise:
        # apply_events treats a batch as simultaneous; honor stream order
        # for weight updates by pre-reducing last-wins on t (a GEXF edge
        # with several weight attvalues emits one update per t — only the
        # latest in the folded prefix may survive)
        ev = events.select("t", "etype", "u", "v", "w")
        last_upd = (
            ev.filter("etype = 'EDGE_WEIGHT_UPDATE'")
            .groupBy("u", "v")
            .agg(F.max_by("w", "t").cast("float").alias("w"))
            .select(F.lit("EDGE_WEIGHT_UPDATE").alias("etype"), "u", "v", "w")
        )
        others = ev.filter("etype <> 'EDGE_WEIGHT_UPDATE'").select(
            "etype", "u", "v", "w"
        )
        return apply_events(g, others.unionByName(last_upd))
    events = events.localCheckpoint(eager=True)
    steps = sorted(r["t"] for r in events.select("t").distinct().collect())
    for t in steps:
        batch = events.filter(F.col("t") == t).select("etype", "u", "v", "w")
        g = apply_events(g, batch)
        g = Graph(
            g.vertices.localCheckpoint(eager=True),
            g.edges.localCheckpoint(eager=True),
            g.directed,
            g.weighted,
        )
    return g


def dynamic_path(spark: SparkSession, n_steps: int) -> DataFrame:
    """generators/DynamicPathGenerator.cpp:13-29: node 0 at t=0; each step
    t adds node t and edge (t-1, t). Pure expr."""
    first = _node_adds(spark.range(1), F.lit(0), F.col("id"))
    steps = spark.range(1, n_steps + 1)
    return first.unionByName(
        _node_adds(steps, F.col("id"), F.col("id"))
    ).unionByName(
        _edge_adds(steps, F.col("id"), F.col("id") - 1, F.col("id"))
    )


def dynamic_dorogovtsev_mendes(
    spark: SparkSession, n_steps: int, seed: int = 42
) -> DataFrame:
    """generators/DynamicDorogovtsevMendesGenerator.cpp:15-54: t=0 emits
    the seed triangle; step t >= 1 adds node t+2 and connects it to both
    endpoints of a uniformly picked existing edge. Event stream derived
    from the static generator's attach table (same seed => fold == static
    graph)."""
    n = n_steps + 3
    tri_nodes = _node_adds(spark.range(3), F.lit(0), F.col("id"))
    tri_edges = _edge_adds(
        spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "a long, b long"),
        F.lit(0), F.col("a"), F.col("b"),
    )
    if n_steps <= 0:
        return tri_nodes.unionByName(tri_edges)
    attach = _dm_attach(spark, n, seed)  # two rows (a, val) per node a >= 3
    new_nodes = _node_adds(spark.range(3, n), F.col("id") - 2, F.col("id"))
    new_edges = _edge_adds(attach, F.col("a") - 2, F.col("a"), F.col("val"))
    return tri_nodes.unionByName(tri_edges).unionByName(new_nodes).unionByName(new_edges)


def dynamic_barabasi_albert(
    spark: SparkSession, k: int, n_steps: int, seed: int = 42
) -> DataFrame:
    """generators/DynamicBarabasiAlbertGenerator.cpp: each step attaches a
    new node to k existing nodes with degree-proportional probability.
    Event stream = replay of the static Batagelj-Brandes construction
    (barabasi_albert, same seed): node u arrives at t=u with its surviving
    attach edges (self-copies collapse exactly as in the static path, so
    fold == static graph — the documented deviation from the reference's
    stateful RNG)."""
    g = barabasi_albert(spark, k, n_steps, seed)
    # undirected edges are stored symmetrized; the canonical (src < dst)
    # half has dst == the later (attaching) node by construction
    half = g.edges.filter(F.col("src") < F.col("dst"))
    nodes = _node_adds(spark.range(n_steps), F.col("id"), F.col("id"))
    edges = _edge_adds(half, F.col("dst"), F.col("dst"), F.col("src"))
    return nodes.unionByName(edges)


def dynamic_forest_fire(
    spark: SparkSession,
    n_steps: int,
    p: float,
    directed: bool = False,
    r: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """generators/DynamicForestFireGenerator.cpp:26-135: each step adds a
    node, picks a random ambassador, burns outward BFS-style (geometric
    out-edge batches with prob p, in-edges with p*r when directed) and
    connects the new node to every burned node.

    The burn frontier depends on every edge added by every earlier step —
    an inherently sequential process (the reference mutates G mid-stream).
    Driver-sequential fixture-tier implementation like havel_hakimi:
    adjacency kept in Python sets, draws from a seeded deterministic RNG;
    intended for dynamics-test fixtures, not at-scale generation."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out_adj: list[set[int]] = [set()]  # node 0, no edges (firstCall seed)
    in_adj: list[set[int]] = [set()]
    rows = [(0, "NODE_ADD", 0, None, None)]

    def select_edges(w: int, prob: float, nbrs: set[int], visited: set[int]) -> set[int]:
        valid = sorted(x for x in nbrs if x not in visited)
        picked: set[int] = set()
        while valid and rng.random() <= prob:
            i = int(rng.integers(0, len(valid)))
            picked.add(valid[i])
            valid[i] = valid[-1]
            valid.pop()
        return picked

    for step in range(1, n_steps + 1):
        v = len(out_adj)
        a = int(rng.integers(0, v))  # ambassador among existing nodes
        rows.append((step, "NODE_ADD", v, None, None))
        out_adj.append(set())
        in_adj.append(set())
        visited = {a}
        queue = [a]
        burned = [a]
        while queue:
            w = queue.pop(0)
            nxt = select_edges(w, p, out_adj[w], visited)
            if directed:
                nxt |= select_edges(w, p * r, in_adj[w], visited)
            for x in sorted(nxt):
                visited.add(x)
                queue.append(x)
                burned.append(x)
        for w in burned:
            rows.append((step, "EDGE_ADD", v, w, 1.0))
            out_adj[v].add(w)
            in_adj[w].add(v)
            if not directed:
                out_adj[w].add(v)
                in_adj[v].add(w)
    return spark.createDataFrame(rows, EVENTS_T_SCHEMA)


def dynamic_pub_web(
    spark: SparkSession,
    n: int,
    n_steps: int,
    num_dense_areas: int = 4,
    neighborhood_radius: float = 0.15,
    max_neighbors: int = 8,
    churn: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """generators/DynamicPubWebGenerator.cpp:24-180 — dynamic PubWeb event
    stream: t=0 writes the initial graph (writeInitialGraphToStream), each
    later step deletes floor(n*churn) nodes with their incident edges,
    inserts as many fresh nodes at new PubWeb positions, then recomputes
    the eligible-edge set (mutual <=max_neighbors nearest within the torus
    radius, weight BASE_WEIGHT/d2 — _pubweb_eligible) over the CURRENT
    points and emits the diff: EDGE_REMOVE for no-longer-eligible edges,
    EDGE_WEIGHT_UPDATE for every surviving eligible edge (the reference
    re-weights all survivors each step, cpp:134-147), EDGE_ADD for new
    pairs. Derandomized: deletions are the lowest floor(n*churn) ids by a
    per-step hash, insert positions reuse the static position law with a
    per-step tag (documented deviation: the reference draws insert areas
    uniformly over areas+noise, cpp:77-99; this port keeps the initial
    70/30 mixture — same model family, different mixture constant).

    Driver-sequential over steps, distributed within each step (the
    DynamicForestFire fixture tier); every per-step state DataFrame is
    localCheckpointed so plans stay bounded. Folding the stream prefix
    with fold_events reproduces the step-t graph exactly (tested)."""
    from networkit_spark.sources.generators import (
        _pubweb_eligible,
        _pubweb_points,
        _torus_points,
    )

    centers = _torus_points(spark, num_dense_areas, seed, "pwc").localCheckpoint(
        eager=True
    )
    pts = _pubweb_points(
        spark.range(n).select(F.col("id").cast("long")),
        centers,
        num_dense_areas,
        seed,
        "dpw0",
    ).localCheckpoint(eager=True)
    e_prev = _pubweb_eligible(
        pts, neighborhood_radius, max_neighbors
    ).localCheckpoint(eager=True)

    null_l = F.lit(None).cast("long")
    null_f = F.lit(None).cast("float")

    def _ev(t: int, etype: str, u, v, w) -> list:
        return [
            F.lit(t).cast("long").alias("t"),
            F.lit(etype).alias("etype"),
            u.cast("long").alias("u"),
            v.cast("long").alias("v"),
            w.cast("float").alias("w"),
        ]

    batches = [
        pts.select(*_ev(0, "NODE_ADD", F.col("id"), null_l, null_f)),
        e_prev.select(*_ev(0, "EDGE_ADD", F.col("src"), F.col("dst"), F.col("weight"))),
    ]
    n_churn = int(n * churn)
    next_id = n
    for t in range(1, n_steps + 1):
        dele = (
            pts.select(
                "id",
                F.xxhash64(F.lit(seed), F.lit(f"dpwdel{t}"), F.col("id")).alias("h"),
            )
            .orderBy("h", "id")
            .limit(n_churn)
            .select("id")
            .localCheckpoint(eager=True)
        )
        new_ids = spark.range(next_id, next_id + n_churn).select(
            F.col("id").cast("long")
        )
        next_id += n_churn
        new_pts = _pubweb_points(new_ids, centers, num_dense_areas, seed, f"dpw{t}")
        pts = (
            pts.join(dele, "id", "anti").unionByName(new_pts).localCheckpoint(eager=True)
        )
        e_new = _pubweb_eligible(
            pts, neighborhood_radius, max_neighbors
        ).localCheckpoint(eager=True)

        gone_src = dele.withColumnRenamed("id", "src")
        gone_dst = dele.withColumnRenamed("id", "dst")
        incident = e_prev.join(gone_src, "src", "semi").unionByName(
            e_prev.join(gone_src, "src", "anti").join(gone_dst, "dst", "semi")
        )
        survivors = e_prev.join(gone_src, "src", "anti").join(gone_dst, "dst", "anti")
        still = survivors.select("src", "dst").join(
            e_new.withColumnRenamed("weight", "w2"), ["src", "dst"]
        )
        dropped = survivors.join(e_new.select("src", "dst"), ["src", "dst"], "anti")
        added = e_new.join(survivors.select("src", "dst"), ["src", "dst"], "anti")

        batches.extend(
            [
                incident.select(*_ev(t, "EDGE_REMOVE", F.col("src"), F.col("dst"), null_f)),
                dele.select(*_ev(t, "NODE_REMOVE", F.col("id"), null_l, null_f)),
                new_ids.select(*_ev(t, "NODE_ADD", F.col("id"), null_l, null_f)),
                dropped.select(*_ev(t, "EDGE_REMOVE", F.col("src"), F.col("dst"), null_f)),
                still.select(
                    *_ev(t, "EDGE_WEIGHT_UPDATE", F.col("src"), F.col("dst"), F.col("w2"))
                ),
                added.select(*_ev(t, "EDGE_ADD", F.col("src"), F.col("dst"), F.col("weight"))),
            ]
        )
        e_prev = e_new

    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out.localCheckpoint(eager=True)


def dynamic_hyperbolic(
    spark: SparkSession,
    n: int,
    n_steps: int,
    R: float,
    alpha: float = 1.0,
    move_each_step: float = 0.3,
    move_distance: float = 0.05,
    seed: int = 42,
    angular_buckets: int = 64,
) -> DataFrame:
    """generators/DynamicHyperbolicGenerator.cpp (T=0 threshold regime) —
    node-MOVEMENT dynamic generator: t=0 writes the initial threshold
    hyperbolic graph; each step a hash-selected ~move_each_step fraction
    of nodes moves (cpp:263-265 Aux::Random::real < moveEachStep,
    derandomized), with the reference's exact moveNode kinematics
    (cpp:169-211): radial drift in cosh-CDF space with boundary bounce and
    center crossing (both flip the node's radial-movement sign — per-node
    STATE carried in the coordinates table), then angular drift
    amove/new_r wrapped to [0, 2pi). Per-node movement magnitudes are
    U(-d, d) angular and U(-10d, 10d) radial (initializeMovement's
    scale=10, cpp:72-80), hash-derandomized.

    Events per step: the canonical edge-set diff (EDGE_ADD / EDGE_REMOVE)
    of the threshold graph before and after the move — equivalent to the
    reference's per-wiggled-node neighborhood diff after its own
    canonicalize-and-dedup pass (cpp:330-345), since edges between two
    unmoved nodes never change. Fixture-tier note: this rebuilds the full
    edge set per step via the static band join; the reference re-queries
    only wiggled nodes, and a scale path would likewise band-query the
    moved set — same events either way. Fold with stepwise=True (edges
    re-appear when nodes drift back into range)."""
    from networkit_spark.sources.generators import (
        _hyperbolic_coords,
        _hyperbolic_edges,
        _u01,
    )

    maxcdf = math.cosh(alpha * R)
    coords = _hyperbolic_coords(spark, n, R, alpha, seed)
    state = coords.select(
        "id",
        "theta",
        "r",
        ((_u01(seed, F.lit("dham"), F.col("id")) - 0.5) * 2.0 * move_distance).alias(
            "amove"
        ),
        (
            (_u01(seed, F.lit("dhrm"), F.col("id")) - 0.5) * 2.0 * 10.0 * move_distance
        ).alias("rmove"),
    ).localCheckpoint(eager=True)
    e_prev = _hyperbolic_edges(
        state.select("id", "theta", "r"), R, angular_buckets
    ).localCheckpoint(eager=True)

    null_l = F.lit(None).cast("long")
    null_f = F.lit(None).cast("float")

    def _ev(t: int, etype: str, u, v, w) -> list:
        return [
            F.lit(t).cast("long").alias("t"),
            F.lit(etype).alias("etype"),
            u.cast("long").alias("u"),
            v.cast("long").alias("v"),
            w.cast("float").alias("w"),
        ]

    batches = [
        state.select(*_ev(0, "NODE_ADD", F.col("id"), null_l, null_f)),
        e_prev.select(*_ev(0, "EDGE_ADD", F.col("src"), F.col("dst"), F.col("weight"))),
    ]
    two_pi = 2.0 * math.pi
    for t in range(1, n_steps + 1):
        moved = _u01(seed, F.lit(f"dhmv{t}"), F.col("id")) < move_each_step
        newcosh0 = F.cosh(F.lit(alpha) * F.col("r")) + F.lit(alpha) * F.col("rmove")
        hi = newcosh0 > maxcdf
        newcosh1 = F.when(hi, 2.0 * maxcdf - newcosh0).otherwise(newcosh0)
        lo = newcosh1 < 1.0
        newcosh2 = F.when(lo, 2.0 - newcosh1).otherwise(newcosh1)
        crossed_phi = F.when(
            F.col("theta") > math.pi, F.col("theta") - math.pi
        ).otherwise(F.col("theta") + math.pi)
        phi0 = F.when(lo, crossed_phi).otherwise(F.col("theta"))
        new_r = F.least(
            F.acosh(F.greatest(newcosh2, F.lit(1.0))) / F.lit(alpha),
            F.lit(R - 1e-12),
        )
        new_phi = F.pmod(phi0 + F.col("amove") / new_r, F.lit(two_pi))
        new_rmove = F.when(hi | lo, -F.col("rmove")).otherwise(F.col("rmove"))
        state = state.select(
            "id",
            F.when(moved, new_phi).otherwise(F.col("theta")).alias("theta"),
            F.when(moved, new_r).otherwise(F.col("r")).alias("r"),
            "amove",
            F.when(moved, new_rmove).otherwise(F.col("rmove")).alias("rmove"),
        ).localCheckpoint(eager=True)
        e_new = _hyperbolic_edges(
            state.select("id", "theta", "r"), R, angular_buckets
        ).localCheckpoint(eager=True)
        added = e_new.join(e_prev.select("src", "dst"), ["src", "dst"], "anti")
        removed = e_prev.join(e_new.select("src", "dst"), ["src", "dst"], "anti")
        batches.extend(
            [
                added.select(*_ev(t, "EDGE_ADD", F.col("src"), F.col("dst"), F.col("weight"))),
                removed.select(*_ev(t, "EDGE_REMOVE", F.col("src"), F.col("dst"), null_f)),
            ]
        )
        e_prev = e_new

    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out.localCheckpoint(eager=True)
