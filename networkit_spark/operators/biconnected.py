"""Biconnected components — distributed BFS-forest Tarjan-Vishkin.

Reference: networkit/cpp/components/BiconnectedComponents.cpp:36-118 — a
sequential Hopcroft-Tarjan DFS with an explicit edge stack. A DFS is
inherently sequential, so this module uses the Tarjan-Vishkin (1985)
reduction instead (documented deviation, same fixed point): biconnected
components are the connected components of an auxiliary graph whose
vertices are the EDGES of G. Rooting a BFS spanning forest — rather than
TV's DFS tree — simplifies the auxiliary rules, because in a BFS tree
every non-tree edge joins two tree-UNRELATED vertices (an ancestor /
descendant non-tree edge would have to span exactly one level, i.e. be a
parent edge): TV rule (ii) never fires and rules (i)+(iii) reduce to

  (i)     for every non-tree edge {x, y}: join parent-edge(x) with
          parent-edge(y) — both lie on the fundamental cycle of {x, y};
  (chain) for every tree edge (v, w) (v = parent): join it with
          (p(v), v) iff up(w) < level(v), where up(w) = min level of
          LCA(x, y) over non-tree edges {x, y} with x in subtree(w) —
          i.e. some fundamental cycle through (v, w) climbs strictly
          above v.

Walking any fundamental cycle shows rule (chain) connects its tree edges
consecutively up to (and not past) the edges below the LCA, and rule (i)
bridges its two branches, so each cycle is fully connected in the
auxiliary graph; conversely every auxiliary edge is witnessed by a cycle
containing both endpoints. Auxiliary connectivity therefore equals the
"lies on a common simple cycle" relation — biconnectivity. Bridges fall
out as singleton auxiliary components, matching the reference where every
bridge is its own component.

Scale shape: every phase is a frontier superstep over O(m) rows — the BFS
forest and the bottom-up up() sweep run one superstep per BFS level, and
the LCA lift runs one superstep per level of imbalance — no path
materialization anywhere. On small-world link graphs depth is O(10), so
this is the same bounded-shuffle ladder as the BFS/CC north stars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.plans.checkpoint import materialize


def _bfs_forest(g: Graph, canon: DataFrame) -> DataFrame:
    """(id, parent, level) rooted BFS forest: one root per connected
    component (the component's min id, from hash-min CC), deterministic
    min-parent tie-break. `parent` is null on roots."""
    sym = materialize(
        canon.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
            canon.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
    )
    labels = connected_components(g)
    roots = labels.filter(F.col("id") == F.col("label")).select("id")
    visited = materialize(
        roots.select(
            "id", F.lit(None).cast("long").alias("parent"), F.lit(0).alias("level")
        )
    )
    frontier = visited.select("id")
    level = 0
    while True:
        level += 1
        nxt = (
            sym.join(frontier.withColumnRenamed("id", "src"), "src")
            .join(visited.select(F.col("id").alias("dst")), "dst", "anti")
            .groupBy("dst")
            .agg(F.min("src").alias("parent"))
            .select(
                F.col("dst").alias("id"), "parent", F.lit(level).alias("level")
            )
        )
        nxt = materialize(nxt)
        if nxt.count() == 0:
            break
        visited = materialize(visited.unionByName(nxt))
        frontier = nxt.select("id")
    return visited


def _lca_levels(nontree: DataFrame, forest: DataFrame) -> DataFrame:
    """(x, y, lca_level) per non-tree edge: lift the deeper endpoint (both
    when level-tied) one tree step per superstep until the walkers meet.
    Rows retire as they finish; at most max-level supersteps remain live."""
    pm = materialize(forest.select("id", "parent", "level"))
    active = materialize(
        nontree.select(
            F.col("u").alias("x"),
            F.col("v").alias("y"),
            F.col("u").alias("ax"),
            F.col("v").alias("ay"),
        )
        .join(pm.select(F.col("id").alias("ax"), F.col("level").alias("la")), "ax")
        .join(pm.select(F.col("id").alias("ay"), F.col("level").alias("lb")), "ay")
    )
    spark = nontree.sparkSession
    done = spark.createDataFrame([], "x long, y long, lca_level long")
    while True:
        finished = active.filter(F.col("ax") == F.col("ay")).select(
            "x", "y", F.col("la").cast("long").alias("lca_level")
        )
        done = materialize(done.unionByName(finished))
        active = active.filter(F.col("ax") != F.col("ay"))
        if active.isEmpty():
            break
        lifted = (
            active.join(
                pm.select(F.col("id").alias("ax"), F.col("parent").alias("pax")),
                "ax",
            )
            .join(
                pm.select(F.col("id").alias("ay"), F.col("parent").alias("pay")),
                "ay",
            )
            .select(
                "x",
                "y",
                F.when(F.col("la") >= F.col("lb"), F.col("pax"))
                .otherwise(F.col("ax"))
                .alias("ax"),
                F.when(F.col("lb") >= F.col("la"), F.col("pay"))
                .otherwise(F.col("ay"))
                .alias("ay"),
                F.when(F.col("la") >= F.col("lb"), F.col("la") - 1)
                .otherwise(F.col("la"))
                .alias("la"),
                F.when(F.col("lb") >= F.col("la"), F.col("lb") - 1)
                .otherwise(F.col("lb"))
                .alias("lb"),
            )
        )
        active = materialize(lifted)
    return done


def biconnected_components(graph: Graph) -> DataFrame:
    """(u, v, component) per canonical simple undirected edge (u < v) —
    component = min tree-edge child id of its auxiliary component, one
    label per biconnected block (bridges are singleton blocks), matching
    componentsOfNode/componentSizes semantics of
    BiconnectedComponents.cpp:112-118 up to label naming (the reference
    numbers blocks in DFS pop order; any consistent labeling induces the
    same edge partition)."""
    g = graph.to_undirected() if graph.directed else graph
    canon = materialize(
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    forest = materialize(_bfs_forest(g, canon))
    tree = forest.filter(F.col("parent").isNotNull()).select(
        F.col("parent").alias("p"), F.col("id").alias("c"), "level"
    )
    tree_canon = tree.select(
        F.least("p", "c").alias("u"), F.greatest("p", "c").alias("v"), "c"
    )
    nontree = materialize(
        canon.join(tree_canon.select("u", "v"), ["u", "v"], "anti")
    )

    # up(w): min LCA level over non-tree edges with an endpoint in
    # subtree(w) — seeded at the endpoints, swept bottom-up one BFS level
    # per superstep (each superstep touches only that level's vertices)
    lca = _lca_levels(nontree, forest)
    seed = (
        lca.select(F.col("x").alias("id"), "lca_level")
        .unionByName(lca.select(F.col("y").alias("id"), "lca_level"))
        .groupBy("id")
        .agg(F.min("lca_level").alias("base"))
    )
    up = materialize(
        forest.join(seed, "id", "left").select(
            "id",
            "parent",
            "level",
            F.coalesce("base", F.lit(None).cast("long")).alias("up"),
        )
    )
    max_level = up.agg(F.max("level")).first()[0] or 0
    for lvl in range(int(max_level), 0, -1):
        contrib = (
            up.filter((F.col("level") == lvl) & F.col("up").isNotNull())
            .groupBy("parent")
            .agg(F.min("up").alias("cup"))
            .withColumnRenamed("parent", "id")
        )
        up = materialize(
            up.join(contrib, "id", "left").select(
                "id",
                "parent",
                "level",
                # least() skips nulls (returns null only when both are)
                F.least("up", "cup").alias("up"),
            )
        )

    # auxiliary graph on tree edges, identified by their child endpoint
    aux_i = nontree.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    aux_chain = (
        tree.join(
            up.select(F.col("id").alias("c"), F.col("up").alias("upc")), "c"
        )
        .join(
            forest.select(
                F.col("id").alias("p"),
                F.col("level").alias("plevel"),
                F.col("parent").alias("pparent"),
            ),
            "p",
        )
        .filter(
            F.col("upc").isNotNull()
            & (F.col("upc") < F.col("plevel"))
            & F.col("pparent").isNotNull()
        )
        .select(F.col("c").alias("src"), F.col("p").alias("dst"))
    )
    children = forest.filter(F.col("parent").isNotNull()).select("id")
    aux_edges = (
        aux_i.unionByName(aux_chain)
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    aux_sym = aux_edges.unionByName(
        aux_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    comp = connected_components(
        Graph(children, aux_sym, directed=False, weighted=False)
    )

    tree_lab = tree_canon.join(
        comp.withColumnRenamed("id", "c"), "c"
    ).select("u", "v", F.col("label").alias("component"))
    # a non-tree edge shares every one of its fundamental cycles with its
    # endpoints' parent edges (rule i), so it inherits either one's label;
    # endpoints are never roots in a BFS forest (a root's only neighbors
    # at level 1 are its tree children)
    nontree_lab = nontree.join(
        comp.withColumnRenamed("id", "u").withColumnRenamed("label", "component"),
        "u",
    ).select("u", "v", "component")
    return materialize(tree_lab.unionByName(nontree_lab))


def biconnected_node_summary(graph: Graph) -> DataFrame:
    """(id, n_comps, is_articulation) — how many biconnected blocks contain
    each vertex (componentsOfNode.size(), BiconnectedComponents.cpp:112-118)
    and whether it is an articulation point (in >1 block). A vertex's
    blocks biject with the connected components of G - v that contain a
    neighbor of v — which is what the SQL oracle recomputes directly."""
    ec = biconnected_components(graph)
    per = (
        ec.select(F.col("u").alias("id"), "component")
        .unionByName(ec.select(F.col("v").alias("id"), "component"))
        .distinct()
        .groupBy("id")
        .agg(F.countDistinct("component").alias("n_comps"))
    )
    return (
        graph.vertices.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("n_comps", F.lit(0)).cast("long").alias("n_comps"),
            (F.coalesce("n_comps", F.lit(0)) > 1).alias("is_articulation"),
        )
    )
