"""Louvain-style local moving for the map equation (Infomap objective).

Reference: networkit/cpp/community/LouvainMapEquation.cpp —
fitnessChange (:322-365) scores moving u from its cluster to a neighbor
cluster by the change in the two-level map equation
    L = plogp(totalCut) - 2 sum_c plogp(cut_c) + sum_c plogp(cut_c+vol_c)
      - sum_c plogp(vol_c),          plogp(x) = (x/totVol) * ln(x/totVol)
(:506-528); a node moves when the best neighbor-cluster change is
STRICTLY below the stay change, ties to the smallest cluster id
(:285-296).  vol(u) counts self-loops twice, loop(u) once, cluster cut /
volume / totalCut update by the closed-form cut differences (:328-345).

Distributed schedule: the reference's ``Synchronous`` parallelization
evaluates moves against sweep-start cluster statistics and applies them
in bulk (:130-195).  Here that is taken to its clean fixed point: ONE
subround per sweep — every vertex scores against the sweep-start stats
(cluster volume / cut / total cut recomputed from the label table, no
incremental bookkeeping to race) and all winning moves apply at once.
Node visit order therefore cannot matter, which is what makes the DuckDB
oracle an exact replay; the reference instead shuffles node order and
chunks subrounds by thread count (machine-dependent), so trajectories
differ while the objective and move rule are identical — the same trade
documented for synchronous PLP/PLM.

Scale notes: each sweep is the standard superstep shape — one edge join
against the label table, two label-keyed aggregations (cluster stats), a
(node, neighbor-cluster) aggregation bounded by m rows, and a per-node
top-1 window whose partitions are node-sized.  Nothing vertex-sized is
broadcast or collected; totalCut/totalVolume ride along as one-row
cross-joined columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import IterationState, materialize


def _plogp(x, tv):
    p = x / tv
    return F.when(x > 0, p * F.log(p)).otherwise(F.lit(0.0))


def louvain_map_equation(
    graph: Graph, max_sweeps: int = 32, pinned: bool = False
) -> DataFrame:
    """(id, label) — map-equation local moving from singletons.

    ``pinned=True`` runs exactly max_sweeps sweeps with no early-exit
    action (the oracle-checkable mode); otherwise stops when a sweep
    moves no node.
    """
    g = graph.to_undirected() if graph.directed else graph
    adj = materialize(
        g.edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    )
    # vol counts loops twice (rows store loops once), loop once
    nodestats = materialize(
        adj.groupBy(F.col("src").alias("id")).agg(
            F.sum(
                F.when(F.col("src") == F.col("dst"), F.col("w") * 2).otherwise(
                    F.col("w")
                )
            ).alias("vol"),
            F.coalesce(
                F.sum(F.when(F.col("src") == F.col("dst"), F.col("w"))),
                F.lit(0.0),
            ).alias("loop"),
        )
    )
    tv = float(
        adj.agg(
            F.sum(
                F.when(F.col("src") == F.col("dst"), F.col("w") * 2).otherwise(
                    F.col("w")
                )
            )
        ).first()[0]
        or 0.0
    )

    labels = materialize(nodestats.select("id", F.col("id").alias("label")))

    state = IterationState(None, "mapeq")
    for t in range(1, max_sweeps + 1):
        lu = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
        lv = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
        rows = adj.join(lu, "src").join(lv, "dst")

        cstats = (
            labels.join(nodestats, "id")
            .groupBy("label")
            .agg(F.sum("vol").alias("cvol"))
            .join(
                rows.filter(
                    (F.col("src") != F.col("dst")) & (F.col("lu") != F.col("lv"))
                )
                .groupBy(F.col("lu").alias("label"))
                .agg(F.sum("w").alias("ccut")),
                "label",
                "left",
            )
            .select("label", "cvol", F.coalesce("ccut", F.lit(0.0)).alias("ccut"))
        )
        cstats = materialize(cstats)
        tot = cstats.agg(F.sum("ccut").alias("tot"))

        w2c = (
            rows.filter(
                (F.col("src") != F.col("dst")) & (F.col("lu") == F.col("lv"))
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("w").alias("w2c"))
        )
        w2t = (
            rows.filter(
                (F.col("src") != F.col("dst")) & (F.col("lu") != F.col("lv"))
            )
            .groupBy(F.col("src").alias("id"), F.col("lv").alias("tgt"))
            .agg(F.sum("w").alias("w2t"))
        )

        base = (
            labels.join(nodestats, "id")
            .join(w2c, "id", "left")
            .select(
                "id",
                "label",
                "vol",
                "loop",
                F.coalesce("w2c", F.lit(0.0)).alias("w2c"),
            )
            .join(
                cstats.select(
                    F.col("label"),
                    F.col("cvol").alias("vol_cur"),
                    F.col("ccut").alias("cut_cur"),
                ),
                "label",
            )
            .crossJoin(tot)
        )

        cdc = 2 * F.col("w2c") - F.col("vol") + 2 * F.col("loop")
        TV = F.lit(tv)
        stay = base.select(
            "id",
            "label",
            "vol",
            "loop",
            "w2c",
            "cut_cur",
            "vol_cur",
            "tot",
            (
                _plogp(F.col("tot"), TV)
                + (
                    _plogp(F.col("cut_cur") + F.col("vol_cur"), TV)
                    - _plogp(
                        F.col("cut_cur") + cdc + F.col("vol_cur") - F.col("vol"), TV
                    )
                )
                - 2
                * (
                    _plogp(F.col("cut_cur"), TV)
                    - _plogp(F.col("cut_cur") + cdc, TV)
                )
            ).alias("stay_change"),
        )

        cdt = F.col("vol") - 2 * F.col("w2t") - 2 * F.col("loop")
        cand = (
            stay.join(w2t, "id")
            .join(
                cstats.select(
                    F.col("label").alias("tgt"),
                    F.col("cvol").alias("vol_t"),
                    F.col("ccut").alias("cut_t"),
                ),
                "tgt",
            )
            .select(
                "id",
                "tgt",
                "stay_change",
                (
                    _plogp(
                        F.col("tot")
                        + (2 * F.col("w2c") - F.col("vol") + 2 * F.col("loop"))
                        + cdt,
                        TV,
                    )
                    + (
                        _plogp(
                            F.col("cut_t") + cdt + F.col("vol_t") + F.col("vol"), TV
                        )
                        - _plogp(F.col("cut_t") + F.col("vol_t"), TV)
                    )
                    - 2
                    * (
                        _plogp(F.col("cut_t") + cdt, TV)
                        - _plogp(F.col("cut_t"), TV)
                    )
                ).alias("change"),
            )
        )
        w = Window.partitionBy("id").orderBy(F.asc("change"), F.asc("tgt"))
        best = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .filter(F.col("change") < F.col("stay_change"))
            .select("id", F.col("tgt").alias("new_label"))
        )
        labels = state.advance(
            t,
            labels.join(best, "id", "left").select(
                "id", F.coalesce("new_label", "label").alias("label")
            ),
        )
        if not pinned and best.isEmpty():
            break
    state.close()
    return labels.select("id", "label")
