"""Link-prediction evaluation harness — holdout split, candidate finder,
predictors, ROC-AUC / precision@k.

Reference pipeline (networkit/cpp/linkprediction/):
  * RandomLinkSampler.cpp:16-33 — remove random edges to form a training
    graph. Here the holdout is HASH-DERANDOMIZED and shuffle-free: an edge
    is a test edge iff md5(seed, u, v) mod 1000 < test_per_mille — a pure
    per-row filter (no global sort, no sequential removal), identical in
    the DuckDB oracle, and the exact distributed analogue of "remove a
    uniformly random ~p fraction".
  * MissingLinksFinder.cpp:19-42 findAtDistance(2) — candidate pairs u < v
    at distance exactly 2 in the training graph: one hinge self-join
    (shared neighbor) minus the training edges. Hinge vertices with degree
    > max_hinge_degree are excluded — the repo's standard hub guard
    (operators/linkprediction.py) bounding the join at hub vertices; both
    candidate generation and common-neighbor scores use the capped hinges
    so the oracle replays the identical set.
  * KatzIndex.cpp:36-61 — bounded-length damped walk counts; for
    non-adjacent candidates walks of length 1 are zero, so with
    maxPathLength=3 the score is beta^2*walks2 + beta^3*walks3, computed
    as two edge joins restricted (semi-join) to the candidate endpoints.
  * ROCMetric.cpp / PrecisionRecallMetric.cpp / EvaluationMetric.cpp —
    curve + trapezoid AUC over score thresholds. Documented deviation: the
    reference thresholds at ~numThresholds percentile ranks; we evaluate
    EVERY distinct score (the exact full curve), for which the trapezoid
    ROC-AUC collapses to the Mann-Whitney form
        AUC = [ sum_pos (#neg below + 0.5 #neg tied) ] / (P * N),
    emitted as an exact integer numerator/denominator pair (cross-engine
    bit-equal) plus the double ratio. Precision@k replaces the PR curve's
    point list with its standard scalar (top-k by score desc, id-ordered
    tie-break).

Scale: the split is a per-row filter; candidates/scores are one capped
hinge aggregation; the AUC needs one cumulative sum over the DISTINCT
score table (integer common-neighbor counts, so O(max capped degree)
rows), computed with functions.ordering.global_cumsum — no single-task
sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.graph import Graph
from networkit_spark.plans.checkpoint import materialize


def holdout_split(
    graph: Graph, test_per_mille: int = 300, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """(train, test) canonical (u < v) edge DataFrames — hash-bucket split."""
    g = graph.to_undirected() if graph.directed else graph
    canon = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    b = F.expr(
        md5_long_sql(
            f"('{seed}:lps:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
        )
    ) % 1000
    marked = canon.withColumn("_b", b)
    train = materialize(marked.filter(F.col("_b") >= test_per_mille).select("u", "v"))
    test = materialize(marked.filter(F.col("_b") < test_per_mille).select("u", "v"))
    return train, test


def _sym(canon: DataFrame) -> DataFrame:
    return canon.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        canon.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )


def candidate_scores(train: DataFrame, max_hinge_degree: int = 64) -> DataFrame:
    """(u, v, score) for every pair at distance exactly 2 in the training
    graph through a hinge of degree <= max_hinge_degree; score = number of
    such shared (capped) neighbors — the common-neighbors index restricted
    to the candidate set (MissingLinksFinder k=2 + CommonNeighborsIndex)."""
    sym = _sym(train)
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    hinges = sym.join(deg, "a").filter(F.col("d") <= max_hinge_degree)
    pairs = (
        hinges.select(F.col("a").alias("m"), F.col("b").alias("u"))
        .join(
            hinges.select(F.col("a").alias("m"), F.col("b").alias("v")), "m"
        )
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("score"))
    )
    return materialize(pairs.join(train, ["u", "v"], "anti"))


def katz_scores(
    train: DataFrame, candidates: DataFrame, beta: float = 0.005
) -> DataFrame:
    """(u, v, walks2, walks3, score) — KatzIndex.cpp:36-61 with
    maxPathLength=3 on the candidate (non-adjacent) pairs: walks1 = 0, so
    score = beta^2*walks2 + beta^3*walks3. Walk counts allow revisits,
    exactly like the reference's per-level neighbor-hit accumulation."""
    sym = materialize(_sym(train))
    cand = candidates.select("u", "v")
    w2 = (
        sym.withColumnRenamed("a", "u")
        .join(cand.select("u").distinct(), "u")
        .join(
            sym.select(F.col("a").alias("v"), F.col("b")),
            "b",
        )
        .join(cand, ["u", "v"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("walks2"))
    )
    # u -> x -> y -> v
    two_step = (
        sym.select(F.col("a").alias("u"), F.col("b").alias("x"))
        .join(cand.select("u").distinct(), "u")
        .join(sym.select(F.col("a").alias("x"), F.col("b").alias("y")), "x")
        .groupBy("u", "y")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    w3 = (
        two_step.join(
            sym.select(F.col("a").alias("y"), F.col("b").alias("v")), "y"
        )
        .join(cand, ["u", "v"])
        .groupBy("u", "v")
        .agg(F.sum("n2").cast("long").alias("walks3"))
    )
    return (
        cand.join(w2, ["u", "v"], "left")
        .join(w3, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce("walks2", F.lit(0)).alias("walks2"),
            F.coalesce("walks3", F.lit(0)).alias("walks3"),
        )
        .withColumn(
            "score",
            F.lit(beta) * F.lit(beta) * F.col("walks2").cast("double")
            + F.lit(beta) * F.lit(beta) * F.lit(beta) * F.col("walks3").cast("double"),
        )
    )


def roc_auc_summary(
    predictions: DataFrame,
    test: DataFrame,
    train: DataFrame,
    k: int = 50,
) -> DataFrame:
    """One row: counts + exact ROC-AUC (integer numerator/denominator +
    double ratio) + precision@k. Positives = candidate pairs present in
    the held-out test set."""
    spark = predictions.sparkSession
    n_train = train.count()
    n_test = test.count()
    preds = materialize(
        predictions.join(
            test.withColumn("_pos", F.lit(1)), ["u", "v"], "left"
        ).select("u", "v", "score", F.coalesce("_pos", F.lit(0)).alias("pos"))
    )
    n_cand = preds.count()
    s_tab = preds.groupBy("score").agg(
        F.sum("pos").cast("long").alias("pos_c"),
        F.sum(1 - F.col("pos")).cast("long").alias("neg_c"),
    )
    from networkit_spark.functions.ordering import global_cumsum

    cum = global_cumsum(s_tab, ["score"], ["neg_c"])
    agg = cum.agg(
        F.sum("pos_c").alias("p"),
        F.sum("neg_c").alias("n"),
        F.sum(
            F.col("pos_c")
            * (2 * (F.col("cum_neg_c") - F.col("neg_c")) + F.col("neg_c"))
        ).alias("num"),
    ).first()
    p, n, num = int(agg["p"] or 0), int(agg["n"] or 0), int(agg["num"] or 0)
    den = 2 * p * n
    topk = preds.orderBy(F.col("score").desc(), "u", "v").limit(k)
    tp_k = topk.agg(F.sum("pos")).first()[0] or 0
    k_eff = min(k, n_cand)
    return spark.createDataFrame(
        [
            (
                int(n_train),
                int(n_test),
                int(n_cand),
                p,
                num,
                den,
                (float(num) / float(den)) if den else None,
                int(tp_k),
                (float(tp_k) / float(k_eff)) if k_eff else None,
            )
        ],
        "n_train bigint, n_test bigint, n_candidates bigint, n_positives bigint, "
        "auc_num bigint, auc_den bigint, auc double, tp_at_k bigint, "
        "precision_at_k double",
    )
