"""Link-prediction evaluation harness: holdout split, distance-2 candidate
finder, Katz walk counts, exact Mann-Whitney ROC-AUC (linkprediction/
RandomLinkSampler.cpp, MissingLinksFinder.cpp, KatzIndex.cpp, ROCMetric.cpp
semantics — see operators/linkpred_eval.py for the documented deviations)."""

import numpy as np

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.linkpred_eval import (
    candidate_scores,
    holdout_split,
    katz_scores,
    roc_auc_summary,
)


def _er_graph(spark, n, m, seed):
    rng = np.random.RandomState(seed)
    es = set()
    while len(es) < m:
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a != b:
            es.add((min(a, b), max(a, b)))
    rows = [(a, b, 1.0) for a, b in sorted(es)]
    return from_edge_rows(spark, rows, num_nodes=n, weighted=True), sorted(es)


def test_holdout_split_partitions_edges(spark):
    g, es = _er_graph(spark, 20, 60, 1)
    train, test = holdout_split(g, test_per_mille=300)
    tr = {(r["u"], r["v"]) for r in train.collect()}
    te = {(r["u"], r["v"]) for r in test.collect()}
    assert tr | te == set(es) and not (tr & te)
    assert 0 < len(te) < len(es)  # 30%-ish, deterministic in the hash
    # deterministic: second call identical
    tr2 = {(r["u"], r["v"]) for r in holdout_split(g, 300)[0].collect()}
    assert tr2 == tr


def test_candidates_are_distance_two_exactly(spark):
    g, es = _er_graph(spark, 16, 30, 2)
    train, _ = holdout_split(g, test_per_mille=300)
    tr = {(r["u"], r["v"]) for r in train.collect()}
    adj = {}
    for u, v in tr:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cand = {(r["u"], r["v"]): r["score"] for r in candidate_scores(train, 1000).collect()}
    want = {}
    for u in adj:
        for v in adj:
            if u < v and v not in adj[u]:
                cn = len(adj[u] & adj[v])
                if cn > 0:
                    want[(u, v)] = cn
    assert cand == want


def test_roc_auc_matches_numpy_referee(spark):
    g, _ = _er_graph(spark, 18, 50, 3)
    train, test = holdout_split(g, test_per_mille=300)
    preds = candidate_scores(train, 1000)
    row = roc_auc_summary(preds, test, train, k=10).first()
    # referee: Mann-Whitney with tie correction over collected predictions
    te = {(r["u"], r["v"]) for r in test.collect()}
    pr = [(r["score"], (r["u"], r["v"]) in te) for r in preds.collect()]
    pos = [s for s, p in pr if p]
    neg = [s for s, p in pr if not p]
    if pos and neg:
        num = sum(
            2 * sum(1 for x in neg if x < s) + sum(1 for x in neg if x == s)
            for s in pos
        )
        assert row["auc_num"] == num
        assert row["auc_den"] == 2 * len(pos) * len(neg)
        assert abs(row["auc"] - num / (2 * len(pos) * len(neg))) < 1e-12
    assert row["n_candidates"] == len(pr)
    assert row["n_positives"] == len(pos)


def test_perfect_predictor_auc_one(spark):
    # planted: candidates where every positive outranks every negative
    rows = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3)]  # core path/cycle bits
    g = from_edge_rows(spark, [(a, b, 1.0) for a, b in rows], num_nodes=5,
                       weighted=True)
    train, _ = holdout_split(g, test_per_mille=0)  # keep everything
    preds = candidate_scores(train, 1000)
    # fake test set = the top-scoring candidate pair(s)
    top = preds.orderBy(preds.score.desc(), "u", "v").limit(1)
    row = roc_auc_summary(preds.select("u", "v", "score"),
                          top.select("u", "v"), train, k=1).first()
    if row["auc_den"]:
        assert row["auc"] >= 0.5
    assert row["tp_at_k"] == 1 and row["precision_at_k"] == 1.0


def test_katz_walk_counts_match_matrix_powers(spark):
    g, es = _er_graph(spark, 12, 24, 5)
    train, _ = holdout_split(g, test_per_mille=300)
    tr = [(r["u"], r["v"]) for r in train.collect()]
    n = 12
    A = np.zeros((n, n), dtype=np.int64)
    for u, v in tr:
        A[u, v] = A[v, u] = 1
    A2, A3 = A @ A, A @ A @ A
    cand = candidate_scores(train, 1000)
    got = {(r["u"], r["v"]): (r["walks2"], r["walks3"])
           for r in katz_scores(train, cand, beta=0.005).collect()}
    for (u, v), (w2, w3) in got.items():
        assert w2 == A2[u, v] and w3 == A3[u, v], (u, v)
    assert got  # nonempty


def test_global_cumsum_matches_pandas(spark):
    from networkit_spark.functions.ordering import global_cumsum

    rng = np.random.RandomState(9)
    vals = [(int(k), int(rng.randint(0, 100))) for k in rng.permutation(500)]
    df = spark.createDataFrame(vals, "k long, x long")
    got = {r["k"]: r["cum_x"] for r in global_cumsum(df, ["k"], ["x"]).collect()}
    acc = 0
    for k, x in sorted(vals):
        acc += x
        assert got[k] == acc
