"""Graph core primitives (SURVEY.md §2.1, §2.8)."""

from pyspark.sql import functions as F

from networkit_spark.graph import Graph, from_edge_rows


def test_counts_and_weights(spark):
    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 3.0), (2, 2, 5.0)])
    assert g.num_nodes() == 3
    assert g.num_edges() == 3  # self-loop counted once
    assert g.total_edge_weight() == 10.0


def test_degrees_and_isolated(spark):
    g = from_edge_rows(spark, [(0, 1, 2.0), (0, 0, 1.0)], num_nodes=4)
    d = {r["id"]: (r["degree"], r["wdeg"]) for r in g.degrees().collect()}
    # undirected: self-loop contributes 1 to degree rows but 2x weight
    assert d[0] == (2, 4.0)
    assert d[1] == (1, 2.0)
    assert d[2] == (0, 0.0)
    iso = {r["id"] for r in g.isolated_nodes().collect()}
    assert iso == {2, 3}


def test_density_volume(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2)], num_nodes=3)
    assert abs(g.density() - 2 / 3) < 1e-12


def test_transpose_directed(spark):
    g = from_edge_rows(spark, [(0, 1)], directed=True)
    gt = g.transpose()
    assert gt.has_edge(1, 0) and not gt.has_edge(0, 1)


def test_to_undirected(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2)], directed=True)
    u = g.to_undirected()
    assert u.has_edge(1, 0) and u.has_edge(2, 1)
    assert u.num_edges() == 2


def test_subgraph_and_remove(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    sub = g.subgraph_from_nodes(spark.createDataFrame([(0,), (1,), (2,)], "id long"))
    assert sub.num_nodes() == 3 and sub.num_edges() == 2
    rem = g.remove_nodes(spark.createDataFrame([(1,)], "id long"))
    assert rem.num_nodes() == 3 and rem.num_edges() == 1
    re = g.remove_edges(spark.createDataFrame([(2, 1)], "src long, dst long"))
    assert re.num_edges() == 2 and not re.has_edge(1, 2) and not re.has_edge(2, 1)


def test_append_and_merge(spark):
    a = from_edge_rows(spark, [(0, 1)])
    b = from_edge_rows(spark, [(0, 1)])
    ap = a.append(b)
    assert ap.num_nodes() == 4 and ap.num_edges() == 2
    assert ap.has_edge(2, 3)
    mg = a.merge(b)
    assert mg.num_nodes() == 2 and mg.num_edges() == 1


def test_index_edges(spark):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2)])
    idx = g.index_edges().collect()
    assert sorted(r["edge_id"] for r in idx) == [0, 1, 2]


def test_empty_graph(spark):
    g = Graph.empty(spark)
    assert g.num_nodes() == 0 and g.num_edges() == 0
    assert g.total_edge_weight() == 0.0


def test_check_consistency_catches_asymmetry(spark):
    import pytest

    v = spark.range(2).select(F.col("id").cast("long"))
    e = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, weight float")
    g = Graph(v, e, directed=False)
    with pytest.raises(AssertionError):
        g.check_consistency()


def test_profile_distributions_hand_fixture(spark):
    """Profile vectors on a known graph: triangle (0,1,2) plus edge (3,4)
    plus isolated 5 — degree histogram, component sizes {3,2,1}, and mean
    LCC per degree (triangle corners 1.0, path endpoints 0.0)."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.profile import profile_distributions

    g = from_edge_rows(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4)], num_nodes=6
    )
    got = {
        (r["kind"], r["x"]): r["y"]
        for r in profile_distributions(g, cc_iters=6).collect()
    }
    assert got == {
        ("degree_dist", 0): 1.0,   # node 5
        ("degree_dist", 1): 2.0,   # nodes 3, 4
        ("degree_dist", 2): 3.0,   # triangle corners
        ("component_size_dist", 1): 1.0,
        ("component_size_dist", 2): 1.0,
        ("component_size_dist", 3): 1.0,
        ("lcc_by_degree", 0): 0.0,
        ("lcc_by_degree", 1): 0.0,
        ("lcc_by_degree", 2): 1.0,
    }


def test_average_ranks_ties_match_reference_ranked(spark):
    # helpers.pyx:12-40 semantics: 1-based ranks, ties averaged
    from networkit_spark.operators.profile import average_ranks

    sample = [3.0, 1.0, 3.0, 2.0, 3.0, 1.0]  # ranks: 1.5,1.5 | 3 | 5,5,5
    m = spark.createDataFrame(
        [(i, "m", v) for i, v in enumerate(sample)], "id long, measure string, x double"
    )
    got = {r["id"]: r["rnk"] for r in average_ranks(m).collect()}
    assert got == {0: 5.0, 1: 1.5, 2: 5.0, 3: 3.0, 4: 5.0, 5: 1.5}


def test_rank_correlation_matches_reference_formulas(spark):
    """profiling/stat.py Correlation.run:431-485 replicated in numpy (the
    reference's own loops) on a two-measure fixture with ties and an
    exact-mean (zero-deviation) element exercising the copysign edge."""
    import math

    import numpy as np

    from networkit_spark.operators.profile import rank_correlation

    x = np.array([1.0, 2.0, 2.0, 3.0, 4.0])  # mean 2.4
    y = np.array([5.0, 4.0, 4.0, 4.0, 1.0])  # y[1:4] tie; y mean 3.6

    def ranked(s):
        order = np.argsort(s, kind="stable")
        out = np.empty(len(s))
        i = 0
        srt = s[order]
        while i < len(s):
            j = i
            while j < len(s) and srt[j] == srt[i]:
                j += 1
            out[order[i:j]] = (i + j + 1) / 2.0  # avg of 1-based i+1..j
            i = j
        return out

    def corr(a, b):
        n = len(a)
        cov = float(np.sum((a - a.mean()) * (b - b.mean())) / n)
        sa = math.sqrt(float(np.sum((a - a.mean()) ** 2) / n))
        sb = math.sqrt(float(np.sum((b - b.mean()) ** 2) / n))
        return cov, cov / (sa * sb)

    cov, pearson = corr(x, y)
    _, spearman = corr(ranked(x), ranked(y))
    fech = float(
        np.mean(
            [
                math.copysign(1.0, (xi - x.mean()) * (yi - y.mean()))
                for xi, yi in zip(x, y)
            ]
        )
    )

    m = spark.createDataFrame(
        [(i, "a", float(v)) for i, v in enumerate(x)]
        + [(i, "b", float(v)) for i, v in enumerate(y)],
        "id long, measure string, x double",
    )
    row = rank_correlation(m).collect()
    assert len(row) == 1 and row[0]["measure_a"] == "a"
    assert row[0]["covariance"] == round(cov, 6)
    assert row[0]["pearson"] == round(pearson, 6)
    assert row[0]["spearman"] == round(spearman, 6)
    assert row[0]["fechner"] == round(fech, 6)


def test_rank_correlation_zero_variance_is_null(spark):
    from networkit_spark.operators.profile import rank_correlation

    m = spark.createDataFrame(
        [(i, "flat", 1.0) for i in range(4)] + [(i, "v", float(i)) for i in range(4)],
        "id long, measure string, x double",
    )
    row = rank_correlation(m).collect()[0]
    assert row["pearson"] is None and row["spearman"] is None
    assert row["covariance"] == 0.0
