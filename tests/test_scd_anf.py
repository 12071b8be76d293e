"""PageRankNibble / ApproximatePageRank (scd/) contract tests."""

import itertools

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.scd import approximate_pagerank, pagerank_nibble


def barbell(spark):
    # two 5-cliques bridged by a single edge (4,5)
    a = list(itertools.combinations(range(5), 2))
    b = list(itertools.combinations(range(5, 10), 2))
    return from_edge_rows(spark, a + b + [(4, 5)])


def test_apr_mass_conservation(spark):
    g = barbell(spark)
    pr = approximate_pagerank(g, seeds=[0], alpha=0.15, eps=0.0, max_rounds=6)
    rows = pr.collect()
    total = sum(r["p"] + r["res"] for r in rows)
    # push conserves mass on loop-free graphs (ApproximatePageRank.cpp:25-44)
    assert abs(total - 1.0) < 1e-9
    assert all(r["p"] >= 0 and r["res"] >= 0 for r in rows)


def test_apr_eps_terminates_locally(spark):
    g = barbell(spark)
    pr = approximate_pagerank(g, seeds=[0], alpha=0.15, eps=1e-3, max_rounds=50)
    rows = {r["id"]: r for r in pr.collect()}
    # termination contract: no node still pushable (r < eps * vol)
    deg = {r["id"]: r["wdeg"] for r in g.degrees().collect()}
    for v, r in rows.items():
        assert r["res"] < 1e-3 * deg[v] + 1e-12, (v, r["res"], deg[v])


def test_pagerank_nibble_recovers_clique(spark):
    g = barbell(spark)
    got = [r["id"] for r in pagerank_nibble(g, seeds=[0], alpha=0.15,
                                            eps=0.0, max_rounds=8).collect()]
    # the best-conductance sweep from a clique-A seed is exactly clique A
    assert got == [0, 1, 2, 3, 4]
