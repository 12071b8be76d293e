"""GroupDegree (centrality/GroupDegree.cpp) contract tests."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.groups import group_degree, group_degree_score


def test_greedy_picks_double_star(spark):
    # two stars: center 0 (leaves 1-4), center 5 (leaves 6-8), bridge 4-6
    edges = [(0, i) for i in range(1, 5)] + [(5, i) for i in range(6, 9)] + [(4, 6)]
    g = from_edge_rows(spark, edges)
    rows = group_degree(g, k=2).collect()
    picks = [(r["rank"], r["id"], r["gain"]) for r in rows]
    # greedy: 0 covers {0..4} gain 5; then 5 covers {5,6,7,8} gain 4
    assert picks == [(1, 0, 5), (2, 5, 4)]
    assert group_degree_score(g, k=2) == 9


def test_tie_breaks_to_smaller_id(spark):
    # two disjoint triangles: equal gains, smaller component id first
    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)])
    rows = group_degree(g, k=2).collect()
    assert [r["id"] for r in rows] == [0, 3]


def test_without_group_nodes(spark):
    # star center 0 with 3 leaves: |N(S)\S| = 3 for S={0}
    g = from_edge_rows(spark, [(0, 1), (0, 2), (0, 3)])
    rows = group_degree(g, k=1, count_group_nodes=False).collect()
    assert rows[0]["id"] == 0 and rows[0]["gain"] == 3
