"""Sparsification edge scores, assortativity, local-max matching, IVF ANN.

Fixtures are hand-computed against the cited reference semantics
(sparsification/LocalDegreeScore.cpp, SCANStructuralSimilarityScore.cpp,
ChanceCorrectedTriangleScore.cpp, correlation/Assortativity.cpp,
matching/LocalMaxMatcher.cpp) — independent of both the Spark code and the
DuckDB oracle SQL.
"""

import math

import numpy as np
import pytest

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators import sparsification as sp
from networkit_spark.operators.correlation import (
    degree_assortativity,
    nominal_assortativity,
    ordinal_assortativity,
)
from networkit_spark.operators.matching import local_max_matching, matching_weight


# triangle (0,1,2) + pendant 3 attached to 0
TRI_PLUS_PENDANT = [(0, 1), (0, 2), (1, 2), (0, 3)]


def _scores(df):
    return {(r["src"], r["dst"]): r["score"] for r in df.collect()}


def test_scan_similarity(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    got = _scores(sp.scan_similarity_score(g))
    # degrees: 0->3, 1->2, 2->2, 3->1
    want = {
        (0, 1): (1 + 1) / math.sqrt(4 * 3),
        (0, 2): (1 + 1) / math.sqrt(4 * 3),
        (1, 2): (1 + 1) / math.sqrt(3 * 3),
        (0, 3): (0 + 1) / math.sqrt(4 * 2),
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_chance_corrected(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    got = _scores(sp.chance_corrected_triangle_score(g))
    n = 4
    want = {
        (0, 1): 1 * (n - 2) / (2 * 1),
        (0, 2): 1 * (n - 2) / (2 * 1),
        (1, 2): 1 * (n - 2) / (1 * 1),
        (0, 3): 1.0,  # deg(3) == 1 special case
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_local_degree_score(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    got = _scores(sp.local_degree_score(g))
    # from node 0 (deg 3): neighbors by deg desc -> 1(2),2(2) share rank 1,
    # 3(1) rank 3. e(0,1)=e(0,2)=1-ln(1)/ln(3)=1, e(0,3)=1-ln(3)/ln(3)=0.
    # from node 1 (deg 2): neighbors 0(3) rank 1 -> e=1; 2(2) rank 2 -> e=0.
    # from node 3 (deg 1): e=1 for (0,3).
    assert got[(0, 1)] == pytest.approx(1.0)
    assert got[(0, 2)] == pytest.approx(1.0)
    assert got[(1, 2)] == pytest.approx(0.0)
    assert got[(0, 3)] == pytest.approx(1.0)  # max(0 from node 0, 1 from node 3)


def test_local_similarity_and_random_deterministic(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    ls = _scores(sp.local_similarity_score(g))
    # node 1 (deg 2): sims — (1,0): tri=1, 1/(3+2-1)=0.25; (1,2): tri=1,
    # 1/(2+2-1)=1/3 -> rank1 (1,2) e=1, rank2 (1,0) e=1-ln2/ln2=0
    assert ls[(1, 2)] == pytest.approx(1.0)
    # (0,1): from node 0 (deg 3): sims (0,1)=.25,(0,2)=.25,(0,3)=0 ->
    # row_number ties by nbr asc: (0,1) rank1 e=1
    assert ls[(0, 1)] == pytest.approx(1.0)
    r1 = _scores(sp.random_edge_score(g, seed=7))
    r2 = _scores(sp.random_edge_score(g, seed=7))
    assert r1 == r2
    assert all(0.0 <= v < 1.0 for v in r1.values())


def test_global_threshold_filter(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    scores = sp.scan_similarity_score(g)
    kept = sp.global_threshold_filter(g, scores, threshold=0.5, above=True)
    kept_edges = {
        (r["src"], r["dst"])
        for r in kept.edges.filter("src < dst").collect()
    }
    # (0,3) has scan score 1/sqrt(8) ~ 0.354 -> dropped; triangle kept
    assert kept_edges == {(0, 1), (0, 2), (1, 2)}
    assert kept.num_nodes() == 4


def test_degree_assortativity_star_vs_cycle(spark):
    # star: perfectly disassortative (r = -1)
    star = from_edge_rows(spark, [(0, i) for i in range(1, 6)], num_nodes=6)
    assert degree_assortativity(star) == pytest.approx(-1.0)
    # cycle: all degrees equal -> zero variance; define r = 0
    cyc = from_edge_rows(spark, [(i, (i + 1) % 5) for i in range(5)], num_nodes=5)
    assert degree_assortativity(cyc) == pytest.approx(0.0)


def test_ordinal_assortativity_matches_numpy(spark):
    rows = [(0, 1), (0, 2), (1, 2), (0, 3), (3, 4), (2, 4)]
    g = from_edge_rows(spark, rows, num_nodes=5)
    attr = {0: 1.0, 1: 5.0, 2: 2.0, 3: 9.0, 4: 4.0}
    attr_df = spark.createDataFrame(
        [(k, v) for k, v in attr.items()], "id long, x double"
    )
    xs = [attr[a] for a, b in rows] + [attr[b] for a, b in rows]
    ys = [attr[b] for a, b in rows] + [attr[a] for a, b in rows]
    want = np.corrcoef(xs, ys)[0, 1]
    assert ordinal_assortativity(g, attr_df) == pytest.approx(want, abs=1e-9)


def test_nominal_assortativity_perfect_and_mixed(spark):
    # two disjoint triangles, labels = component -> r = 1
    rows = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]
    g = from_edge_rows(spark, rows, num_nodes=6)
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, label long"
    )
    assert nominal_assortativity(g, labels) == pytest.approx(1.0)
    # bipartite-ish: every edge crosses -> diag=0, r < 0
    cross = from_edge_rows(spark, [(0, 3), (1, 4), (2, 5)], num_nodes=6)
    assert nominal_assortativity(cross, labels) < 0


def _check_is_maximal_matching(edges, matched):
    m_nodes = set()
    for u, v in matched:
        assert u not in m_nodes and v not in m_nodes, "not a matching"
        m_nodes.update((u, v))
    for u, v in edges:
        if u != v:
            assert u in m_nodes or v in m_nodes, f"edge ({u},{v}) unmatched-extendable"


def test_local_max_matching_weighted_path(spark):
    # path 0-1-2-3 with weights 1, 5, 1: local max picks (1,2) then (0,?) —
    # 0 and 3 have no remaining partner -> matching = {(1,2)}
    rows = [(0, 1, 1.0), (1, 2, 5.0), (2, 3, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=4, weighted=True)
    m = {(r["u"], r["v"]) for r in local_max_matching(g).collect()}
    assert m == {(1, 2)}


def test_local_max_matching_maximal_and_deterministic(spark):
    rng = np.random.RandomState(3)
    rows = []
    seen = set()
    for _ in range(40):
        a, b = int(rng.randint(0, 12)), int(rng.randint(0, 12))
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            rows.append((min(a, b), max(a, b), float(rng.randint(1, 10))))
    g = from_edge_rows(spark, rows, num_nodes=12, weighted=True)
    mdf = local_max_matching(g)
    matched = sorted((r["u"], r["v"]) for r in mdf.collect())
    _check_is_maximal_matching([(a, b) for a, b, _ in rows], matched)
    # deterministic: second run identical
    matched2 = sorted((r["u"], r["v"]) for r in local_max_matching(g).collect())
    assert matched == matched2
    # local-max >= 1/2 of max-weight matching (Preis bound); brute force tiny
    assert matching_weight(mdf) > 0


def _greedy_matching(rows, order_key):
    """Sequential greedy matching over edges sorted by order_key — the
    Suitor fixed point per Manne-Halappanavar IPDPS'14 §3."""
    taken, matched = set(), []
    for u, v, w in sorted(rows, key=order_key):
        if u not in taken and v not in taken:
            taken.update((u, v))
            matched.append((u, v))
    return sorted(matched)


def test_suitor_matching_equals_sequential_greedy(spark):
    from networkit_spark.operators.matching import suitor_matching

    rng = np.random.RandomState(7)
    rows, seen = [], set()
    for _ in range(60):
        a, b = int(rng.randint(0, 14)), int(rng.randint(0, 14))
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            # integral weights -> plenty of ties to exercise the tie-break
            rows.append((min(a, b), max(a, b), float(rng.randint(1, 6))))
    g = from_edge_rows(spark, rows, num_nodes=14, weighted=True)
    got = sorted((r["u"], r["v"]) for r in suitor_matching(g).collect())
    want = _greedy_matching(rows, lambda e: (-e[2], e[0], e[1]))
    assert got == want
    _check_is_maximal_matching([(a, b) for a, b, _ in rows], got)


def test_suitor_matching_dominates_local_max_on_distinct_weights(spark):
    # MatcherGTest.cpp:135-199 semantics: proper + maximal; with DISTINCT
    # weights every 1/2-approx greedy variant returns the same matching,
    # so suitor weight must be >= local_max weight (here: equal)
    from networkit_spark.operators.matching import suitor_matching

    rng = np.random.RandomState(5)
    rows, seen = [], set()
    while len(rows) < 30:
        a, b = int(rng.randint(0, 12)), int(rng.randint(0, 12))
        if a != b and (min(a, b), max(a, b)) not in seen:
            seen.add((min(a, b), max(a, b)))
            rows.append((min(a, b), max(a, b), float(len(rows)) + 1.0))
    g = from_edge_rows(spark, rows, num_nodes=12, weighted=True)
    ws = matching_weight(suitor_matching(g))
    wl = matching_weight(local_max_matching(g))
    assert ws >= wl - 1e-9
    assert ws == matching_weight(suitor_matching(g))  # deterministic


def test_suitor_matching_unweighted_no_unmatched_neighbors(spark):
    # star + path: suitor must leave no edge with both endpoints unmatched
    from networkit_spark.operators.matching import suitor_matching

    rows = [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    got = sorted((r["u"], r["v"]) for r in suitor_matching(g).collect())
    _check_is_maximal_matching([(a, b) for a, b, _ in rows], got)
    # tie-break: all weights equal -> greedy by (u, v) lexicographic
    assert got == _greedy_matching(rows, lambda e: (-e[2], e[0], e[1]))


def test_ivf_ann_contains_true_neighbors(spark):
    from networkit_spark.functions.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivf_assign,
        ivf_centroids,
        lloyd_refine,
    )

    rng = np.random.RandomState(11)
    base = rng.standard_normal((6, 8))
    vecs = []
    for i in range(60):
        v = base[i % 6] + 0.05 * rng.standard_normal(8)
        vecs.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = cosine_topk(emb, query_ids=[20, 21], k=3)
    approx = ivf_ann_topk(emb, query_ids=[20, 21], k=3, n_cells=6, nprobe=3)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # clustered data + 3 probes: recall should be high (>= 4 of 6)
    assert len(ex & ap) >= 4
    # Lloyd refinement matches a numpy k-means step on the same assignment
    cent = ivf_centroids(emb, n_cells=6)
    assign = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cent).collect()}
    refined = lloyd_refine(emb, cent, iterations=1)
    got = {r["cell"]: np.array(r["cv"]) for r in refined.collect()}
    arr = {i: np.array(v) for i, v in vecs}
    for cell in got:
        members = [arr[i] for i, c in assign.items() if c == cell]
        want = np.mean(members, axis=0)
        assert np.allclose(got[cell], want, atol=1e-5)


def test_embed_near_dup_finds_planted_pair(spark):
    from networkit_spark.functions.similarity import embed_near_dup_pairs

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(30)]
    # plant a near-duplicate of vec 3 as id 99
    dup = [x + 1e-3 for x in vecs[3][1]]
    vecs.append((99, dup))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = {
        (r["a"], r["b"])
        for r in embed_near_dup_pairs(emb, threshold=0.95, nbits=6, n_tables=4).collect()
    }
    assert (3, 99) in pairs


def test_simmelian_overlap(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    got = _scores(sp.simmelian_overlap_score(g, max_rank=10))
    # top-ranked neighbor sets: 0 -> {1,2,3}, 1 -> {0,2}, 2 -> {0,1}, 3 -> {0}
    # overlap(u,v) = |top(u) ∩ top(v)|
    assert got[(0, 1)] == 1.0  # common: {2}
    assert got[(0, 2)] == 1.0  # common: {1}
    assert got[(1, 2)] == 1.0  # common: {0}
    assert got[(0, 3)] == 0.0  # top(3)={0} shares nothing with top(0)={1,2,3}


def test_simmelian_base_sharing_consistent(spark):
    g = from_edge_rows(spark, TRI_PLUS_PENDANT, num_nodes=4)
    base = sp.tri_deg_base(g)
    assert _scores(sp.scan_similarity_score(g, base)) == _scores(
        sp.scan_similarity_score(g)
    )


def test_top_closeness_path_center(spark):
    from networkit_spark.operators.distance import top_closeness

    g = from_edge_rows(spark, [(i, i + 1) for i in range(4)], num_nodes=5)
    top = [r["id"] for r in top_closeness(g, k=3).collect()]
    # path 0-1-2-3-4: center 2 first, then 1 (tie with 3 broken by id asc), 3
    assert top == [2, 1, 3]


def test_maximal_independent_set_contract(spark):
    from networkit_spark.operators.mis import maximal_independent_set

    rng = np.random.RandomState(9)
    rows = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (int(rng.randint(0, 20)), int(rng.randint(0, 20))) for _ in range(60)
            )
            if a != b
        }
    )
    g = from_edge_rows(spark, rows, num_nodes=20)
    out = {r["id"]: r["in_set"] for r in maximal_independent_set(g, seed=7).collect()}
    assert set(out) == set(range(20))
    in_set = {v for v, f in out.items() if f == 1}
    # independence: no edge inside the set (Luby.cpp isIndependentSet contract)
    for a, b in rows:
        assert not (a in in_set and b in in_set), f"edge ({a},{b}) inside set"
    # maximality: every vertex outside has a neighbor inside
    nbrs = {v: set() for v in range(20)}
    for a, b in rows:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for v in range(20):
        if v not in in_set:
            assert nbrs[v] & in_set, f"vertex {v} could be added"
    # seed-determinism
    again = {
        r["id"]: r["in_set"]
        for r in maximal_independent_set(g, seed=7).collect()
    }
    assert out == again


def test_jaccard_distance_score(spark):
    from networkit_spark.operators.sparsification import jaccard_distance_score

    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {(r["src"], r["dst"]): r["jd"] for r in jaccard_distance_score(g).collect()}
    assert got[(0, 1)] == pytest.approx(1 - 1 / 3)  # t=1, deg 2+2-1
    assert got[(2, 3)] == pytest.approx(1.0)  # triangle-free


def test_adamic_adar_distance_score(spark):
    import math

    from networkit_spark.operators.sparsification import adamic_adar_distance_score

    g = from_edge_rows(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    got = {
        (r["src"], r["dst"]): r["aa_dist"]
        for r in adamic_adar_distance_score(g).collect()
    }
    assert got[(0, 1)] == pytest.approx(math.log(3))  # common nbr 2, deg 3
    assert got[(0, 2)] == pytest.approx(math.log(2))  # common nbr 1, deg 2
    assert got[(2, 3)] is None  # triangle-free -> no finite distance


def test_forest_fire_score_invariants(spark):
    from networkit_spark.operators.sparsification import (
        canonical_edges,
        forest_fire_score,
    )
    from networkit_spark.sources.generators import erdos_renyi

    g = erdos_renyi(spark, n=40, p=0.15, seed=7)
    s = forest_fire_score(g, pf=0.6, target_burnt_ratio=0.5, fires_per_batch=16, seed=3)
    rows = s.collect()
    m = canonical_edges(g).count()
    # one score per canonical edge, normalized into [0, 1] with max exactly 1
    assert len(rows) == m
    vals = [r["score"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert max(vals) == 1.0
    # burnt mass reached the target ratio
    assert sum(v > 0 for v in vals) >= 0.3 * m
    # deterministic under seed
    s2 = forest_fire_score(g, pf=0.6, target_burnt_ratio=0.5, fires_per_batch=16, seed=3)
    assert {(r["src"], r["dst"]): r["score"] for r in s2.collect()} == {
        (r["src"], r["dst"]): r["score"] for r in rows
    }


def test_semdedup_hand_fixture(spark):
    """SemDeDup keep/drop on a 2-cell fixture: the planted near-duplicate
    pair loses its more-central member (the paper keeps the item farthest
    from the centroid); everything below eps survives; max_cell=1 disables
    dedup entirely (wide cells kept whole)."""
    from networkit_spark.functions.similarity import semdedup

    vecs = [
        (0, [1.0, 0.0]),        # centroid of cell 0
        (1, [0.0, 1.0]),        # centroid of cell 1
        (2, [0.8, 0.6]),        # cell 0, near-dup pair with 3
        (3, [0.8001, 0.6]),     # cell 0, minutely closer to the centroid
        (4, [0.95, 0.05]),      # cell 0, cos(0,4)=0.99862 < eps
        (5, [0.1, 0.9]),        # cell 1, alone with its centroid
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in semdedup(emb, n_cells=2, eps=0.999).collect()}
    assert {i: got[i]["cell"] for i in got} == {0: 0, 1: 1, 2: 0, 3: 0, 4: 0, 5: 1}
    # cos(2,3) ~ 0.99999 >= eps; 2 has the LOWER centroid-sim (farther
    # from the centroid) so it precedes 3 in the ascending scan order and
    # survives — the minutely more-central member 3 is the one dropped
    assert not got[3]["kept"]
    assert all(got[i]["kept"] for i in (0, 1, 2, 4, 5))
    # the skew guard: cells wider than max_cell are left un-deduplicated
    capped = {
        r["vec_id"]: r["kept"]
        for r in semdedup(emb, n_cells=2, eps=0.999, max_cell=1).collect()
    }
    assert all(capped.values())


def test_path_growing_matching(spark):
    """PathGrowingMatcher.cpp:31-156 — result is a matching made of graph
    edges whose weight is >= 1/2 the maximum-weight matching (Drake-
    Hougardy guarantee), deterministic under the pinned tie-breaks."""
    import itertools

    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.matching import path_growing_matching

    rows = [
        (0, 1, 5.0), (1, 2, 4.0), (2, 3, 6.0), (3, 0, 1.0), (2, 4, 2.0),
        (4, 5, 8.0), (5, 0, 3.0),
    ]
    g = from_edge_rows(spark, rows, num_nodes=6, weighted=True)
    got = [(r["u"], r["v"], r["weight"]) for r in path_growing_matching(g).collect()]
    ge = {(min(a, b), max(a, b)): w for a, b, w in rows}
    seen = set()
    for u, v, w in got:
        assert ge[(u, v)] == w
        assert u not in seen and v not in seen  # vertex-disjoint
        seen.update((u, v))
    # brute-force maximum-weight matching for the 1/2 guarantee
    best = 0.0
    edges = list(ge.items())
    for k in range(1, 4):
        for combo in itertools.combinations(edges, k):
            vs = [x for (u, v), _ in combo for x in (u, v)]
            if len(vs) == len(set(vs)):
                best = max(best, sum(w for _, w in combo))
    assert sum(w for _, _, w in got) >= best / 2
    # determinism
    again = [(r["u"], r["v"], r["weight"]) for r in path_growing_matching(g).collect()]
    assert got == again
    # checkInput raise paths
    with pytest.raises(ValueError, match="undirected"):
        path_growing_matching(from_edge_rows(spark, [(0, 1)], directed=True))
    with pytest.raises(ValueError, match="self-loops"):
        path_growing_matching(from_edge_rows(spark, [(0, 0), (0, 1)]))


def test_random_node_edge_score(spark):
    """RandomNodeEdgeScore.cpp:19-70 — every edge scored exactly once with
    the removal-position/m ladder; deterministic under the seed."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.sparsification import random_node_edge_score

    rows = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 4)]
    g = from_edge_rows(spark, rows, num_nodes=5)
    got = {(r["u"], r["v"]): r["score"] for r in random_node_edge_score(g, seed=9).collect()}
    assert set(got) == {(min(a, b), max(a, b)) for a, b in rows}
    m = len(rows)
    assert sorted(got.values()) == [i / m for i in range(m)]
    again = {(r["u"], r["v"]): r["score"] for r in random_node_edge_score(g, seed=9).collect()}
    assert got == again
    # different seeds produce different removal orders (mixing)
    other = {(r["u"], r["v"]): r["score"] for r in random_node_edge_score(g, seed=10).collect()}
    assert other != got
    # the pure-uniform and pure-node-biased extremes both cover all edges
    for ratio in (0.0, 1.0):
        ext = random_node_edge_score(g, rne_ratio=ratio, seed=3).collect()
        assert len(ext) == m


def test_path_growing_matching_zero_weight_edges(spark):
    # regression: best_w init of 0.0 left best_u=None when a node's only
    # alive edge had weight <= 0 -> TypeError; now the true argmax is
    # matched (documented deviation from the reference's bestNeighbor=0
    # degenerate behavior for nonpositive weights)
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.matching import path_growing_matching

    g = from_edge_rows(spark, [(0, 1, 0.0)], num_nodes=2, weighted=True)
    got = path_growing_matching(g).collect()
    assert [(r["u"], r["v"]) for r in got] in ([], [(0, 1)])

    g2 = from_edge_rows(
        spark, [(0, 1, 0.0), (1, 2, 5.0), (2, 3, 0.0)], num_nodes=4,
        weighted=True,
    )
    got2 = {(r["u"], r["v"]): r["weight"] for r in path_growing_matching(g2).collect()}
    assert (1, 2) in got2 and got2[(1, 2)] == 5.0


def test_cluster_balanced_sample(spark):
    """Cluster-balanced subset selection: nearest-centroid assignment
    matches semdedup's quantizer, each cell keeps exactly min(cap, |cell|)
    members, rnk is a 1..|cell| permutation, and the kept set is a
    deterministic function of (data, seed) while different seeds draw a
    different permutation of a big-enough cell."""
    from networkit_spark.functions.similarity import cluster_balanced_sample

    vecs = [
        (0, [1.0, 0.0]),        # centroid of cell 0
        (1, [0.0, 1.0]),        # centroid of cell 1
        (2, [0.9, 0.1]),
        (3, [0.8, 0.2]),
        (4, [0.95, 0.05]),
        (5, [0.1, 0.9]),
        (6, [0.7, 0.3]),
        (7, [0.85, 0.15]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = cluster_balanced_sample(emb, n_cells=2, cap=3).collect()
    got = {r["vec_id"]: r for r in rows}
    cells = {i: got[i]["cell"] for i in got}
    assert cells == {0: 0, 1: 1, 2: 0, 3: 0, 4: 0, 5: 1, 6: 0, 7: 0}
    # per-cell rank is a 1..|cell| permutation and kept == (rnk <= cap)
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        assert sorted(m["rnk"] for m in members) == list(
            range(1, len(members) + 1)
        )
        for m in members:
            assert m["kept"] == (m["rnk"] <= 3)
        assert sum(m["kept"] for m in members) == min(3, len(members))
    # deterministic at fixed seed; a different seed permutes cell 0
    again = {r["vec_id"]: r["rnk"] for r in
             cluster_balanced_sample(emb, n_cells=2, cap=3).collect()}
    assert again == {i: got[i]["rnk"] for i in got}
    other = {r["vec_id"]: r["rnk"] for r in
             cluster_balanced_sample(emb, n_cells=2, cap=3, seed=7).collect()}
    assert other != again
