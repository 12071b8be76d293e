"""Edge switching vs randomization/EdgeSwitching.cpp's contract: exact
degree preservation, simplicity, determinism under seed, actual mixing."""

from pyspark.sql import functions as F

from networkit_spark.operators.randomization import edge_switching
from networkit_spark.sources.generators import erdos_renyi


def _canon_set(g):
    return {
        (r["src"], r["dst"])
        for r in g.edges.filter(F.col("src") <= F.col("dst")).collect()
    }


def _degrees(g):
    return {
        r["src"]: r["cnt"]
        for r in g.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }


def test_edge_switching_preserves_degrees_and_simplicity(spark):
    g = erdos_renyi(spark, n=40, p=0.15, seed=7)
    before = _degrees(g)
    r = edge_switching(g, rounds=6, seed=11)
    after = _degrees(r)
    assert before == after
    # still simple: no duplicate canonical edges, no new self-loops
    canon = r.edges.filter(F.col("src") < F.col("dst"))
    assert canon.count() == canon.distinct().count()
    assert r.edges.filter(F.col("src") == F.col("dst")).count() == \
        g.edges.filter(F.col("src") == F.col("dst")).count()
    # the switch chain actually moved something
    assert _canon_set(r) != _canon_set(g)


def test_edge_switching_deterministic(spark):
    g = erdos_renyi(spark, n=30, p=0.2, seed=3)
    a = edge_switching(g, rounds=4, seed=5)
    b = edge_switching(g, rounds=4, seed=5)
    assert _canon_set(a) == _canon_set(b)
    c = edge_switching(g, rounds=4, seed=6)
    assert _canon_set(a) != _canon_set(c)


def test_degree_preserving_shuffle(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    g = erdos_renyi(spark, n=40, p=0.12, seed=9)
    s, mapping = degree_preserving_shuffle(g, seed=4)
    # mapping is a permutation of the vertex set
    rows = mapping.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == {r["new_id"] for r in rows} == set(range(40))
    # per-id degree is EXACTLY preserved (in-class trades only)
    assert _degrees(s) == _degrees(g)
    # something actually moved
    assert _canon_set(s) != _canon_set(g)
    # deterministic under seed
    s2, _ = degree_preserving_shuffle(g, seed=4)
    assert _canon_set(s2) == _canon_set(s)


def test_degree_preserving_shuffle_salted(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    g = erdos_renyi(spark, n=40, p=0.12, seed=9)
    s, mapping = degree_preserving_shuffle(g, seed=4, salt_buckets=4)
    rows = mapping.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == {r["new_id"] for r in rows} == set(range(40))
    assert _degrees(s) == _degrees(g)


# ---- global curveball ------------------------------------------------------


def _referee_global_curveball(verts, canon_edges, rounds, seed):
    """Pure-Python replica of global_curveball's batch semantics (same md5
    derandomization, same conservative conflict reverts) — validates the
    distributed implementation edge-for-edge."""
    import hashlib
    from collections import Counter

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    canon = {tuple(sorted(e)) for e in canon_edges if e[0] != e[1]}
    verts = list(verts)
    for r in range(rounds):
        tag = f"{seed}:{r}"
        hv = {i: h(f"{tag}:perm:{i}") for i in verts}
        order = sorted(verts, key=lambda i: (hv[i], i))
        pair_of, members = {}, {}
        for rk, i in enumerate(order, 1):
            if rk == len(order) and len(order) % 2 == 1:
                continue
            p = (rk - 1) // 2
            pair_of[i] = p
            members.setdefault(p, [None, None])
            members[p][0 if rk % 2 == 1 else 1] = i
        untouched, trades, pre_pair = set(), {}, {}
        for (a, b) in canon:
            owner = a if (hv[a], a) < (hv[b], b) else b
            nb = b if owner == a else a
            pre_pair[(a, b)] = pair_of.get(owner)
            if owner not in pair_of:
                untouched.add((a, b))
            else:
                trades.setdefault(pair_of[owner], []).append((owner, nb, (a, b)))
        props = []
        for p, arcs in trades.items():
            u, v = members[p]
            nbc = Counter(nb for (_, nb, _) in arcs)
            fixed = [e for (_, nb, e) in arcs if nb in (u, v) or nbc[nb] == 2]
            pool = [t for t in arcs if t[1] not in (u, v) and nbc[t[1]] == 1]
            k_u = sum(1 for (o, _, _) in pool if o == u)
            pool.sort(key=lambda t: (h(f"{tag}:deal:{p}:{t[1]}"), t[1]))
            newe = [
                tuple(sorted(((u if idx <= k_u else v), nb)))
                for idx, (_, nb, _) in enumerate(pool, 1)
            ]
            props.append((p, [e for (_, _, e) in pool], newe, fixed))
        cnt = Counter(e for (_, _, newe, _) in props for e in newe)
        bad = {
            p
            for (p, _, newe, _) in props
            for e in newe
            if cnt[e] > 1 or (e in pre_pair and pre_pair[e] != p)
        }
        out = set(untouched)
        for (p, orig, newe, fixed) in props:
            out.update(fixed)
            out.update(orig if p in bad else newe)
        canon = out
    return canon


def test_global_curveball_matches_serial_referee(spark):
    from networkit_spark.operators.randomization import global_curveball

    g = erdos_renyi(spark, n=31, p=0.15, seed=13)  # odd n: one inactive rank
    verts = [r["id"] for r in g.vertices.collect()]
    before = _canon_set(g)
    want = _referee_global_curveball(verts, before, rounds=4, seed=11)
    r = global_curveball(g, rounds=4, seed=11)
    got = {
        (a, b)
        for (a, b) in _canon_set(r)
        if a != b
    }
    assert got == want
    assert got != {e for e in before if e[0] != e[1]}  # actually mixed


def test_global_curveball_invariants(spark):
    from networkit_spark.operators.randomization import global_curveball

    g = erdos_renyi(spark, n=40, p=0.15, seed=7)
    before = _degrees(g)
    r = global_curveball(g, rounds=3, seed=5)
    assert _degrees(r) == before
    canon = r.edges.filter(F.col("src") < F.col("dst"))
    assert canon.count() == canon.distinct().count()
    assert r.edges.filter(F.col("src") == F.col("dst")).count() == \
        g.edges.filter(F.col("src") == F.col("dst")).count()


def test_global_curveball_deterministic_and_seeded(spark):
    from networkit_spark.operators.randomization import global_curveball

    g = erdos_renyi(spark, n=24, p=0.2, seed=3)
    a = global_curveball(g, rounds=2, seed=5)
    b = global_curveball(g, rounds=2, seed=5)
    assert _canon_set(a) == _canon_set(b)
    c = global_curveball(g, rounds=2, seed=6)
    assert _canon_set(a) != _canon_set(c)


def test_global_curveball_rejects_directed(spark):
    import pytest
    from networkit_spark.graph import Graph
    from networkit_spark.operators.randomization import global_curveball

    verts = spark.createDataFrame([(0,), (1,)], "id long")
    edges = spark.createDataFrame(
        [(0, 1, 1.0)], "src long, dst long, weight float"
    )
    with pytest.raises(ValueError):
        global_curveball(Graph(verts, edges, directed=True))


def test_curveball_uniform_trades(spark):
    """Curveball.cpp / CurveballImpl.cpp:395-527 — arbitrary trade
    sequences preserve every degree, keep the graph simple, keep common
    neighbors (and the u-v edge) in place, and mix: across seeds a trade
    must produce more than one outcome."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.operators.randomization import curveball

    rows = [(0, 1), (0, 2), (0, 3), (1, 4), (1, 5), (2, 4), (3, 5), (4, 5)]
    g = from_edge_rows(spark, rows, num_nodes=6)
    deg0 = {r["id"]: r["degree"] for r in g.degrees().collect()}
    trades = [(0, 1), (2, 3), (4, 0), (1, 2)]
    outcomes = set()
    for s in range(8):
        rg = curveball(g, trades, seed=s)
        deg = {r["id"]: r["degree"] for r in rg.degrees().collect()}
        assert deg == deg0, (s, deg)
        es = {(r["src"], r["dst"]) for r in rg.edges.collect() if r["src"] < r["dst"]}
        assert all(u != v for u, v in es)
        assert len(es) == len(rows)  # simple, same edge count
        outcomes.add(frozenset(es))
    assert len(outcomes) > 1  # the shuffle actually mixes
    # determinism: same seed -> same graph
    a = {(r["src"], r["dst"]) for r in curveball(g, trades, seed=3).edges.collect()}
    b = {(r["src"], r["dst"]) for r in curveball(g, trades, seed=3).edges.collect()}
    assert a == b
    # shared-edge + common-neighbor invariant on one trade: trading (0, 1)
    # keeps their common neighbors attached to both and keeps the 0-1 edge
    one = curveball(g, [(0, 1)], seed=11)
    es = {(r["src"], r["dst"]) for r in one.edges.collect()}
    assert (0, 1) in es and (1, 0) in es
    common = {x for x in (2, 3, 4, 5) if (0, x) in {(a, b) for a, b in
              [(min(u, v), max(u, v)) for u, v in rows]} and (1, x) in {(a, b) for a, b in
              [(min(u, v), max(u, v)) for u, v in rows]}}
    for x in common:
        assert (0, x) in es and (1, x) in es
