"""Dynamic generators (generators/Dynamic*.cpp) + DGS / Cover IO."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources import dynamic_generators as dg
from networkit_spark.sources.generators import (
    barabasi_albert,
    dorogovtsev_mendes,
    regular_ring_lattice,
)
from networkit_spark.sources.io import (
    read_cover,
    read_dgs,
    read_edge_list_cover,
    write_cover,
    write_dgs,
)


def canon_edges(g):
    return {
        (r["src"], r["dst"])
        for r in g.edges.select("src", "dst").distinct().collect()
    }


def test_dynamic_path_folds_to_path(spark):
    ev = dg.dynamic_path(spark, 5)
    g = dg.fold_events(spark, ev)
    assert g.num_nodes() == 6
    degs = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert degs[0] == 1 and degs[5] == 1
    assert all(degs[i] == 2 for i in range(1, 5))
    # prefix replay: two steps -> three nodes
    g2 = dg.fold_events(spark, ev, up_to=2)
    assert g2.num_nodes() == 3 and canon_edges(g2) == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_dynamic_dorogovtsev_mendes_matches_static(spark):
    n_steps = 9  # n = 12
    ev = dg.dynamic_dorogovtsev_mendes(spark, n_steps, seed=7)
    g = dg.fold_events(spark, ev)
    ref = dorogovtsev_mendes(spark, n_steps + 3, seed=7)
    assert g.num_nodes() == ref.num_nodes()
    assert canon_edges(g) == canon_edges(ref)
    # every step adds exactly one node and two attach edges
    per_t = {
        r["t"]: r["cnt"]
        for r in ev.filter("etype = 'EDGE_ADD'").groupBy("t").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    assert per_t[0] == 3
    assert all(per_t[t] == 2 for t in range(1, n_steps + 1))


def test_dynamic_barabasi_albert_matches_static(spark):
    ev = dg.dynamic_barabasi_albert(spark, k=2, n_steps=20, seed=5)
    g = dg.fold_events(spark, ev)
    ref = barabasi_albert(spark, 2, 20, seed=5)
    assert canon_edges(g) == canon_edges(ref)
    # attach edges always point to earlier nodes
    bad = ev.filter("etype = 'EDGE_ADD' AND v >= u").count()
    assert bad == 0


def test_dynamic_forest_fire_invariants(spark):
    ev1 = dg.dynamic_forest_fire(spark, 8, p=0.4, seed=11)
    ev2 = dg.dynamic_forest_fire(spark, 8, p=0.4, seed=11)
    assert sorted(map(tuple, ev1.collect())) == sorted(map(tuple, ev2.collect()))
    rows = ev1.collect()
    # each step's new node connects to >= 1 earlier node (the ambassador)
    for t in range(1, 9):
        adds = [r for r in rows if r["t"] == t and r["etype"] == "EDGE_ADD"]
        assert len(adds) >= 1
        assert all(r["v"] < r["u"] for r in adds)
    g = dg.fold_events(spark, ev1)
    assert g.num_nodes() == 9
    # undirected fold is connected (every node burned at least its ambassador)
    from networkit_spark.operators.components import connected_components

    labels = connected_components(g)
    assert labels.select("label").distinct().count() == 1


def test_regular_ring_lattice(spark):
    g = regular_ring_lattice(spark, n=10, k=3)
    degs = [r["degree"] for r in g.degrees().collect()]
    assert degs == [6] * 10
    assert g.num_edges() == 30
    # k clamps to n/2 - 1
    g2 = regular_ring_lattice(spark, n=8, k=100)
    assert {r["degree"] for r in g2.degrees().collect()} == {6}


def test_read_dgs_stream(spark, tmp_path):
    p = tmp_path / "s.dgs"
    p.write_text(
        "DGS004\n"
        "null 0 0\n"
        "an A\n"
        "an B\n"
        "ae e1 A B\n"
        "st\n"
        "an C\n"
        "ae e2 B C\n"
        "ce A-B weight=3\n"
        "st\n"
        "de A-B\n"
        "dn A\n"
    )
    ev = read_dgs(spark, str(p))
    assert ev.filter("etype = 'NODE_ADD'").count() == 3
    # names map in first-seen order: A=0 B=1 C=2
    w = ev.filter("etype = 'EDGE_WEIGHT_UPDATE'").collect()[0]
    assert (w["u"], w["v"], w["w"]) == (0, 1, 3.0)
    g = dg.fold_events(spark, ev.filter("etype <> 'EDGE_WEIGHT_UPDATE'"))
    assert g.num_nodes() == 2  # A removed
    assert canon_edges(g) == {(1, 2), (2, 1)}
    # prefix fold at t=0: just A-B
    g0 = dg.fold_events(spark, ev, up_to=0)
    assert canon_edges(g0) == {(0, 1), (1, 0)}


def test_write_dgs_roundtrip(spark, tmp_path):
    ev = spark.createDataFrame(
        [
            (0, "NODE_ADD", 0, None, None),
            (0, "NODE_ADD", 1, None, None),
            (0, "EDGE_ADD", 0, 1, 1.0),
            (1, "NODE_ADD", 2, None, None),
            (1, "EDGE_ADD", 1, 2, 1.0),
            (1, "EDGE_WEIGHT_UPDATE", 0, 1, 3.0),
            (2, "EDGE_REMOVE", 0, 1, None),
            (2, "NODE_REMOVE", 0, None, None),
        ],
        "t long, etype string, u long, v long, w float",
    )
    p = tmp_path / "out.dgs"
    write_dgs(ev, str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "DGS004"
    assert lines.count("st") == 2
    assert "ce 0-1 weight=3.0" in lines
    back = read_dgs(spark, str(p))
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in ev.collect()]


def test_cover_roundtrip(spark, tmp_path):
    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (1, 1), (3, 1)], "id long, label long"
    )
    p = str(tmp_path / "c.cover")
    write_cover(cover, p)
    back = read_cover(spark, p)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in cover.collect()}


def test_edge_list_cover_reader(spark, tmp_path):
    p = tmp_path / "c.elc"
    p.write_text("# comment\n1 0 2\n2 1\n3 0 1 2\n")
    got = read_edge_list_cover(spark, str(p), first_node=1)
    assert {tuple(r) for r in got.collect()} == {
        (0, 0), (0, 2), (1, 1), (2, 0), (2, 1), (2, 2)
    }


def test_gexf_roundtrip(spark, tmp_path):
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import read_gexf, write_gexf

    g = from_edge_rows(spark, [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)])
    p = str(tmp_path / "g.gexf")
    write_gexf(g, p)
    back = read_gexf(spark, p)
    assert canon_edges(back) == canon_edges(g)
    w = {
        (r["src"], r["dst"]): r["weight"]
        for r in back.edges.collect()
    }
    assert w[(0, 1)] == 2.5 and w[(2, 3)] == 4.0


def test_gexf_reads_foreign_file_and_rejects_dynamic(spark, tmp_path):
    from networkit_spark.sources.io import read_gexf

    p = tmp_path / "f.gexf"
    p.write_text(
        '<?xml version="1.0"?>\n'
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n'
        '<graph defaultedgetype="directed">\n'
        '<nodes><node id="a"/><node id="b"/><node id="c"/></nodes>\n'
        '<edges><edge id="0" source="a" target="b"/>'
        '<edge id="1" source="b" target="c" weight="7"/></edges>\n'
        "</graph></gexf>\n"
    )
    g = read_gexf(spark, str(p))
    assert g.directed and g.num_nodes() == 3
    assert canon_edges(g) == {(0, 1), (1, 2)}

    d = tmp_path / "d.gexf"
    d.write_text(
        '<gexf xmlns="http://www.gexf.net/1.2draft">'
        '<graph mode="dynamic"><nodes/><edges/></graph></gexf>'
    )
    import pytest as _pytest

    # dynamic files are no longer rejected outright: the static reader
    # redirects to read_gexf_dynamic (sources/io.py:949), which serves them.
    with _pytest.raises(ValueError, match="read_gexf_dynamic"):
        read_gexf(spark, str(d))


def test_dynamic_pub_web_fold_matches_recompute(spark):
    # Folding the event stream to step t must equal the eligible-edge graph
    # recomputed directly from the step-t point set — the same "events ==
    # final structure" contract the reference's DynamicPubWebGenerator
    # maintains by construction (DynamicPubWebGenerator.cpp:106-176).
    from networkit_spark.sources.generators import (
        _pubweb_eligible,
        _pubweb_points,
        _torus_points,
    )

    n, steps, churn, seed = 40, 3, 0.1, 9
    ev = dg.dynamic_pub_web(
        spark, n, steps, num_dense_areas=3, neighborhood_radius=0.25,
        max_neighbors=5, churn=churn, seed=seed,
    )
    # replay the point-set evolution independently
    centers = _torus_points(spark, 3, seed, "pwc")
    pts = _pubweb_points(
        spark.range(n).select(F.col("id").cast("long")), centers, 3, seed, "dpw0"
    ).localCheckpoint(eager=True)
    n_churn, next_id = int(n * churn), n
    for t in range(1, steps + 1):
        dele = (
            pts.select(
                "id", F.xxhash64(F.lit(seed), F.lit(f"dpwdel{t}"), F.col("id")).alias("h")
            )
            .orderBy("h", "id").limit(n_churn).select("id")
        )
        new_ids = spark.range(next_id, next_id + n_churn).select(F.col("id").cast("long"))
        next_id += n_churn
        pts = (
            pts.join(dele, "id", "anti")
            .unionByName(_pubweb_points(new_ids, centers, 3, seed, f"dpw{t}"))
            .localCheckpoint(eager=True)
        )
    want = _pubweb_eligible(pts, 0.25, 5)
    folded = dg.fold_events(spark, ev, stepwise=True)
    assert {r["id"] for r in folded.vertices.collect()} == {
        r["id"] for r in pts.collect()
    }
    got_edges = {
        (r["src"], r["dst"], round(r["weight"], 4))
        for r in folded.edges.collect()
        if r["src"] < r["dst"]
    }
    want_edges = {
        (r["src"], r["dst"], round(r["weight"], 4)) for r in want.collect()
    }
    assert got_edges == want_edges and len(want_edges) > 0
    # mid-stream prefix folds to a graph whose node count is still n
    mid = dg.fold_events(spark, ev, up_to=1, stepwise=True)
    assert mid.vertices.count() == n
    # determinism: same params -> identical stream
    ev2 = dg.dynamic_pub_web(
        spark, n, steps, num_dense_areas=3, neighborhood_radius=0.25,
        max_neighbors=5, churn=churn, seed=seed,
    )
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r) for r in ev2.collect()}
    assert a == b


def test_dynamic_hyperbolic_fold_matches_recompute(spark):
    # Stepwise-folding the movement stream must equal the threshold graph
    # recomputed from independently-evolved coordinates (the reference's
    # "events == structure after moves" contract,
    # DynamicHyperbolicGenerator.cpp:213-345). Kinematics replayed here
    # with numpy to referee the column-expression moveNode port.
    import math

    import numpy as np

    from networkit_spark.sources.generators import (
        _hyperbolic_coords,
        _hyperbolic_edges,
    )

    n, steps, R, alpha, med, md, seed = 50, 3, 3.0, 1.0, 0.4, 0.05, 13
    ev = dg.dynamic_hyperbolic(
        spark, n, steps, R=R, alpha=alpha, move_each_step=med,
        move_distance=md, seed=seed,
    )
    folded = dg.fold_events(spark, ev, stepwise=True)

    # independent numpy replay of the kinematics
    coords = {
        r["id"]: [r["theta"], r["r"]]
        for r in _hyperbolic_coords(spark, n, R, alpha, seed).collect()
    }

    def u01(*cols):
        from pyspark.sql import functions as FF
        df = spark.createDataFrame([(i,) for i in range(n)], "id long")
        from networkit_spark.sources.generators import _u01
        return {
            r["id"]: r["u"]
            for r in df.select("id", _u01(seed, *cols, F.col("id")).alias("u")).collect()
        }

    am = {i: (u - 0.5) * 2 * md for i, u in u01(F.lit("dham")).items()}
    rm = {i: (u - 0.5) * 2 * 10 * md for i, u in u01(F.lit("dhrm")).items()}
    maxcdf = math.cosh(alpha * R)
    for t in range(1, steps + 1):
        mv = u01(F.lit(f"dhmv{t}"))
        for i in range(n):
            if mv[i] >= med:
                continue
            theta, r = coords[i]
            newcosh = math.cosh(alpha * r) + alpha * rm[i]
            flip = False
            if newcosh > maxcdf:
                newcosh = 2 * maxcdf - newcosh
                flip = True
            if newcosh < 1.0:
                newcosh = 2.0 - newcosh
                flip = True
                theta = theta - math.pi if theta > math.pi else theta + math.pi
            new_r = min(math.acosh(max(newcosh, 1.0)) / alpha, R - 1e-12)
            theta = (theta + am[i] / new_r) % (2 * math.pi)
            coords[i] = [theta, new_r]
            if flip:
                rm[i] = -rm[i]
    pts = spark.createDataFrame(
        [(i, c[0], c[1]) for i, c in coords.items()], "id long, theta double, r double"
    )
    want = {
        (r["src"], r["dst"]) for r in _hyperbolic_edges(pts, R).collect()
    }
    got = {
        (r["src"], r["dst"])
        for r in folded.edges.collect()
        if r["src"] < r["dst"]
    }
    assert got == want and len(want) > 0
    assert folded.vertices.count() == n
    # stream has both additions and removals after t=0 (movement churns edges)
    kinds = {
        (r["t"] > 0, r["etype"])
        for r in ev.select("t", "etype").distinct().collect()
    }
    assert (True, "EDGE_ADD") in kinds and (True, "EDGE_REMOVE") in kinds
