"""Generators (determinism, shape) and IO readers/writers (round-trips)."""

import os

from pyspark.sql import functions as F

from networkit_spark.graph import from_edge_rows
from networkit_spark.sources.generators import (
    clustered_random_graph,
    erdos_renyi,
    rmat,
)
from networkit_spark.sources.io import (
    read_edge_list,
    read_metis,
    read_partition,
    read_snap,
    write_edge_list,
    write_partition,
)


def test_rmat_shape_and_determinism(spark):
    g1 = rmat(spark, scale=8, edge_factor=4, seed=7)
    g2 = rmat(spark, scale=8, edge_factor=4, seed=7)
    assert g1.num_nodes() == 256
    assert g1.num_edges() == 256 * 4
    e1 = sorted((r["src"], r["dst"]) for r in g1.edges.collect())
    e2 = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert e1 == e2
    # a different seed gives a different graph
    e3 = sorted((r["src"], r["dst"]) for r in rmat(spark, 8, 4, seed=8).edges.collect())
    assert e1 != e3
    # skewed mix -> hub vertices: max degree well above the mean (8)
    maxdeg = g1.degrees().agg(F.max("degree")).first()[0]
    assert maxdeg > 20


def test_rmat_determinism_across_parallelism(spark):
    a = rmat(spark, 6, 2, seed=3).edges.repartition(1)
    b = rmat(spark, 6, 2, seed=3).edges.repartition(13)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rmat_weighted_multiplicity(spark):
    g = rmat(spark, 5, 8, seed=1, weighted=True)
    w = g.edges.agg(F.max("weight")).first()[0]
    assert w >= 2.0  # duplicate draws accumulate (increaseWeight path)


def test_erdos_renyi(spark):
    g = erdos_renyi(spark, n=100, p=0.05, seed=5)
    m = g.num_edges()
    assert m == round(0.05 * 100 * 99 / 2)
    assert g.num_nodes() == 100


def test_clustered_random_graph(spark):
    g, truth = clustered_random_graph(spark, n=30, k=3, p_intra=0.8, p_inter=0.01)
    lab = {r["id"]: r["label"] for r in truth.collect()}
    assert set(lab.values()) == {0, 1, 2}
    intra = (
        g.edges.join(
            truth.withColumnRenamed("id", "src").withColumnRenamed("label", "sl"), "src"
        )
        .join(truth.withColumnRenamed("id", "dst").withColumnRenamed("label", "dl"), "dst")
        .select((F.col("sl") == F.col("dl")).cast("int").alias("i"))
        .agg(F.avg("i"))
        .first()[0]
    )
    assert intra > 0.8  # intra edges dominate


def test_edge_list_roundtrip(spark, tmp_path):
    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 1.0), (2, 0, 3.0)])
    path = os.path.join(str(tmp_path), "el")
    write_edge_list(g, path)
    g2 = read_edge_list(spark, path, sep="\t")
    assert sorted(map(tuple, g2.edges.collect())) == sorted(map(tuple, g.edges.collect()))


def test_edge_list_string_ids(spark, tmp_path):
    p = tmp_path / "x.tsv"
    p.write_text("# comment\nalice\tbob\t2.0\nbob\tcarol\t1.0\n")
    g = read_edge_list(spark, str(p), continuous=False)
    assert g.num_nodes() == 3
    assert g.num_edges() == 2
    # dense ids in lexicographic key order: alice=0, bob=1, carol=2
    assert {tuple(r) for r in g.edges.select("src", "dst").collect()} == {
        (0, 1), (1, 0), (1, 2), (2, 1)
    }


def test_snap_reader(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text("# Directed graph\n0\t1\n1\t2\n")
    g = read_snap(spark, str(p))
    assert g.num_edges() == 2


def test_metis_reader(spark, tmp_path):
    # triangle + pendant: 4 nodes, 4 edges (METIS: 1-indexed, m counts once)
    p = tmp_path / "g.metis"
    p.write_text("4 4\n2 3\n1 3\n1 2 4\n3\n")
    g = read_metis(spark, str(p))
    assert g.num_nodes() == 4
    assert g.num_edges() == 4
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert deg == {0: 2, 1: 2, 2: 3, 3: 1}


def test_partition_roundtrip(spark, tmp_path):
    g = from_edge_rows(spark, [(0, 1)])
    labels = g.vertices.select("id", (F.col("id") * 10).alias("label"))
    path = os.path.join(str(tmp_path), "part")
    write_partition(labels, path)
    back = read_partition(spark, path)
    assert sorted(map(tuple, back.collect())) == [(0, 0), (1, 10)]


def test_watts_strogatz(spark):
    from networkit_spark.sources.generators import watts_strogatz

    g = watts_strogatz(spark, n=60, k=3, p=0.1, seed=11)
    assert g.num_nodes() == 60
    m = g.num_edges()
    assert 150 <= m <= 180  # n*k minus rewire collisions/dups
    # determinism
    g2 = watts_strogatz(spark, n=60, k=3, p=0.1, seed=11)
    e1 = {(r["src"], r["dst"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2
    # p=0 is exactly the ring lattice
    ring = watts_strogatz(spark, n=20, k=2, p=0.0)
    assert ring.num_edges() == 40
    degs = {r["id"]: r["degree"] for r in ring.degrees().collect()}
    assert set(degs.values()) == {4}


def test_barabasi_albert(spark):
    from networkit_spark.sources.generators import barabasi_albert

    g = barabasi_albert(spark, k=2, n_max=200, seed=3)
    assert g.num_nodes() == 200
    m = g.num_edges()
    assert 300 <= m <= 400  # ~k*n minus self/dup drops
    degs = sorted(
        (r["degree"] for r in g.degrees().collect()), reverse=True
    )
    # preferential attachment: heavy tail — max degree well above the mean
    mean = sum(degs) / len(degs)
    assert degs[0] > 4 * mean
    # determinism
    g2 = barabasi_albert(spark, k=2, n_max=200, seed=3)
    e1 = {(r["src"], r["dst"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2


def test_chung_lu_expected_degrees(spark):
    from networkit_spark.sources.generators import chung_lu

    # skewed expected degrees: few hubs, many leaves
    weights = [20.0] * 4 + [2.0] * 60
    g = chung_lu(spark, weights, seed=11)
    assert g.num_nodes() == 64
    deg = {
        r["src"]: r["c"]
        for r in g.edges.groupBy("src").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    hubs = sum(deg.get(i, 0) for i in range(4)) / 4.0
    leaves = sum(deg.get(i, 0) for i in range(4, 64)) / 60.0
    # hubs must have much higher realized degree than leaves, in the
    # right ballpark of the expected-degree targets
    assert hubs > 3 * leaves
    assert 8.0 <= hubs <= 32.0 and 0.5 <= leaves <= 5.0
    # deterministic
    g2 = chung_lu(spark, weights, seed=11)
    e1 = {(r["src"], r["dst"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2


def test_hyperbolic_matches_brute_force(spark):
    import math

    from networkit_spark.sources.generators import hyperbolic

    n, R, alpha = 200, 4.0, 1.0
    g = hyperbolic(spark, n=n, R=R, alpha=alpha, seed=5, angular_buckets=32)
    # reconstruct coordinates from the same deterministic columns
    coords = {
        r["id"]: (r["theta"], r["r"])
        for r in spark.range(n)
        .selectExpr(
            "id",
            "(abs(xxhash64(86, id)) % 281474976710656) / 281474976710656.0e0 * 2 * pi() as theta",
            f"acosh(1.0 + (abs(xxhash64(87, id)) % 281474976710656) / 281474976710656.0e0 * (cosh({alpha * R}) - 1)) / {alpha} as r",
        )
        .collect()
    }
    coshR = math.cosh(R)
    got = {
        (r["src"], r["dst"])
        for r in g.edges.filter("src < dst").collect()
    }
    must, may = set(), set()
    for u in range(n):
        for v in range(u + 1, n):
            tu, ru = coords[u]
            tv, rv = coords[v]
            cd = math.cosh(ru) * math.cosh(rv) - math.sinh(ru) * math.sinh(rv) * math.cos(tu - tv)
            if cd <= coshR - 1e-9:
                must.add((u, v))
            if cd <= coshR + 1e-9:
                may.add((u, v))
    # banded candidate generation is loss-free: exactly the brute-force set
    # (modulo floating-point threshold dust)
    assert must <= got <= may
    assert len(got) > 50  # non-degenerate fixture


def test_hyperbolic_prunes_and_stays_exact_large_R(spark):
    import math

    from networkit_spark.sources.generators import hyperbolic

    # larger R: rim nodes have narrow angular reach, pruning is active
    n, R, alpha = 150, 6.0, 0.9
    g = hyperbolic(spark, n=n, R=R, alpha=alpha, seed=8, angular_buckets=48)
    coords = {
        r["id"]: (r["theta"], r["r"])
        for r in spark.range(n)
        .selectExpr(
            "id",
            "(abs(xxhash64(137, id)) % 281474976710656) / 281474976710656.0e0 * 2 * pi() as theta",
            f"acosh(1.0 + (abs(xxhash64(138, id)) % 281474976710656) / 281474976710656.0e0 * (cosh({alpha * R}) - 1)) / {alpha} as r",
        )
        .collect()
    }
    coshR = math.cosh(R)
    got = {(r["src"], r["dst"]) for r in g.edges.filter("src < dst").collect()}
    must, may = set(), set()
    for u in range(n):
        for v in range(u + 1, n):
            tu, ru = coords[u]
            tv, rv = coords[v]
            cd = math.cosh(ru) * math.cosh(rv) - math.sinh(ru) * math.sinh(rv) * math.cos(tu - tv)
            if cd <= coshR - 1e-9:
                must.add((u, v))
            if cd <= coshR + 1e-9:
                may.add((u, v))
    assert must <= got <= may


def test_lfr_mixing_partition_and_determinism(spark):
    from networkit_spark.operators.coarsening import modularity
    from networkit_spark.sources.generators import lfr

    g, truth = lfr(spark, n=200, mu=0.15, seed=42)
    n = g.num_nodes()
    assert n == 200
    m = g.num_edges()
    assert m > 150  # power-law degrees with min 3 -> several hundred edges

    la = truth.select(F.col("id").alias("src"), F.col("label").alias("la"))
    lb = truth.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    ce = g.edges.filter(F.col("src") < F.col("dst")).join(la, "src").join(lb, "dst")
    inter = ce.filter(F.col("la") != F.col("lb")).count()
    frac = inter / ce.count()
    # realized mixing tracks mu (Chung-Lu realization, not exact)
    assert 0.05 < frac < 0.30

    # the planted partition is strongly modular at mu = 0.15
    q = modularity(g, truth.select("id", "label"))
    assert q > 0.45

    # ground truth covers all nodes, community sizes within bounds
    sizes = [
        r["c"] for r in truth.groupBy("label").agg(F.count("*").alias("c")).collect()
    ]
    assert sum(sizes) == n
    assert max(sizes) <= 40

    # deterministic in seed
    g2, _ = lfr(spark, n=200, mu=0.15, seed=42)
    e1 = sorted(map(tuple, g.edges.select("src", "dst").collect()))
    e2 = sorted(map(tuple, g2.edges.select("src", "dst").collect()))
    assert e1 == e2
    g3, _ = lfr(spark, n=200, mu=0.15, seed=7)
    e3 = sorted(map(tuple, g3.edges.select("src", "dst").collect()))
    assert e1 != e3


def test_havel_hakimi_realizes_sequence(spark):
    from networkit_spark.sources.generators import havel_hakimi

    seq = [3, 3, 2, 2, 2, 1, 1]  # graphical (sum even, Erdos-Gallai ok)
    g = havel_hakimi(spark, seq)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert [deg[i] for i in range(len(seq))] == seq

    # regular sequence
    g2 = havel_hakimi(spark, [2] * 6)
    deg2 = {r["id"]: r["degree"] for r in g2.degrees().collect()}
    assert all(d == 2 for d in deg2.values())

    # non-graphical raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        havel_hakimi(spark, [5, 1, 1, 1])


def test_stochastic_blockmodel_block_structure(spark):
    from networkit_spark.sources.generators import stochastic_blockmodel

    membership = [0] * 30 + [1] * 30 + [2] * 30
    affinity = [
        [0.4, 0.02, 0.0],
        [0.02, 0.4, 0.02],
        [0.0, 0.02, 0.4],
    ]
    g = stochastic_blockmodel(spark, membership, affinity, seed=42)
    mem = {i: b for i, b in enumerate(membership)}
    ce = [
        (r["src"], r["dst"])
        for r in g.edges.filter(F.col("src") < F.col("dst")).collect()
    ]
    intra = sum(1 for u, v in ce if mem[u] == mem[v])
    inter02 = sum(1 for u, v in ce if {mem[u], mem[v]} == {0, 2})
    # p=0 block pair yields NO edges; intra dominates
    assert inter02 == 0
    assert intra > len(ce) * 0.7
    # per-block intra density tracks 0.4 (expected-count realization)
    intra0 = sum(1 for u, v in ce if mem[u] == mem[v] == 0)
    dens0 = intra0 / (30 * 29 / 2)
    assert 0.25 < dens0 < 0.45

    # determinism
    g2 = stochastic_blockmodel(spark, membership, affinity, seed=42)
    e2 = sorted(
        (r["src"], r["dst"])
        for r in g2.edges.filter(F.col("src") < F.col("dst")).collect()
    )
    assert sorted(ce) == e2


def test_dorogovtsev_mendes_structure(spark):
    from networkit_spark.sources.generators import dorogovtsev_mendes

    g = dorogovtsev_mendes(spark, 30, seed=5)
    n, m = g.num_nodes(), g.num_edges()
    assert n == 30
    # m = 3 + 2(n-3); num_edges counts undirected edges once
    assert m == 3 + 2 * (30 - 3)
    # every node beyond the triangle has degree >= 2 and its two initial
    # targets are earlier nodes (edges only point backwards)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert all(deg[i] >= 2 for i in range(30))
    # connected (it grows from a triangle)
    from networkit_spark.operators.components import connected_components

    assert connected_components(g).select("label").distinct().count() == 1
    # deterministic
    g2 = dorogovtsev_mendes(spark, 30, seed=5)
    e1 = {(r["src"], r["dst"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2


def test_pub_web_radius_and_cap(spark):
    from networkit_spark.sources.generators import pub_web

    g = pub_web(spark, 150, num_dense_areas=4, neighborhood_radius=0.12,
                max_neighbors=6, seed=3)
    assert g.num_nodes() == 150
    assert g.num_edges() > 0
    # every edge joins points within the torus radius; a lower cap prunes
    # edges (the per-node keep list shrinks, like the reference's cap)
    g1 = pub_web(spark, 150, num_dense_areas=4, neighborhood_radius=0.12,
                 max_neighbors=2, seed=3)
    assert g1.num_edges() < g.num_edges()
    g2 = pub_web(spark, 150, num_dense_areas=4, neighborhood_radius=0.05,
                 max_neighbors=6, seed=3)
    assert g2.num_edges() < g.num_edges()


def test_mocnik_spatial_directed(spark):
    from networkit_spark.sources.generators import mocnik

    g = mocnik(spark, 200, density=1.8, seed=9)
    assert g.directed and g.num_nodes() == 200
    m = g.edges.count()
    assert m > 0
    # symmetric by the metric: u->v implies v->u
    e = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert all((b, a) in e for a, b in e)


def test_powerlaw_degree_sequence_feeds_havel_hakimi(spark):
    from networkit_spark.sources.generators import (
        havel_hakimi,
        powerlaw_degree_sequence,
    )

    seq = powerlaw_degree_sequence(40, 1, 8, 2.5, seed=11)
    assert len(seq) == 40 and sum(seq) % 2 == 0
    assert seq == sorted(seq, reverse=True)
    assert all(1 <= d <= 8 for d in seq)
    g = havel_hakimi(spark, seq)
    got = sorted(
        (r["degree"] for r in g.degrees().collect()), reverse=True
    )
    assert got == seq  # powerlaw sequences are graphical after parity fix


def test_mat_roundtrip_and_errors(spark, tmp_path):
    """MAT level-5 reader/writer (graphio.pyx:840-886 readMat/writeMat):
    roundtrip, zlib-compressed elements (scipy do_compression=True shape),
    missing-key / non-square errors, dense numeric fallback."""
    import struct
    import zlib

    import numpy as np

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.mat import (
        _MI_COMPRESSED, _MI_MATRIX, _tagged, read_mat, write_mat,
    )

    g = from_edge_rows(
        spark, [(0, 1, 2.0), (1, 2, 1.0), (3, 3, 1.0), (0, 4, 5.0)],
        num_nodes=6, weighted=True,
    )
    p = str(tmp_path / "g.mat")
    write_mat(g, p, key="G")
    g2 = read_mat(spark, p, key="G")
    canon = lambda gr: sorted(
        {(min(r["src"], r["dst"]), max(r["src"], r["dst"]))
         for r in gr.edges.collect()}
    )
    assert canon(g2) == canon(g)
    assert g2.vertices.count() == 6

    raw = open(p, "rb").read()
    pc = str(tmp_path / "gc.mat")
    with open(pc, "wb") as fh:
        fh.write(raw[:128] + _tagged(_MI_COMPRESSED, zlib.compress(raw[128:])))
    assert canon(read_mat(spark, pc, key="G")) == canon(g)

    import pytest

    with pytest.raises(KeyError, match="not found"):
        read_mat(spark, p, key="A")

    pns = str(tmp_path / "ns.mat")
    body = (
        _tagged(6, struct.pack("<II", 6, 0))
        + _tagged(5, struct.pack("<ii", 2, 3))
        + _tagged(1, b"B")
        + _tagged(9, np.arange(6, dtype="<f8").tobytes())
    )
    with open(pns, "wb") as fh:
        fh.write(raw[:128] + _tagged(_MI_MATRIX, body))
    with pytest.raises(ValueError, match="not square"):
        read_mat(spark, pns, key="B")

    pd_ = str(tmp_path / "d.mat")
    body = (
        _tagged(6, struct.pack("<II", 6, 0))
        + _tagged(5, struct.pack("<ii", 2, 2))
        + _tagged(1, b"D")
        + _tagged(9, np.array([0.0, 1.0, 1.0, 0.0], dtype="<f8").tobytes())
    )
    with open(pd_, "wb") as fh:
        fh.write(raw[:128] + _tagged(_MI_MATRIX, body))
    assert canon(read_mat(spark, pd_, key="D")) == [(0, 1)]


def test_thrill_binary_roundtrip(spark, tmp_path):
    """ThrillGraphBinaryReader/Writer (io/ThrillGraphBinaryReader.cpp:14-97):
    varint degree + uint32-LE u<=v half-edges per sequential node,
    symmetrized on read; multi-file concatenation; max-id guard."""
    import struct

    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.foreign_binary import read_thrill, write_thrill

    canon = lambda gr: sorted(
        {(min(r["src"], r["dst"]), max(r["src"], r["dst"]))
         for r in gr.edges.collect()}
    )
    g = from_edge_rows(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 4, 1.0), (3, 3, 1.0)],
        num_nodes=6, weighted=False,
    )
    p = str(tmp_path / "g.thrill")
    write_thrill(g, p)
    g2 = read_thrill(spark, p)
    assert canon(g2) == canon(g)
    assert g2.vertices.count() == 6

    raw = open(p, "rb").read()
    # the reference concatenates files at node-record boundaries; node 0's
    # record here = varint(2) + 2 uint32 = 9 bytes
    p1, p2 = str(tmp_path / "part1"), str(tmp_path / "part2")
    open(p1, "wb").write(raw[:9])
    open(p2, "wb").write(raw[9:])
    assert canon(read_thrill(spark, [p1, p2])) == canon(g)

    bad = str(tmp_path / "bad.thrill")
    open(bad, "wb").write(bytes([1]) + struct.pack("<I", 99))
    with pytest.raises(ValueError, match="larger than number of nodes"):
        read_thrill(spark, bad)


def test_graphtool_binary_roundtrip(spark, tmp_path):
    """GraphToolBinaryReader/Writer (io/GraphToolBinaryReader.cpp:16-133):
    magic+version+endianness header, directed byte, adaptive neighbor-id
    width (2-byte path via n=300), both endiannesses."""
    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.foreign_binary import (
        read_graphtool, write_graphtool,
    )

    canon = lambda gr: sorted(
        {(min(r["src"], r["dst"]), max(r["src"], r["dst"]))
         for r in gr.edges.collect()}
    )
    g = from_edge_rows(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 4, 1.0), (3, 3, 1.0)],
        num_nodes=6, weighted=False,
    )
    for le in (True, False):
        p = str(tmp_path / f"g_{le}.gt")
        write_graphtool(g, p, little_endian=le)
        gg = read_graphtool(spark, p)
        assert canon(gg) == canon(g) and not gg.directed

    dg = from_edge_rows(
        spark, [(0, 1, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        num_nodes=300, directed=True, weighted=False,
    )
    pd_ = str(tmp_path / "d.gt")
    write_graphtool(dg, pd_)
    dg2 = read_graphtool(spark, pd_)
    assert dg2.directed and dg2.vertices.count() == 300
    assert sorted((r["src"], r["dst"]) for r in dg2.edges.collect()) == [
        (0, 1), (1, 0), (2, 0)
    ]

    bad = str(tmp_path / "bad.gt")
    open(bad, "wb").write(b"notamagic")
    with pytest.raises(ValueError, match="header is broken"):
        read_graphtool(spark, bad)


def test_dibap_binary_roundtrip(spark, tmp_path):
    """DibapGraphReader (io/DibapGraphReader.cpp:32-180): big-endian 'GI'
    header, CSR adjacency, optional int edge weights, skipped vertex
    weights / coordinates; edges materialize from the v <= to[e] half."""
    import struct

    import pytest

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.foreign_binary import read_dibap, write_dibap

    g = from_edge_rows(
        spark, [(0, 1, 3.0), (1, 2, 2.0), (0, 4, 5.0), (3, 3, 7.0)],
        num_nodes=6, weighted=True,
    )
    p = str(tmp_path / "g.dibap")
    write_dibap(g, p)
    g2 = read_dibap(spark, p)
    want = sorted(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]), r["weight"])
        for r in g.edges.collect()
    )
    got = sorted(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]), r["weight"])
        for r in g2.edges.collect()
    )
    assert got == want
    assert g2.vertices.count() == 6 and g2.weighted

    # a hand-built file with vertex weights and coordinates: both skipped,
    # like the reference's own FIXME (unweighted edges, dvw=1, dxy=2)
    hb = str(tmp_path / "hand.dibap")
    of, to = [0, 1, 2], [1, 0]
    with open(hb, "wb") as f:
        f.write(struct.pack(">h", (ord("G") << 8) | ord("I")))
        f.write(struct.pack(">i", 2))       # V
        f.write(struct.pack(">i", 1))       # dvw
        f.write(struct.pack(">2i", 10, 20))  # vertex weights (skipped)
        f.write(struct.pack(">3i", *of))
        f.write(struct.pack(">2i", *to))
        f.write(struct.pack(">i", 0))       # dew
        f.write(struct.pack(">i", 2))       # dxy
        f.write(struct.pack(">4f", 0.0, 0.1, 0.2, 0.3))  # coords (skipped)
    g3 = read_dibap(spark, hb)
    assert g3.vertices.count() == 2
    assert {(r["src"], r["dst"]) for r in g3.edges.collect()} == {(0, 1), (1, 0)}

    bad = str(tmp_path / "bad.dibap")
    open(bad, "wb").write(struct.pack(">h", (ord("X") << 8) | ord("X")))
    with pytest.raises(ValueError, match="bad file structure"):
        read_dibap(spark, bad)


def test_read_raster_points(spark, tmp_path):
    """io/RasterReader.cpp:21-103 — header parse after 14-char keys, unit
    cell boxes with y decreasing per row, round(value * factor) points
    per cell, deterministic under the seed."""
    p = str(tmp_path / "pop.asc")
    with open(p, "w") as f:
        f.write("ncols         3\n")
        f.write("nrows         2\n")
        f.write("xllcorner     0.0\n")
        f.write("yllcorner     0.0\n")
        f.write("cellsize      1.0\n")
        f.write("NODATA_value  -9999\n")
        f.write("2 0 1\n")
        f.write("0 3 0\n")
    from networkit_spark.sources.io import read_raster

    pts = [(r["x"], r["y"]) for r in read_raster(spark, p).collect()]
    assert len(pts) == 2 + 1 + 3
    # row 0 cells: y in [0, 1]; row 1: y in [-1, 0]
    in_cell = lambda x, y, c, r: c <= x <= c + 1 and -r <= y <= 1 - r
    assert sum(in_cell(x, y, 0, 0) for x, y in pts) == 2
    assert sum(in_cell(x, y, 2, 0) for x, y in pts) == 1
    assert sum(in_cell(x, y, 1, 1) for x, y in pts) == 3
    # normalization factor halves counts (round)
    half = read_raster(spark, p, normalization_factor=0.5).collect()
    assert len(half) == 1 + 1 + 2  # std::round halves away from zero: 1.0->1, 0.5->1, 1.5->2
    # determinism
    again = [(r["x"], r["y"]) for r in read_raster(spark, p).collect()]
    assert pts == again


def test_gexf_dynamic_reader_spells_and_weights(spark, tmp_path):
    """GEXFIO.py GEXFReader dynamic path: initial elements (no start),
    spell add/remove/restore, dynamic weight attvalues (first one = edge
    addition), date timeformat via lexicographic rank."""
    from networkit_spark.sources.io import read_gexf_dynamic

    text = """<?xml version="1.0" encoding="UTF-8"?>
<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">
  <graph mode="dynamic" timeformat="double" defaultedgetype="undirected">
    <attributes class="edge" mode="dynamic">
      <attribute id="weight" title="Weight" type="float"/>
    </attributes>
    <nodes>
      <node id="a"/>
      <node id="b"/>
      <node id="c">
        <spells>
          <spell start="1.0" end="2.0"/>
          <spell start="3.0"/>
        </spells>
      </node>
    </nodes>
    <edges>
      <edge id="0" source="a" target="b" weight="2.0"/>
      <edge id="1" source="a" target="c" start="1.0" end="2.0"/>
      <edge id="2" source="b" target="c">
        <attvalues>
          <attvalue for="weight" value="4.0" start="3.0"/>
          <attvalue for="weight" value="5.0" start="4.0"/>
        </attvalues>
      </edge>
    </edges>
  </graph>
</gexf>
"""
    p = str(tmp_path / "dyn.gexf")
    open(p, "w").write(text)
    g, events = read_gexf_dynamic(spark, p)
    # initial graph: nodes a,b (c is dynamic), edge (a,b)
    assert g.num_nodes() == 2
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {(0, 1), (1, 0)}
    ev = [
        (r["t"], r["etype"], r["u"], r["v"])
        for r in events.orderBy("t", "etype", "u").collect()
    ]
    # c: add @1, remove @2, RESTORE @3 (second spell after deletion)
    assert (0, "NODE_ADD", 2, None) in ev
    assert (1, "NODE_REMOVE", 2, None) in ev
    assert (2, "NODE_RESTORE", 2, None) in ev
    # edge (a,c): add @1, remove @2; edge (b,c): first attvalue adds @3,
    # second updates @4
    assert (0, "EDGE_ADD", 0, 2) in ev
    assert (1, "EDGE_REMOVE", 0, 2) in ev
    assert (2, "EDGE_ADD", 1, 2) in ev
    assert (3, "EDGE_WEIGHT_UPDATE", 1, 2) in ev
    wu = [r for r in events.collect() if r["etype"] == "EDGE_WEIGHT_UPDATE"]
    assert len(wu) == 1 and wu[0]["w"] == 5.0


def test_gexf_dynamic_roundtrip_fold(spark, tmp_path):
    """write_gexf_dynamic -> read_gexf_dynamic roundtrip on a dense-id
    fixture: the event stream survives byte-exactly (same ids, times,
    types) and folding it yields the same final graph."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import read_gexf_dynamic, write_gexf_dynamic
    from networkit_spark.streaming.graph_events import apply_events

    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 3.0)], num_nodes=3)
    events = spark.createDataFrame(
        [
            (0, "NODE_ADD", 3, None, None),
            (1, "EDGE_ADD", 2, 3, 4.0),
            (2, "EDGE_REMOVE", 0, 1, None),
            (3, "EDGE_WEIGHT_UPDATE", 2, 3, 7.0),
        ],
        "t long, etype string, u long, v long, w float",
    )
    p = str(tmp_path / "rt.gexf")
    write_gexf_dynamic(g, p, events)
    g2, ev2 = read_gexf_dynamic(spark, p)
    assert g2.num_nodes() == 3
    got = {
        (r["t"], r["etype"], r["u"], r["v"], r["w"]) for r in ev2.collect()
    }
    want = {
        (0, "NODE_ADD", 3, None, None),
        (1, "EDGE_ADD", 2, 3, 4.0),
        # removal carries the element's weight attr through, like the
        # reference's createEvent (GEXFIO.py:200-217 passes w for every
        # edge event type)
        (2, "EDGE_REMOVE", 0, 1, 2.0),
        (3, "EDGE_WEIGHT_UPDATE", 2, 3, 7.0),
    }
    assert got == want
    fa = apply_events(g, events)
    fb = apply_events(g2, ev2)
    ea = {(r["src"], r["dst"], r["weight"]) for r in fa.edges.collect()}
    eb = {(r["src"], r["dst"], r["weight"]) for r in fb.edges.collect()}
    assert ea == eb and (2, 3, 7.0) in ea and (0, 1, 2.0) not in ea


def test_gexf_dynamic_writer_dedups_churned_edges(spark, tmp_path):
    """An initial edge removed then re-added must serialize as ONE <edge>
    element carrying the full spell history (end, then start) — never two
    elements each repeating it; duplicate NODE_ADDs collapse the same way,
    and a null EDGE_ADD weight defaults to 1.0 instead of weight="None"."""
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import read_gexf_dynamic, write_gexf_dynamic
    from networkit_spark.streaming.graph_events import apply_events

    g = from_edge_rows(spark, [(0, 1, 2.0)], num_nodes=2)
    events = spark.createDataFrame(
        [
            (1, "EDGE_REMOVE", 0, 1, None),
            (2, "EDGE_ADD", 0, 1, 2.0),
            (3, "NODE_ADD", 2, None, None),
            (3, "NODE_ADD", 2, None, None),   # duplicate add, one element
            (4, "EDGE_ADD", 1, 2, None),      # null w -> 1.0, not "None"
        ],
        "t long, etype string, u long, v long, w float",
    )
    p = str(tmp_path / "churn.gexf")
    write_gexf_dynamic(g, p, events)
    text = open(p).read()
    assert text.count('source="0" target="1"') == 1
    assert text.count('<node id="2"') == 1
    assert "None" not in text
    g2, ev2 = read_gexf_dynamic(spark, p)
    # initial edge exactly once; churn streams fold stepwise (remove@1
    # then re-add@2 — one simultaneous batch would cancel the re-add)
    assert g2.num_edges() == 1 and g2.num_nodes() == 2
    fa, fb = g, g2
    for t in (1, 2, 3, 4):
        fa = apply_events(fa, events.filter(f"t = {t}").drop("t"))
        fb = apply_events(fb, ev2.filter(f"t = {t}").drop("t"))
    ea = {(r["src"], r["dst"], r["weight"]) for r in fa.edges.collect()}
    eb = {(r["src"], r["dst"], r["weight"]) for r in fb.edges.collect()}
    assert ea == eb and (0, 1, 2.0) in ea and (1, 2, 1.0) in ea


def test_nx_adapter_roundtrip(spark):
    """nxadapter parity (networkit/nxadapter.py:20-70): insertion-order
    dense ids, weight attribute only when named, directedness preserved,
    node/edge counts asserted like the reference's own asserts; converted
    graphs agree with networkx on components and degrees."""
    import networkx as nx

    from networkit_spark.operators.components import connected_components
    from networkit_spark.sources.nxadapter import graph_to_nx, nx_to_graph

    nxg = nx.Graph()
    nxg.add_edges_from(
        [("a", "b", {"w": 2.0}), ("b", "c", {"w": 1.5}), ("d", "e", {"w": 4.0})]
    )
    nxg.add_node("f")  # isolated

    g, idmap = nx_to_graph(spark, nxg, weight_attr="w")
    assert g.num_nodes() == nxg.number_of_nodes()
    assert g.num_edges() == nxg.number_of_edges()
    assert set(idmap.values()) == set(range(6))
    # weights carried through the named attribute
    w = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])): r["weight"]
         for r in g.edges.collect()}
    assert w[(idmap["a"], idmap["b"])] == 2.0 if idmap["a"] < idmap["b"] else True
    # component structure matches networkx
    labels = {r["id"]: r["label"]
              for r in connected_components(g, max_iterations=8).collect()}
    nx_comps = {frozenset(idmap[n] for n in c)
                for c in nx.connected_components(nxg)}
    got_comps: dict[int, set] = {}
    for i, lbl in labels.items():
        got_comps.setdefault(lbl, set()).add(i)
    assert {frozenset(c) for c in got_comps.values()} == nx_comps

    # roundtrip back: same nodes/edges/weights, undirected
    back = graph_to_nx(g)
    assert not back.is_directed()
    assert back.number_of_nodes() == 6 and back.number_of_edges() == 3
    assert back[idmap["d"]][idmap["e"]]["weight"] == 4.0
    # degree parity node for node
    nx_deg = {idmap[n]: d for n, d in nxg.degree()}
    assert {n: d for n, d in back.degree()} == nx_deg

    # directed, unweighted path
    dg = nx.DiGraph([(0, 1), (1, 2)])
    g2, m2 = nx_to_graph(spark, dg)
    assert g2.directed and g2.num_edges() == 2
    back2 = graph_to_nx(g2)
    assert back2.is_directed()
    assert set(back2.edges()) == {(m2[0], m2[1]), (m2[1], m2[2])}


def test_gephi_events_match_reference_protocol(spark):
    """to_gephi_events == GephiStreamingClient.exportGraph's event stream
    (gephi/streaming.py:39-77, pyclient.py:68-83) replayed in pure Python
    on the same fixture: same event order, ids, grid coordinates, attrs."""
    import json
    import math

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.gephi import to_gephi_events

    rows = [(0, 1, 1.0), (1, 2, 1.0), (3, 0, 1.0), (2, 2, 1.0)]
    g = from_edge_rows(spark, rows, directed=False, weighted=True)
    got = [
        json.loads(r["event"])
        for r in to_gephi_events(g).orderBy("seq").collect()
    ]

    # reference replica
    ids = [0, 1, 2, 3]
    n = len(ids)
    side = math.ceil(math.sqrt(n))
    step = 2000 / side
    offset = 2000 / 2
    want = []
    for i, u in enumerate(ids):
        want.append(
            {"an": {str(u): {"size": 2.0, "r": 0.6, "g": 0.6, "b": 0.6,
                             "y": (i // side) * step - offset,
                             "x": (i % side) * step - offset}}}
        )
    for (u, v) in [(0, 1), (0, 3), (1, 2), (2, 2)]:  # canonical, sorted
        want.append(
            {"ae": {f"{min(u,v)}-{max(u,v)}": {
                "source": min(u, v), "target": max(u, v), "directed": False}}}
        )
    assert got == want


def test_gephi_events_directed_edge_ids(spark):
    import json

    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.gephi import to_gephi_events

    g = from_edge_rows(spark, [(1, 0, 1.0)], directed=True, weighted=True)
    ev = [json.loads(r["event"]) for r in to_gephi_events(g).orderBy("seq").collect()]
    ae = [e for e in ev if "ae" in e]
    assert list(ae[0]["ae"]) == ["1->0"]
    assert ae[0]["ae"]["1->0"]["directed"] is True
