"""Deterministic samplers (GraphTools.cpp:76-180 analogues), edge sorting,
and the METIS writer roundtrip."""

from networkit_spark.graph import from_edge_rows
from networkit_spark.operators.sampling import (
    random_neighbor,
    sample_edges,
    sample_nodes,
    sort_edges_by_weight,
)
from networkit_spark.sources.io import read_metis, write_metis

EDGES = [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 3.0), (3, 0, 1.0), (1, 3, 5.0)]


def test_sample_nodes_deterministic_and_uniformish(spark):
    g = from_edge_rows(spark, EDGES)
    a = [r["id"] for r in sample_nodes(g, 2, seed=7).collect()]
    b = [r["id"] for r in sample_nodes(g, 2, seed=7).collect()]
    assert a == b and len(a) == 2
    c = [r["id"] for r in sample_nodes(g, 2, seed=8).collect()]
    assert set(a) != set(c) or a != c or True  # different seed may differ
    full = [r["id"] for r in sample_nodes(g, 10, seed=7).collect()]
    assert sorted(full) == [0, 1, 2, 3]  # k > n returns all


def test_sample_edges_canonical(spark):
    g = from_edge_rows(spark, EDGES)
    got = {(r["src"], r["dst"]) for r in sample_edges(g, 3, seed=1).collect()}
    assert len(got) == 3
    assert all(s <= d for s, d in got)
    all_e = {(min(u, v), max(u, v)) for u, v, _ in EDGES}
    assert got <= all_e


def test_random_neighbor(spark):
    g = from_edge_rows(spark, EDGES)
    nb = random_neighbor(g, 1, seed=3)
    assert nb in {0, 2, 3}
    assert random_neighbor(g, 1, seed=3) == nb
    # isolated vertex -> None
    g2 = from_edge_rows(spark, [(0, 1)], num_nodes=3)
    assert random_neighbor(g2, 2) is None


def test_sort_edges_by_weight(spark):
    g = from_edge_rows(spark, EDGES)
    rows = sort_edges_by_weight(g, decreasing=True).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append((r["pos"], r["weight"], r["dst"]))
    for src, lst in per_src.items():
        lst.sort()
        weights = [w for _, w, _ in lst]
        assert weights == sorted(weights, reverse=True), src


def test_metis_roundtrip(spark, tmp_path):
    g = from_edge_rows(spark, [(u, v) for u, v, _ in EDGES])
    path = str(tmp_path / "g.metis")
    write_metis(g, path)
    header = open(path).readline().split()
    assert header == ["4", "5"]
    g2 = read_metis(spark, path)
    assert g2.num_nodes() == 4 and g2.num_edges() == 5
    e1 = {(r["src"], r["dst"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert e1 == e2


def test_gml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_gml, write_gml

    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 1.5), (0, 2, 1.0)])
    path = str(tmp_path / "g.gml")
    write_gml(g, path)
    g2 = read_gml(spark, path)
    assert g2.num_nodes() == 3 and not g2.directed
    e1 = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()}
    assert e1 == e2

    gd = from_edge_rows(spark, [(0, 1), (1, 2)], directed=True)
    pd = str(tmp_path / "d.gml")
    write_gml(gd, pd)
    gd2 = read_gml(spark, pd)
    assert gd2.directed and gd2.num_edges() == 2


def test_graphml_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_graphml, write_graphml

    g = from_edge_rows(spark, [(0, 1, 2.0), (1, 2, 1.5), (0, 2, 1.0)])
    path = str(tmp_path / "g.graphml")
    write_graphml(g, path)
    g2 = read_graphml(spark, path)
    assert g2.num_nodes() == 3 and not g2.directed
    e1 = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    e2 = {(r["src"], r["dst"], r["weight"]) for r in g2.edges.collect()}
    assert e1 == e2

    gd = from_edge_rows(spark, [(0, 1), (1, 2)], directed=True)
    pd = str(tmp_path / "d.graphml")
    write_graphml(gd, pd)
    gd2 = read_graphml(spark, pd)
    assert gd2.directed and gd2.num_edges() == 2


def test_graphml_reads_foreign_namespaced_file(spark, tmp_path):
    # a file another tool wrote: namespace prefix, no weight data
    from networkit_spark.sources.io import read_graphml

    xml = """<?xml version="1.0"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <graph id="G" edgedefault="undirected">
    <node id="a"/><node id="b"/><node id="c"/>
    <edge source="a" target="b"/>
    <edge source="b" target="c"/>
  </graph>
</graphml>"""
    p = tmp_path / "foreign.graphml"
    p.write_text(xml)
    g = read_graphml(spark, str(p))
    assert g.num_nodes() == 3 and g.num_edges() == 2 and not g.directed


def test_konect_reader_sym_weighted(spark, tmp_path):
    from networkit_spark.sources.io import read_konect

    p = tmp_path / "g.konect"
    p.write_text(
        "% sym posweighted\n% 3 4 4\n1 2 2.5\n2 3 1.0\n1 4 0.5\n1 2 1.5\n"
    )
    g = read_konect(spark, str(p))
    assert not g.directed and g.weighted
    e = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    # duplicate 1-2 rows summed (SUM_WEIGHTS_UP handling), symmetrized
    assert e[(0, 1)] == 4.0 and e[(1, 0)] == 4.0
    assert e[(0, 3)] == 0.5 and g.num_nodes() == 4


def test_konect_reader_asym_unweighted(spark, tmp_path):
    from networkit_spark.sources.io import read_konect

    p = tmp_path / "d.konect"
    p.write_text("% asym unweighted\n1 2\n2 3\n3 1\n")
    g = read_konect(spark, str(p))
    assert g.directed and not g.weighted
    assert {(r["src"], r["dst"]) for r in g.edges.collect()} == {
        (0, 1), (1, 2), (2, 0)
    }


def test_matrix_market_symmetric_pattern(spark, tmp_path):
    from networkit_spark.sources.io import read_matrix_market

    p = tmp_path / "g.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% a comment\n4 4 3\n2 1\n3 1\n4 3\n"
    )
    g = read_matrix_market(spark, str(p))
    assert not g.directed and g.num_nodes() == 4
    e = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert e == {(1, 0), (0, 1), (2, 0), (0, 2), (3, 2), (2, 3)}


def test_matrix_market_general_real(spark, tmp_path):
    from networkit_spark.sources.io import read_matrix_market

    p = tmp_path / "m.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 3 2\n1 2 0.5\n3 1 2.0\n"
    )
    g = read_matrix_market(spark, str(p))
    assert g.directed and g.weighted
    e = {(r["src"], r["dst"], r["weight"]) for r in g.edges.collect()}
    assert e == {(0, 1, 0.5), (2, 0, 2.0)}


def test_dot_writer(spark, tmp_path):
    from networkit_spark.sources.io import write_dot

    g = from_edge_rows(spark, [(0, 1), (1, 2)])
    p = tmp_path / "g.dot"
    write_dot(g, str(p))
    txt = p.read_text()
    assert txt.startswith("graph G {") and "0 -- 1;" in txt and "1 -- 2;" in txt
    gd = from_edge_rows(spark, [(0, 1)], directed=True)
    pd = tmp_path / "d.dot"
    write_dot(gd, str(pd))
    assert "digraph" in pd.read_text() and "0 -> 1;" in pd.read_text()


# ---- partition / cover IO breadth (round 3) ---------------------------------

def _labels_df(spark, pairs):
    return spark.createDataFrame(pairs, "id long, label long")


def test_text_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import read_text_partition, write_text_partition

    path = str(tmp_path / "p.ptn")
    labels = _labels_df(spark, [(0, 2), (1, 2), (2, 0), (3, 1)])
    write_text_partition(labels, path)
    assert open(path).read() == "2\n2\n0\n1\n"
    back = {r["id"]: r["label"] for r in read_text_partition(spark, path).collect()}
    assert back == {0: 2, 1: 2, 2: 0, 3: 1}


def test_text_partition_reader_skips_comments(spark, tmp_path):
    from networkit_spark.sources.io import read_text_partition

    path = str(tmp_path / "c.ptn")
    with open(path, "w") as f:
        f.write("# header\n5\n*vertices\n7\n")
    back = {r["id"]: r["label"] for r in read_text_partition(spark, path).collect()}
    assert back == {0: 5, 1: 7}


def test_edge_list_partition_reader(spark, tmp_path):
    from networkit_spark.sources.io import read_edge_list_partition

    path = str(tmp_path / "elp.ptn")
    with open(path, "w") as f:
        f.write("# comment\n1 4\n2 4\n3 9\n")
    back = {
        r["id"]: r["label"]
        for r in read_edge_list_partition(spark, path, first_node=1).collect()
    }
    assert back == {0: 4, 1: 4, 2: 9}


def test_binary_partition_roundtrip_both_widths(spark, tmp_path):
    from networkit_spark.sources.io import (
        read_binary_partition,
        write_binary_partition,
    )

    labels = _labels_df(spark, [(0, 3), (1, 0), (2, 2 ** 33)])
    p8 = str(tmp_path / "p8.bin")
    write_binary_partition(labels, p8, width=8)
    assert open(p8, "rb").read()[:8] == (3).to_bytes(8, "little")
    back = {
        r["id"]: r["label"] for r in read_binary_partition(spark, p8, 8).collect()
    }
    assert back == {0: 3, 1: 0, 2: 2 ** 33}
    # width 4 overflows like the reference
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_binary_partition(labels, str(tmp_path / "p4.bin"), width=4)
    small = _labels_df(spark, [(0, 1), (1, 2)])
    p4 = str(tmp_path / "ok4.bin")
    write_binary_partition(small, p4, width=4)
    back4 = {
        r["id"]: r["label"] for r in read_binary_partition(spark, p4, 4).collect()
    }
    assert back4 == {0: 1, 1: 2}


def test_binary_edge_list_partition_roundtrip(spark, tmp_path):
    from networkit_spark.sources.io import (
        read_binary_edge_list_partition,
        write_binary_edge_list_partition,
    )

    labels = _labels_df(spark, [(0, 5), (1, 5), (2, 1)])
    path = str(tmp_path / "belp.bin")
    write_binary_edge_list_partition(labels, path, first_node=1, width=4)
    raw = open(path, "rb").read()
    assert raw[:4] == (1).to_bytes(4, "little")  # id 0 + firstNode 1
    assert raw[4:8] == (5).to_bytes(4, "little")
    back = {
        r["id"]: r["label"]
        for r in read_binary_edge_list_partition(
            spark, path, first_node=1, width=4
        ).collect()
    }
    assert back == {0: 5, 1: 5, 2: 1}


def test_snap_cover_reader_with_id_map(spark, tmp_path):
    from networkit_spark.sources.io import read_snap_cover

    path = str(tmp_path / "cmty.txt")
    with open(path, "w") as f:
        f.write("# SNAP communities\n101 103\n103 105\n")
    raw = read_snap_cover(spark, path)
    assert {(r["id"], r["label"]) for r in raw.collect()} == {
        (101, 0), (103, 0), (103, 1), (105, 1),
    }
    id_map = spark.createDataFrame(
        [(101, 0), (103, 1), (105, 2)], "orig long, id long"
    )
    mapped = read_snap_cover(spark, path, id_map)
    assert {(r["id"], r["label"]) for r in mapped.collect()} == {
        (0, 0), (1, 0), (1, 1), (2, 1),
    }


def test_dot_partition_writer(spark, tmp_path):
    from networkit_spark.graph import from_edge_rows
    from networkit_spark.sources.io import write_dot_partition

    # nodes 0-3 in a path, node 4 isolated (must be omitted like the ref)
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=5)
    labels = _labels_df(spark, [(0, 7), (1, 7), (2, 9), (3, 9), (4, 9)])
    path = str(tmp_path / "p.dot")
    write_dot_partition(g, labels, path)
    txt = open(path).read()
    assert txt.startswith("graph {\n") and txt.endswith("}\n")
    assert '0 [style=filled, color="0,0.99,0.99", label=7];' in txt
    assert '2 [style=filled, color="0.5,0.99,0.99", label=9];' in txt
    assert "4 [" not in txt  # isolated node skipped
    assert "0 -- 1;" in txt and "2 -- 3;" in txt


def test_edge_switching_markov_chain_generator(spark):
    from networkit_spark.sources.generators import edge_switching_markov_chain

    seq = [3, 3, 2, 2, 2, 2]
    g = edge_switching_markov_chain(spark, seq, rounds=6, seed=11)
    degs = {
        r["id"]: r["degree"] for r in g.degrees().select("id", "degree").collect()
    }
    assert [degs[i] for i in range(6)] == seq  # exact sequence preserved
    # simple graph: no self loops, no duplicate edges
    e = g.edges.filter("src < dst")
    assert e.count() == sum(seq) // 2
    assert e.distinct().count() == e.count()
    assert g.edges.filter("src = dst").count() == 0
    # deterministic in the seed
    g2 = edge_switching_markov_chain(spark, seq, rounds=6, seed=11)
    assert {tuple(r) for r in g.edges.collect()} == {
        tuple(r) for r in g2.edges.collect()
    }
