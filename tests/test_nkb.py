"""NetworKit binary (`nkbg002`) format: varint/zigzag codec units against
the spec examples in NetworkitBinaryGraph.hpp:60-74, and reader/writer
roundtrips across weight formats, chunk counts, direction, self-loops,
and deleted-node flags (io/test/IOGTest.cpp testNetworkitBinary* role)."""

import struct

from networkit_spark.graph import from_edge_rows
from networkit_spark.sources.nkb import (
    W_DOUBLE,
    W_FLOAT,
    W_NONE,
    W_SIGNED_VARINT,
    W_VARINT,
    _encode_weight,
    read_networkit_binary,
    varint_decode,
    varint_encode,
    write_networkit_binary,
    zigzag_decode,
    zigzag_encode,
)


def test_varint_spec_examples():
    # zero encodes as the bare header byte 0b0000_0001
    assert varint_encode(0) == b"\x01"
    # 7-bit value fits entirely into the header byte (hpp:63-66)
    x = 0b1111111
    enc = varint_encode(x)
    assert len(enc) == 1 and enc[0] & 1 == 1
    # 8-bit value needs one data byte (hpp:68-73)
    enc = varint_encode(0b11111111)
    assert len(enc) == 2 and enc[0] & 0b11 == 0b10
    # >= 2^56 uses the 9-byte escape (header byte zero)
    big = (1 << 60) + 12345
    enc = varint_encode(big)
    assert len(enc) == 9 and enc[0] == 0


def test_varint_roundtrip_sweep():
    vals = [0, 1, 2, 127, 128, 255, 256, 300, 2**14 - 1, 2**14, 2**21,
            2**28 + 7, 2**35, 2**42 + 1, 2**49, 2**56 - 1, 2**56, 2**63,
            2**64 - 1]
    buf = b"".join(varint_encode(v) for v in vals)
    pos = 0
    for v in vals:
        got, pos = varint_decode(buf, pos)
        assert got == v
    assert pos == len(buf)


def test_zigzag():
    for v in [0, 1, -1, 2, -2, 63, -64, 2**40, -(2**40)]:
        assert zigzag_decode(zigzag_encode(v)) == v
    # sign lives in the LSB (hpp:130-134)
    assert zigzag_encode(0) == 0
    assert zigzag_encode(-1) == 1
    assert zigzag_encode(1) == 2


def test_double_weight_codec_bytes():
    # DOUBLE payloads are raw little-endian f64 (NetworkitBinaryReader.cpp:152)
    w = 1.0 / 3.0
    assert struct.unpack("<d", _encode_weight(w, W_DOUBLE))[0] == w


def _edge_set(g):
    return {(r["src"], r["dst"], round(float(r["weight"]), 5)) for r in g.edges.collect()}


def _vset(g):
    return {r["id"] for r in g.vertices.collect()}


def _roundtrip(spark, g, tmp_path, chunks=3, expect_fmt=None):
    path = str(tmp_path / "g.nkbg")
    write_networkit_binary(g, path, chunks=chunks)
    if expect_fmt is not None:
        with open(path, "rb") as f:
            head = f.read(24)
        features = struct.unpack("<q", head[16:24])[0]
        assert (features & 0xE) >> 1 == expect_fmt
    back = read_networkit_binary(spark, path)
    assert back.directed == g.directed
    assert _vset(back) == _vset(g)
    assert _edge_set(back) == _edge_set(g)
    return back


def test_roundtrip_undirected_int_weights(spark, tmp_path):
    g = from_edge_rows(
        spark, [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 3.0), (3, 0, 1.0), (2, 2, 4.0)]
    )
    back = _roundtrip(spark, g, tmp_path, chunks=3, expect_fmt=W_VARINT)
    assert back.weighted


def test_roundtrip_directed_float_weights(spark, tmp_path):
    g = from_edge_rows(
        spark, [(0, 1, 0.5), (1, 2, 2.25), (2, 0, 1.75), (4, 1, 0.125)],
        directed=True,
    )
    back = _roundtrip(spark, g, tmp_path, chunks=2, expect_fmt=W_FLOAT)
    assert back.directed


def test_roundtrip_signed_weights(spark, tmp_path):
    g = from_edge_rows(spark, [(0, 1, -2.0), (1, 2, 5.0)], directed=True)
    _roundtrip(spark, g, tmp_path, chunks=1, expect_fmt=W_SIGNED_VARINT)


def test_roundtrip_unweighted(spark, tmp_path):
    g = from_edge_rows(spark, [(0, 1), (1, 2), (2, 0)], weighted=False)
    back = _roundtrip(spark, g, tmp_path, chunks=2, expect_fmt=W_NONE)
    assert not back.weighted


def test_roundtrip_deleted_nodes_and_isolated(spark, tmp_path):
    # node 5 isolated but present; node 3 removed -> flag bit cleared
    g = from_edge_rows(spark, [(0, 1, 1.0), (1, 2, 1.0), (4, 0, 1.0)], num_nodes=6)
    g = g.remove_nodes(g.vertices.sparkSession.createDataFrame([(3,)], "id long"))
    back = _roundtrip(spark, g, tmp_path, chunks=4)
    assert _vset(back) == {0, 1, 2, 4, 5}


def test_many_chunks_clamped(spark, tmp_path):
    # chunks > nodes is clamped like the writer's INFO path
    g = from_edge_rows(spark, [(0, 1, 1.0)])
    _roundtrip(spark, g, tmp_path, chunks=64)
