"""NetworKit binary graph format (`nkbg002`) reader + writer (SURVEY §2.9).

The reference's native on-disk format — documented in
`networkit/cpp/io/NetworkitBinaryGraph.md` and implemented by
`io/NetworkitBinaryReader.cpp:20-236` / `NetworkitBinaryWriter.cpp:22-350`
over the varint/zigzag helpers in
`include/networkit/io/NetworkitBinaryGraph.hpp:75-141`. Layout:

    header (80 B, little-endian u64 fields)
    base data:   u8 nodeFlags[nodes] (bit 0 set == node exists),
                 u64 firstVertex[chunks-1]
    adj block:   u64 chunkOffsets[chunks-1], u64 totalEdges, varint data
                 (per node: varint(outDeg), outDeg x varint(neighbor))
    transpose:   same shape over in-neighbors
    weights x2:  u64 chunkOffsets[chunks-1], per-edge payload in adj order
                 (varint / zigzag varint / f32 / f64 by the features field)

Undirected graphs store neighbor v in the adj list iff v <= u and in the
transpose iff v >= u (NetworkitBinaryWriter.cpp:193-200), so each edge is
encoded exactly once per block and self-loops land in both.

Spark mapping: the chunk is the reference's own parallelism unit (the
reader decodes chunks under `#pragma omp parallel for`,
NetworkitBinaryReader.cpp:229-232). Here the driver reads only the 80-byte
header plus the small offset arrays, then each Spark task seeks to its
chunk's byte slice and decodes it — reading stays chunk-parallel at any
chunk count (at cluster scale the path is a shared filesystem, exactly like
the reference's MPI deployments). The writer collects to the driver first
(fixture-tier, same documented stance as `write_metis`): a 100 TB graph
would be written as parquet/bucketed tables, not a single sequential
binary file whose chunk offsets are prefix sums.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql import SparkSession

from networkit_spark.graph import EDGE_SCHEMA, Graph

MAGIC = b"nkbg002\x00"
_DIR_MASK = 0x1
_WGHT_MASK = 0xE
_WGHT_SHIFT = 1

# WEIGHT_FORMAT enum (NetworkitBinaryGraph.hpp:34-40)
W_NONE, W_VARINT, W_SIGNED_VARINT, W_DOUBLE, W_FLOAT = 0, 1, 2, 3, 4


# ---- varint / zigzag (NetworkitBinaryGraph.hpp:75-141) --------------------


def varint_encode(value: int) -> bytes:
    """tlx-style varint: the header byte's least-significant set-bit position
    encodes the data-byte count; spare header bits hold the value's low bits."""
    if value == 0:
        return b"\x01"
    if value >= 1 << 56:
        return b"\x00" + value.to_bytes(8, "little")
    bits = value.bit_length()
    data_bytes = (bits - 1) // 7
    head = (1 << data_bytes) | ((value << (data_bytes + 1)) & 0xFF)
    value >>= 7 - data_bytes
    return bytes([head]) + value.to_bytes(data_bytes, "little")


def varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    b0 = buf[pos]
    if b0 == 0:
        return int.from_bytes(buf[pos + 1 : pos + 9], "little"), pos + 9
    n = (b0 & -b0).bit_length() - 1  # position of least significant set bit
    decoded = b0 >> (n + 1)
    shift = 7 - n
    for i in range(n):
        decoded |= buf[pos + 1 + i] << shift
        shift += 8
    return decoded, pos + 1 + n


def zigzag_encode(value: int) -> int:
    return ((value << 1) ^ (value >> 63)) & ((1 << 64) - 1)


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


# ---- reader ----------------------------------------------------------------


@dataclass
class _ChunkSlice:
    first: int  # first vertex id of the chunk
    count: int  # number of vertex slots in the chunk
    adj_start: int  # absolute file offset of the chunk's adj varint data
    wght_start: int  # absolute file offset of the chunk's adj weights (or -1)
    weight_fmt: int
    directed: bool
    path: str


def _decode_chunk(c: _ChunkSlice):
    """Decode one chunk's adjacency + weight slice into (src, dst, w) rows.
    The transpose block is redundant for reconstruction (it mirrors the adj
    split) and is never read."""
    with open(c.path, "rb") as f:
        f.seek(c.adj_start)
        # upper bound: read to weight block or a generous slab; decoding is
        # self-delimiting, so over-reading is harmless
        adj = f.read()
    pos = 0
    wbuf = b""
    if c.weight_fmt != W_NONE:
        with open(c.path, "rb") as f:
            f.seek(c.wght_start)
            wbuf = f.read()
    wpos = 0
    out = []
    for i in range(c.count):
        u = c.first + i
        deg, pos = varint_decode(adj, pos)
        for _ in range(deg):
            v, pos = varint_decode(adj, pos)
            if c.weight_fmt == W_NONE:
                w = 1.0
            elif c.weight_fmt == W_VARINT:
                raw, wpos = varint_decode(wbuf, wpos)
                w = float(raw)
            elif c.weight_fmt == W_SIGNED_VARINT:
                raw, wpos = varint_decode(wbuf, wpos)
                w = float(zigzag_decode(raw))
            elif c.weight_fmt == W_DOUBLE:
                (w,) = struct.unpack_from("<d", wbuf, wpos)
                wpos += 8
            else:  # W_FLOAT
                (w,) = struct.unpack_from("<f", wbuf, wpos)
                wpos += 4
            if c.directed:
                out.append((u, v, w))
            else:
                # adj holds v <= u exactly once per edge
                out.append((u, v, w))
                if v != u:
                    out.append((v, u, w))
    return out


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """NetworkitBinaryReader semantics (NetworkitBinaryReader.cpp:20-236):
    header -> flags/firstVertex -> chunk-parallel varint decode. Chunks map
    one-to-one onto Spark tasks."""
    path = os.path.abspath(path)
    with open(path, "rb") as f:
        head = f.read(80)
        if head[:8] != MAGIC:
            raise ValueError(f"not a nkbg002 file: {head[:8]!r}")
        (features, nodes, chunks, off_base, off_adj, off_transp,
         off_w, off_wt) = struct.unpack("<8q", head[16:])
        directed = bool(features & _DIR_MASK)
        weight_fmt = (features & _WGHT_MASK) >> _WGHT_SHIFT
        f.seek(off_base)
        flags = f.read(nodes)
        first_vert = [0]
        for _ in range(max(chunks - 1, 0)):
            first_vert.append(struct.unpack("<q", f.read(8))[0])
        first_vert.append(nodes)
        f.seek(off_adj)
        adj_offsets = [0] + [
            struct.unpack("<q", f.read(8))[0] for _ in range(max(chunks - 1, 0))
        ]
        if weight_fmt != W_NONE:
            f.seek(off_w)
            w_offsets = [0] + [
                struct.unpack("<q", f.read(8))[0] for _ in range(max(chunks - 1, 0))
            ]
        else:
            w_offsets = [0] * max(chunks, 1)

    adj_data0 = off_adj + (chunks - 1) * 8 + 8  # past chunk offsets + count
    w_data0 = off_w + (chunks - 1) * 8
    slices = [
        _ChunkSlice(
            first=first_vert[c],
            count=first_vert[c + 1] - first_vert[c],
            adj_start=adj_data0 + adj_offsets[c],
            wght_start=(w_data0 + w_offsets[c]) if weight_fmt != W_NONE else -1,
            weight_fmt=weight_fmt,
            directed=directed,
            path=path,
        )
        for c in range(chunks)
    ]
    sc = spark.sparkContext
    rows = sc.parallelize(slices, max(len(slices), 1)).flatMap(_decode_chunk)
    edges = spark.createDataFrame(rows, EDGE_SCHEMA) if slices else spark.createDataFrame([], EDGE_SCHEMA)
    vertices = spark.createDataFrame(
        [(i,) for i in range(nodes) if flags[i] & 0x1], "id long"
    ) if nodes else spark.createDataFrame([], "id long")
    return Graph(vertices, edges, directed=directed, weighted=weight_fmt != W_NONE)


# ---- writer ----------------------------------------------------------------


def _detect_weight_format(weights: list[float]) -> int:
    """autoDetect (NetworkitBinaryWriter.cpp:28-55): unsigned varint if all
    weights are non-negative integers, signed varint if integers, float if
    exactly representable as f32, else double."""
    is_unsigned = all(w >= 0 for w in weights)
    fits_int = all(w == int(w) for w in weights)
    fits_float = all(w == struct.unpack("<f", struct.pack("<f", w))[0] for w in weights)
    if fits_int:
        return W_VARINT if is_unsigned else W_SIGNED_VARINT
    return W_FLOAT if fits_float else W_DOUBLE


def _encode_weight(w: float, fmt: int) -> bytes:
    if fmt == W_VARINT:
        return varint_encode(int(w))
    if fmt == W_SIGNED_VARINT:
        return varint_encode(zigzag_encode(int(w)))
    if fmt == W_DOUBLE:
        return struct.pack("<d", w)
    if fmt == W_FLOAT:
        return struct.pack("<f", w)
    return b""


def write_networkit_binary(graph: Graph, path: str, chunks: int = 4) -> None:
    """NetworkitBinaryWriter semantics (NetworkitBinaryWriter.cpp:22-350)
    with autoDetect weights. Driver-side sequential encode (fixture-tier,
    like `write_metis`): chunk offsets are prefix sums over the encoded
    stream, which forces a sequential pass by construction."""
    edge_rows = graph.edges.collect()
    vert_ids = {r["id"] for r in graph.vertices.collect()}
    nodes = max(vert_ids, default=-1) + 1
    chunks = max(1, min(chunks, nodes)) if nodes else 1

    adj: list[list[tuple[int, float]]] = [[] for _ in range(nodes)]
    transp: list[list[tuple[int, float]]] = [[] for _ in range(nodes)]
    for r in edge_rows:
        u, v, w = r["src"], r["dst"], float(r["weight"])
        if graph.directed:
            adj[u].append((v, w))
            transp[v].append((u, w))
        else:
            # stored symmetrized; keep v <= u once in adj, v >= u in transpose
            if v <= u:
                adj[u].append((v, w))
            if v >= u:
                transp[u].append((v, w))
    for lists in (adj, transp):
        for lst in lists:
            lst.sort()

    weights = [w for lst in adj for _, w in lst]
    fmt = W_NONE if not graph.weighted else (
        _detect_weight_format(weights) if weights else W_VARINT
    )

    first_in_chunk = [0]
    step = nodes // chunks if chunks else 0
    for _ in range(1, chunks):
        first_in_chunk.append(first_in_chunk[-1] + step)
    first_in_chunk.append(nodes)

    def encode_block(lists):
        data, offs, total = bytearray(), [], 0
        wdata, woffs = bytearray(), []
        for c in range(chunks):
            for u in range(first_in_chunk[c], first_in_chunk[c + 1]):
                data += varint_encode(len(lists[u]))
                total += len(lists[u])
                for v, w in lists[u]:
                    data += varint_encode(v)
                    wdata += _encode_weight(w, fmt)
            offs.append(len(data))
            woffs.append(len(wdata))
        return data, offs, total, wdata, woffs

    adj_data, adj_offs, n_edges, adj_w, adj_woffs = encode_block(adj)
    tr_data, tr_offs, n_tr, tr_w, tr_woffs = encode_block(transp)

    off_base = 80
    off_adj = off_base + nodes + (chunks - 1) * 8
    off_transp = off_adj + (chunks - 1) * 8 + 8 + len(adj_data)
    if fmt != W_NONE:
        off_w = off_transp + (chunks - 1) * 8 + 8 + len(tr_data)
        off_wt = off_w + (chunks - 1) * 8 + len(adj_w)
    else:
        off_w = off_wt = 0

    features = (1 if graph.directed else 0) | ((fmt << _WGHT_SHIFT) & _WGHT_MASK)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<9q", 0, features, nodes, chunks,
                            off_base, off_adj, off_transp, off_w, off_wt))
        f.write(bytes((0x1 if i in vert_ids else 0x0) for i in range(nodes)))
        for c in range(1, chunks):
            f.write(struct.pack("<q", first_in_chunk[c]))
        for block_offs, total, data in (
            (adj_offs, n_edges, adj_data),
            (tr_offs, n_tr, tr_data),
        ):
            for c in range(chunks - 1):
                f.write(struct.pack("<q", block_offs[c]))
            f.write(struct.pack("<q", total))
            f.write(data)
        if fmt != W_NONE:
            for woffs, wdata in ((adj_woffs, adj_w), (tr_woffs, tr_w)):
                for c in range(chunks - 1):
                    f.write(struct.pack("<q", woffs[c]))
                f.write(wdata)
