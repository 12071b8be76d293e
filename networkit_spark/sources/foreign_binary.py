"""Thrill and graph-tool binary graph codecs (Format.ThrillBinary,
Format.GraphToolBinary).

Reference: io/ThrillGraphBinaryReader.cpp:14-97 + Writer.cpp:14-58 (per
sequential node: varint64 degree then degree little-endian uint32
neighbors; undirected graphs store each edge once at the u <= v endpoint
and the reader symmetrizes; ids must stay below the node count; multiple
input files concatenate) and io/GraphToolBinaryReader.cpp:16-133 +
Writer.cpp:19-100 (8-byte magic e2 9b be 20 67 74 + version 0x01 +
endianness byte, u64-length comment, directed byte, u64 node count, then
per node a u64 neighbor count and neighbor ids in the minimal width for
n: 1/2/4/8 bytes; undirected files list each edge once at the v <= u
endpoint).

Fixture-tier driver-side codecs like METIS/NKB/MAT — the reference's own
readers are single-threaded streams; parquet/edge lists are the at-scale
interchange. Graph construction is the normal distributed path.
"""

from __future__ import annotations

import struct

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph, from_edge_rows

# ---- Thrill binary ---------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for shift in range(0, 64, 7):
        if pos >= len(buf):
            raise ValueError("truncated varint")
        u = buf[pos]
        pos += 1
        if shift == 63 and (u & 0xFE):
            raise OverflowError("Overflow during variant64 decoding.")
        v |= (u & 0x7F) << shift
        if not (u & 0x80):
            break
    return v, pos


def read_thrill(
    spark: SparkSession, paths: str | list[str], n: int = 0
) -> Graph:
    """ThrillGraphBinaryReader(n).read(path | paths): nodes are implicit
    sequential ids across the concatenated files; each node contributes a
    varint degree + that many uint32-LE neighbors (the u <= v half-edges);
    the result is symmetrized undirected. A neighbor id at or above the
    final node count raises, like the reference's max_id check."""
    if isinstance(paths, str):
        paths = [paths]
    buf = b"".join(open(p, "rb").read() for p in paths)
    pos = 0
    u = 0
    rows: list[tuple[int, int, float]] = []
    max_id = -1
    while pos < len(buf):
        deg, pos = _read_varint(buf, pos)
        for _ in range(deg):
            if pos + 4 > len(buf):
                raise ValueError("truncated neighbor id")
            (v,) = struct.unpack("<I", buf[pos:pos + 4])
            pos += 4
            max_id = max(max_id, v)
            rows.append((u, v, 1.0))
        u += 1
    num_nodes = max(u, n)
    if max_id >= num_nodes:
        raise ValueError(
            "Maximum read node id larger than number of nodes read."
        )
    return from_edge_rows(spark, rows, directed=False, weighted=False,
                          num_nodes=num_nodes)


def write_thrill(graph: Graph, path: str) -> None:
    """ThrillGraphBinaryWriter.write: one varint degree + uint32-LE
    neighbor run per node id 0..n-1, keeping only the u <= v orientation
    (the reader symmetrizes). Undirected only; ids must fit uint32."""
    if graph.directed:
        raise ValueError("Thrill binary stores undirected half-edges only")
    n = graph.vertices.count()
    if n > (1 << 32) - 1:
        raise ValueError(
            "Thrill binary graphs only support graphs with up to 2^32-1 nodes."
        )
    adj: dict[int, list[int]] = {}
    for r in graph.edges.collect():
        u, v = int(r["src"]), int(r["dst"])
        if u <= v:
            adj.setdefault(u, []).append(v)
    with open(path, "wb") as fh:
        for u in range(n):
            neigh = sorted(set(adj.get(u, [])))
            deg = len(neigh)
            if deg == 0:
                fh.write(b"\0")
            while deg:
                b7 = deg & 0x7F
                deg >>= 7
                fh.write(bytes([b7 | (0x80 if deg else 0)]))
            for v in neigh:
                fh.write(struct.pack("<I", v))


# ---- graph-tool binary ------------------------------------------------------

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def read_graphtool(spark: SparkSession, path: str) -> Graph:
    """GraphToolBinaryReader.read: header magic + version + endianness,
    length-prefixed comment, directed byte, u64 node count, then one
    (u64 count, width-byte neighbor ids) run per node."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 8 or buf[:6] != _GT_MAGIC or buf[6] != 0x01:
        raise ValueError("File header is broken")
    if buf[7] == 0x00:
        end = "<"
    elif buf[7] == 0x01:
        end = ">"
    else:
        raise ValueError("File header is broken")
    pos = 8
    (clen,) = struct.unpack(end + "Q", buf[pos:pos + 8])
    pos += 8 + clen
    directed = buf[pos] == 0x01
    pos += 1
    (n,) = struct.unpack(end + "Q", buf[pos:pos + 8])
    pos += 8
    width = _gt_width(n)
    fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    rows: list[tuple[int, int, float]] = []
    for u in range(n):
        (cnt,) = struct.unpack(end + "Q", buf[pos:pos + 8])
        pos += 8
        for _ in range(cnt):
            (v,) = struct.unpack(end + fmt, buf[pos:pos + width])
            pos += width
            rows.append((u, v, 1.0))
    return from_edge_rows(spark, rows, directed=directed, weighted=False,
                          num_nodes=n)


def write_graphtool(
    graph: Graph, path: str, little_endian: bool = True
) -> None:
    """GraphToolBinaryWriter(littleEndianness).write: empty comment;
    undirected graphs list each edge once at the v <= u endpoint,
    directed graphs list full out-adjacencies."""
    end = "<" if little_endian else ">"
    n = graph.vertices.count()
    width = _gt_width(n)
    fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    adj: dict[int, list[int]] = {}
    for r in graph.edges.collect():
        u, v = int(r["src"]), int(r["dst"])
        if graph.directed:
            adj.setdefault(u, []).append(v)
        elif v <= u:
            adj.setdefault(u, []).append(v)
    with open(path, "wb") as fh:
        fh.write(_GT_MAGIC + bytes([0x01, 0x00 if little_endian else 0x01]))
        fh.write(struct.pack(end + "Q", 0))  # empty comment
        fh.write(bytes([0x01 if graph.directed else 0x00]))
        fh.write(struct.pack(end + "Q", n))
        for u in range(n):
            neigh = sorted(set(adj.get(u, [])))
            fh.write(struct.pack(end + "Q", len(neigh)))
            for v in neigh:
                fh.write(struct.pack(end + fmt, v))


# ---- DibaP binary ----------------------------------------------------------


def read_dibap(spark: SparkSession, path: str) -> Graph:
    """DibapGraphReader.cpp:32-180 (Format.DibapBinary): network-byte-order
    C structs — 'GI' magic short, int V, vertex-weight dim + values
    (parsed, unused: the reference's own FIXME skips node weights), CSR
    offsets (V+1 ints), neighbor ids (of[V] ints), edge-weight dim +
    values, coordinate dim + float coords (parsed, dropped — the graph
    carries no geometry). Undirected edges materialize from the v <= to[e]
    half, weighted by ew[e] when dew > 0 (cpp:157-176)."""
    buf = open(path, "rb").read()
    pos = 0

    def take(fmt: str, count: int):
        nonlocal pos
        size = struct.calcsize(fmt) * count
        if pos + size > len(buf):
            raise ValueError("bad file structure")
        out = struct.unpack(f">{count}{fmt}", buf[pos : pos + size])
        pos += size
        return out

    (magic,) = take("h", 1)
    if magic != (ord("G") << 8 | ord("I")):
        raise ValueError("bad file structure")
    (v_cnt,) = take("i", 1)
    (dvw,) = take("i", 1)
    if dvw > 0:
        take("i", v_cnt * dvw)  # vertex weights: parsed, unused (ref FIXME)
    of = take("i", v_cnt + 1)
    num_e2 = of[v_cnt]
    to = take("i", num_e2) if num_e2 else ()
    (dew,) = take("i", 1)
    ew = take("i", num_e2 * dew) if dew > 0 else ()
    (dxy,) = take("i", 1)
    if dxy > 0:
        take("f", v_cnt * dxy)  # coordinates: parsed, dropped

    rows: list[tuple[int, int, float]] = []
    for v in range(v_cnt):
        for e in range(of[v], of[v + 1]):
            if v <= to[e]:
                rows.append((v, to[e], float(ew[e]) if dew > 0 else 1.0))
    return from_edge_rows(
        spark, rows, directed=False, weighted=dew > 0, num_nodes=v_cnt
    )


def write_dibap(graph: Graph, path: str) -> None:
    """Inverse of read_dibap (the reference ships no writer; this one
    exists for roundtrip fixtures): zero vertex-weight and coordinate
    dims, CSR offsets over the symmetrized adjacency, edge-weight dim 1
    iff the graph is weighted."""
    if graph.directed:
        raise ValueError("DibaP stores undirected graphs")
    n = graph.num_nodes()
    adj: dict[int, list[tuple[int, float]]] = {u: [] for u in range(n)}
    for r in (
        graph.edges.select("src", "dst", "weight")
        .distinct()
        .sort("src", "dst")
        .collect()
    ):
        adj[int(r["src"])].append((int(r["dst"]), float(r["weight"])))
    of = [0]
    to: list[int] = []
    ew: list[int] = []
    for u in range(n):
        for v, w in adj[u]:
            to.append(v)
            ew.append(int(w))
        of.append(len(to))
    dew = 1 if graph.weighted else 0
    with open(path, "wb") as f:
        f.write(struct.pack(">h", ord("G") << 8 | ord("I")))
        f.write(struct.pack(">i", n))
        f.write(struct.pack(">i", 0))  # dvw
        f.write(struct.pack(f">{len(of)}i", *of))
        if to:
            f.write(struct.pack(f">{len(to)}i", *to))
        f.write(struct.pack(">i", dew))
        if dew and ew:
            f.write(struct.pack(f">{len(ew)}i", *ew))
        f.write(struct.pack(">i", 0))  # dxy
