"""Matlab Level-5 .mat graph reader/writer (Format.MAT).

Reference: networkit/graphio.pyx:840-886 (MatReader/MatWriter/readMat/
writeMat) — loads a named adjacency-matrix variable from a .mat file via
scipy.io, requires it square, and adds one undirected edge per nonzero
(deduped); the writer saves the graph's sparse adjacency matrix under the
key. This container has no scipy, so the Level-5 container format
(MAT-File Format spec, R2006b+ level 5) is parsed/emitted directly:

- 128-byte header (116-char text, subsystem offset, version 0x0100,
  endian indicator 'IM'/'MI');
- top-level data elements with 8-byte (type, nbytes) tags, 8-byte
  aligned; miCOMPRESSED (15) elements are zlib-inflated and re-parsed
  (what scipy emits with do_compression=True);
- miMATRIX (14) elements decode array-flags / dimensions / name
  subelements, then mxSPARSE_CLASS (5) CSC triplets (ir, jc, pr) or a
  dense numeric class scanned column-major for nonzeros.

Fixture-tier like the METIS/NKB codecs (driver-side byte parsing — the
reference's own readers are single-threaded too; parquet/edge lists are
the at-scale interchange). The graph build itself is the normal
distributed from_edge_rows path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import SparkSession

from networkit_spark.graph import Graph, from_edge_rows

_MI_INT8, _MI_UINT8, _MI_INT16, _MI_UINT16 = 1, 2, 3, 4
_MI_INT32, _MI_UINT32, _MI_SINGLE, _MI_DOUBLE = 5, 6, 7, 9
_MI_INT64, _MI_UINT64, _MI_MATRIX, _MI_COMPRESSED = 12, 13, 14, 15
_MX_SPARSE = 5
_NUMERIC_DTYPES = {
    _MI_INT8: "i1", _MI_UINT8: "u1", _MI_INT16: "i2", _MI_UINT16: "u2",
    _MI_INT32: "i4", _MI_UINT32: "u4", _MI_SINGLE: "f4", _MI_DOUBLE: "f8",
    _MI_INT64: "i8", _MI_UINT64: "u8",
}


def _elements(buf: bytes, endian: str):
    """Yield (mi_type, payload) for each 8-byte-aligned data element."""
    pos = 0
    while pos + 8 <= len(buf):
        dtype, nbytes = struct.unpack(endian + "II", buf[pos:pos + 8])
        if dtype >> 16:  # small data element: type/len packed in the tag
            yield dtype & 0xFFFF, buf[pos + 4:pos + 4 + (dtype >> 16)]
            pos += 8
            continue
        yield dtype, buf[pos + 8:pos + 8 + nbytes]
        pos += 8 + nbytes + (-nbytes % 8)


def _numeric(mi_type: int, payload: bytes, endian: str) -> np.ndarray:
    if mi_type not in _NUMERIC_DTYPES:
        raise ValueError(f"unsupported MAT numeric element type {mi_type}")
    return np.frombuffer(payload, dtype=endian + _NUMERIC_DTYPES[mi_type])


def _parse_matrix(payload: bytes, endian: str):
    """miMATRIX payload -> (name, (m, n), nonzero (row, col, value) list)
    or None for unsupported array classes."""
    subs = list(_elements(payload, endian))
    flags_words = np.frombuffer(subs[0][1], dtype=endian + "u4")
    array_class = int(flags_words[0] & 0xFF)
    dims = _numeric(subs[1][0], subs[1][1], endian).astype(np.int64)
    name = bytes(subs[2][1]).decode("ascii")
    if len(dims) != 2:
        return name, tuple(int(d) for d in dims), None
    m, n = int(dims[0]), int(dims[1])
    if array_class == _MX_SPARSE:
        ir = _numeric(subs[3][0], subs[3][1], endian).astype(np.int64)
        jc = _numeric(subs[4][0], subs[4][1], endian).astype(np.int64)
        pr = _numeric(subs[5][0], subs[5][1], endian).astype(np.float64)
        nnz = int(jc[-1])
        rows, cols, vals = [], [], []
        for c in range(n):
            for k in range(int(jc[c]), int(jc[c + 1])):
                rows.append(int(ir[k]))
                cols.append(c)
                vals.append(float(pr[k]))
        return name, (m, n), list(zip(rows[:nnz], cols[:nnz], vals[:nnz]))
    if array_class in (6, 7, 8, 9, 10, 11, 12, 13, 14, 15):  # dense numeric
        data = _numeric(subs[3][0], subs[3][1], endian).astype(np.float64)
        trip = []
        for c in range(n):  # column-major storage
            for r in range(m):
                v = float(data[c * m + r])
                if v != 0.0:
                    trip.append((r, c, v))
        return name, (m, n), trip
    return name, (m, n), None


def _variables(data: bytes):
    """All (name, dims, triplets) variables of a MAT level-5 byte string."""
    if len(data) < 128:
        raise ValueError("not a MAT level-5 file (truncated header)")
    indicator = data[126:128]
    if indicator == b"IM":
        endian = "<"
    elif indicator == b"MI":
        endian = ">"
    else:
        raise ValueError("not a MAT level-5 file (bad endian indicator)")
    out = []
    for mi_type, payload in _elements(data[128:], endian):
        if mi_type == _MI_COMPRESSED:
            inner = zlib.decompress(bytes(payload))
            for t2, p2 in _elements(inner, endian):
                if t2 == _MI_MATRIX:
                    out.append(_parse_matrix(bytes(p2), endian))
        elif mi_type == _MI_MATRIX:
            out.append(_parse_matrix(bytes(payload), endian))
    return out


def read_mat(spark: SparkSession, path: str, key: str = "G") -> Graph:
    """readMat(path, key) semantics (graphio.pyx:847-867): the named
    variable must exist and be square; one undirected unweighted edge per
    nonzero (u, v) not already present (symmetric nonzeros collapse)."""
    with open(path, "rb") as fh:
        data = fh.read()
    for name, dims, trip in _variables(data):
        if name != key:
            continue
        if trip is None:
            raise ValueError(f"variable {key} is not a numeric matrix")
        m, n = dims
        if m != n:
            raise ValueError(f"this ({m}x{n}) matrix is not square")
        seen = set()
        rows = []
        for u, v, _ in trip:
            a, b = (u, v) if u <= v else (v, u)
            if (a, b) not in seen:
                seen.add((a, b))
                rows.append((a, b, 1.0))
        return from_edge_rows(spark, rows, directed=False, weighted=False,
                              num_nodes=n)
    raise KeyError(f"Key {key} not found in the matlab object file")


def _tagged(mi_type: int, payload: bytes) -> bytes:
    pad = -len(payload) % 8
    return struct.pack("<II", mi_type, len(payload)) + payload + b"\0" * pad


def write_mat(graph: Graph, path: str, key: str = "G") -> None:
    """writeMat(G, path, key) (graphio.pyx:878-886): the graph's sparse
    adjacency matrix (CSC, weights as values; undirected graphs store the
    symmetric matrix) under ``key``, uncompressed level-5 — readable by
    scipy.io.loadmat and by read_mat."""
    n = graph.vertices.count()
    rows = graph.edges.select("src", "dst", "weight").collect()
    by_col: dict[int, list[tuple[int, float]]] = {}
    for r in rows:
        by_col.setdefault(int(r["dst"]), []).append(
            (int(r["src"]), float(r["weight"]))
        )
    ir, pr, jc = [], [], [0]
    for c in range(n):
        ent = sorted(by_col.get(c, []))
        ir.extend(u for u, _ in ent)
        pr.extend(w for _, w in ent)
        jc.append(len(ir))
    nnz = len(ir)
    body = (
        _tagged(_MI_UINT32, struct.pack("<II", _MX_SPARSE, max(nnz, 1)))
        + _tagged(_MI_INT32, struct.pack("<ii", n, n))
        + _tagged(_MI_INT8, key.encode("ascii"))
        + _tagged(_MI_INT32, np.asarray(ir, dtype="<i4").tobytes())
        + _tagged(_MI_INT32, np.asarray(jc, dtype="<i4").tobytes())
        + _tagged(_MI_DOUBLE, np.asarray(pr, dtype="<f8").tobytes())
    )
    header = (
        b"MATLAB 5.0 MAT-file, written by networkit_spark".ljust(116)
        + b"\0" * 8
        + struct.pack("<H", 0x0100)
        + b"IM"
    )
    with open(path, "wb") as fh:
        fh.write(header + _tagged(_MI_MATRIX, body))
