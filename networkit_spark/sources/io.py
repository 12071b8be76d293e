"""Graph IO readers/writers (SURVEY.md §2.9).

The reference ships ~15 single-threaded line-parser readers behind
`readGraph(path, Format.…)` (networkit/graphio.pyx:724-786). Spark-first
equivalents for the formats worth keeping:

* edge lists (SNAP / EdgeList variants: separator x first-node-id x
  comment prefix, optional weight) — `spark.read.csv` with comment
  pushdown, fully distributed (EdgeListReader.cpp:37-80,
  SNAPGraphReader.cpp:16-40);
* METIS adjacency format — fixture-scale only, single file
  (METISParser.cpp:93-148);
* partition (label-per-line) files (io/PartitionReader.cpp) and the
  engine-native parquet labels/edges tables;
* writers mirror EdgeListWriter / SNAPGraphWriter / METISGraphWriter /
  PartitionWriter.

Non-continuous string ids are remapped to dense longs through the same
dictionary minting as the transcript pipeline (GraphTools::
getContinuousNodeIds, GraphTools.cpp:438).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.edges import mint_dense_ids
from networkit_spark.graph import EDGE_SCHEMA, Graph


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    comment: str = "#",
    first_node: int = 0,
    directed: bool = False,
    continuous: bool = True,
) -> Graph:
    """EdgeListReader(sep, firstNode, comment, continuous, directed)
    semantics (include/networkit/io/EdgeListReader.hpp:26-58): lines of
    `u<sep>v[<sep>w]`; `continuous=True` treats ids as ints offset by
    ``first_node``; otherwise ids are opaque strings mapped to dense longs.
    Returns an undirected-symmetrized Graph unless ``directed``.
    SNAP format (SNAPGraphReader.cpp) == tab sep, '#' comments."""
    raw = (
        spark.read.option("sep", sep)
        .option("comment", comment)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    cols = raw.columns
    has_w = len(cols) >= 3
    w = F.col(cols[2]).cast("float") if has_w else F.lit(1.0).cast("float")

    if continuous:
        half = raw.select(
            (F.col(cols[0]).cast("long") - first_node).alias("src"),
            (F.col(cols[1]).cast("long") - first_node).alias("dst"),
            w.alias("weight"),
        ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        n = (
            half.agg(F.greatest(F.max("src"), F.max("dst")).alias("m")).first()["m"]
        )
        vertices = spark.range((n or -1) + 1).select(F.col("id").cast("long"))
    else:
        keyed = raw.select(
            F.col(cols[0]).cast("string").alias("sk"),
            F.col(cols[1]).cast("string").alias("dk"),
            w.alias("weight"),
        )
        keys = keyed.select(F.col("sk").alias("key")).unionByName(
            keyed.select(F.col("dk").alias("key"))
        )
        ids = mint_dense_ids(keys)
        # no forced broadcast: large non-continuous inputs are exactly the
        # case where the minted dictionary is huge; AQE decides at runtime
        half = (
            keyed.join(
                ids.withColumnRenamed("key", "sk").withColumnRenamed("id", "src"),
                "sk",
            )
            .join(
                ids.withColumnRenamed("key", "dk").withColumnRenamed("id", "dst"),
                "dk",
            )
            .select("src", "dst", "weight")
        )
        vertices = ids.select("id")

    if directed:
        return Graph(vertices, half, directed=True)
    sym = half.unionByName(
        half.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return Graph(vertices, sym, directed=False)


def read_snap(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """SNAP `u\\tv` lines with '#' comments (io/SNAPGraphReader.cpp:16-40)."""
    return read_edge_list(spark, path, sep="\t", comment="#", directed=directed)


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METIS: header `n m [fmt]`, then one 1-indexed adjacency line per
    vertex, optional weights when fmt has the 1-bit set
    (io/METISGraphReader.cpp:17-21, METISParser.cpp:93-148). Line number ==
    vertex id, so ordering matters: fixture-scale reader (single file) using
    an RDD zipWithIndex — NOT for 100 TB inputs (edge lists / parquet are)."""
    lines = (
        spark.sparkContext.textFile(path, minPartitions=1)
        .zipWithIndex()
        .filter(lambda t: t[0].strip() != "" and not t[0].lstrip().startswith("%"))
        .zipWithIndex()  # re-number after dropping comments/blanks
        .map(lambda t: (t[1], t[0][0]))
    )
    header = lines.filter(lambda t: t[0] == 0).collect()[0][1].split()
    n = int(header[0])
    fmt = header[2] if len(header) > 2 else "0"
    has_weights = fmt.endswith("1") and fmt != "0" and int(fmt) % 10 == 1

    def parse(t):
        row_no, line = t
        if row_no == 0:
            return []
        u = row_no - 1  # 0-based vertex id
        toks = line.split()
        out = []
        if has_weights:
            for j in range(0, len(toks) - 1, 2):
                out.append((u, int(toks[j]) - 1, float(toks[j + 1])))
        else:
            for tok in toks:
                out.append((u, int(tok) - 1, 1.0))
        return out

    edges = spark.createDataFrame(lines.flatMap(parse), schema=EDGE_SCHEMA)
    vertices = spark.range(n).select(F.col("id").cast("long"))
    # METIS lists each undirected edge in both adjacency rows already
    return Graph(vertices, edges, directed=False)


def write_edge_list(
    graph: Graph, path: str, sep: str = "\t", weighted: bool | None = None
) -> None:
    """EdgeListWriter/SNAPGraphWriter: canonical (src<=dst) representatives
    once per undirected edge."""
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    if weighted is None:
        weighted = graph.weighted
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    e.select(*cols).write.mode("overwrite").option("sep", sep).csv(path)


def write_metis(graph: Graph, path: str) -> None:
    """METIS adjacency format (io/METISGraphWriter.cpp): header ``n m``,
    then one 1-indexed neighbor line per vertex in id order. Line order ==
    vertex id, an inherently SEQUENTIAL contract — fixture-scale writer
    (single local file via driver-side collect), the same scope as
    read_metis; parquet/edge lists are the at-scale formats."""
    n = graph.num_nodes()
    m = graph.num_edges()
    adj_rows = (
        graph.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.sort_array(F.collect_list(F.col("dst") + 1)).alias("nbrs"))
        .collect()
    )
    adj = {r["src"]: r["nbrs"] for r in adj_rows}
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for u in range(n):
            f.write(" ".join(str(x) for x in adj.get(u, [])) + "\n")


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GML (io/GMLGraphReader.cpp): `graph [ directed d  node [ id i ]...
    edge [ source u target v (weight w) ]... ]`. Fixture-scale driver-side
    token parser (the reference's is single-threaded too); ids remapped to
    dense longs in first-seen order, matching the reference's node map."""
    toks = open(path).read().replace("[", " [ ").replace("]", " ] ").split()
    directed = False
    ids: dict[str, int] = {}
    edges: list[tuple[int, int, float]] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "directed":
            directed = toks[i + 1] == "1"
            i += 2
        elif t == "node":
            j = toks.index("]", i)
            block = toks[i:j]
            nid = block[block.index("id") + 1]
            ids.setdefault(nid, len(ids))
            i = j + 1
        elif t == "edge":
            j = toks.index("]", i)
            block = toks[i:j]
            u = ids[block[block.index("source") + 1]]
            v = ids[block[block.index("target") + 1]]
            w = float(block[block.index("weight") + 1]) if "weight" in block else 1.0
            edges.append((u, v, w))
            i = j + 1
        else:
            i += 1
    from networkit_spark.graph import from_edge_rows

    return from_edge_rows(spark, edges, directed=directed, num_nodes=len(ids))


def write_gml(graph: Graph, path: str) -> None:
    """GML writer (io/GMLGraphWriter.cpp layout): canonical undirected
    representatives once. Fixture-scale (driver collect)."""
    n = graph.num_nodes()
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    rows = e.select("src", "dst", "weight").collect()
    with open(path, "w") as f:
        f.write("graph [\n")
        f.write(f"  directed {1 if graph.directed else 0}\n")
        for i in range(n):
            f.write(f"  node [ id {i} ]\n")
        for r in rows:
            f.write(
                f"  edge [ source {r['src']} target {r['dst']} weight {r['weight']} ]\n"
            )
        f.write("]\n")


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphML (Python GraphMLIO.py / graphio.pyx GraphMLReader): the XML
    schema <graph edgedefault=...><node id=../><edge source=.. target=..
    [data key=weight]/></graph>. Fixture-scale driver-side parse with
    xml.etree (the reference's SAX reader is single-threaded too); node
    ids remapped to dense longs in document order. Reads the first
    <graph> element; a <data> child whose key attribute contains
    "weight" (or the conventional d1/d_weight keys declared with
    attr.name="weight") becomes the edge weight."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(path)
    root = tree.getroot()

    def tag(el):
        return el.tag.rsplit("}", 1)[-1]

    weight_keys = {
        k.get("id")
        for k in root.iter()
        if tag(k) == "key" and (k.get("attr.name") or "").lower() == "weight"
    }
    graph_el = next(el for el in root.iter() if tag(el) == "graph")
    directed = graph_el.get("edgedefault", "undirected") == "directed"
    ids: dict[str, int] = {}
    edges: list[tuple[int, int, float]] = []
    for el in graph_el:
        t = tag(el)
        if t == "node":
            ids.setdefault(el.get("id"), len(ids))
        elif t == "edge":
            u = ids.setdefault(el.get("source"), len(ids))
            v = ids.setdefault(el.get("target"), len(ids))
            w = 1.0
            for d in el:
                if tag(d) == "data" and (
                    d.get("key") in weight_keys
                    or "weight" in (d.get("key") or "").lower()
                ):
                    w = float(d.text)
            edges.append((u, v, w))
    from networkit_spark.graph import from_edge_rows

    return from_edge_rows(spark, edges, directed=directed, num_nodes=len(ids))


def write_graphml(graph: Graph, path: str) -> None:
    """GraphML writer (GraphMLIO.py GraphMLWriter layout): declares a
    weight key when the graph is weighted, canonical undirected
    representatives once. Fixture-scale (driver collect)."""
    n = graph.num_nodes()
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    rows = e.select("src", "dst", "weight").collect()
    dflt = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        f.write('  <key id="d1" for="edge" attr.name="weight" attr.type="double"/>\n')
        f.write(f'  <graph id="G" edgedefault="{dflt}">\n')
        for i in range(n):
            f.write(f'    <node id="n{i}"/>\n')
        for r in rows:
            f.write(
                f'    <edge source="n{r["src"]}" target="n{r["dst"]}">'
                f'<data key="d1">{r["weight"]}</data></edge>\n'
            )
        f.write("  </graph>\n</graphml>\n")


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """labels(id, label) from the engine's parquet partition layout
    (PartitionReader analogue; the text label-per-line format does not
    carry ids, so the parquet table is the native sink)."""
    return spark.read.parquet(path).select("id", "label")


def write_partition(labels: DataFrame, path: str) -> None:
    labels.select("id", "label").write.mode("overwrite").parquet(path)


def read_konect(spark: SparkSession, path: str) -> Graph:
    """KONECT format (io/KONECTGraphReader.cpp:23-120, KONECT handbook):
    optional property line ``% <format> <weighting>`` — format ``sym`` /
    ``bip`` = undirected, ``asym`` = directed; weighting ``posweighted`` /
    ``signed`` / ``multisigned`` / ``weighted`` / ``multiweighted`` carries
    a third column — optional ``% <m> <n> ...`` size line, then 1-indexed
    whitespace-separated edge lines, fully distributed. Documented
    deviation from the reference's DISCARD_EDGES default: duplicate edge
    rows aggregate (sum of weights / distinct for unweighted), the
    reference's SUM_WEIGHTS_UP handling, which is the columnar-native
    multigraph fold."""
    txt = spark.read.text(path)
    props = [
        r["value"]
        for r in txt.filter(F.col("value").startswith("%")).limit(1).collect()
    ]
    directed, weighted = True, False
    if props:
        toks = props[0].lstrip("%").split()
        if toks:
            directed = toks[0] == "asym"
        if len(toks) > 1:
            weighted = toks[1] in (
                "posweighted", "signed", "multisigned", "weighted",
                "multiweighted",
            )
    data = txt.filter(
        ~F.col("value").startswith("%") & (F.length(F.trim("value")) > 0)
    )
    p = F.split(F.trim("value"), r"\s+")
    half = data.select(
        (p[0].cast("long") - 1).alias("src"),
        (p[1].cast("long") - 1).alias("dst"),
        (p[2].cast("float") if weighted else F.lit(1.0).cast("float")).alias(
            "weight"
        ),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    half = half.fillna({"weight": 1.0})
    half = half.groupBy("src", "dst").agg(F.sum("weight").cast("float").alias("weight"))
    n = half.agg(F.greatest(F.max("src"), F.max("dst"))).first()[0]
    vertices = spark.range((n or -1) + 1).select(F.col("id").cast("long"))
    if directed:
        return Graph(vertices, half, directed=True, weighted=weighted)
    sym = half.unionByName(
        half.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return Graph(vertices, sym, directed=False, weighted=weighted)


def read_matrix_market(spark: SparkSession, path: str) -> Graph:
    """MatrixMarket coordinate format as a graph (io/MatrixMarketReader.cpp:
    27-100): ``%%MatrixMarket matrix coordinate <field> <symmetry>`` header,
    ``%`` comments, one ``rows cols nnz`` size line, then 1-indexed
    ``i j [value]`` entries. ``pattern`` = unweighted; ``symmetric`` stores
    one triangle -> symmetrized undirected Graph, ``general`` -> directed.
    The size line is isolated by file order (monotonically_increasing_id
    over the text scan — split offsets keep it first), everything else is
    distributed column ops."""
    txt = spark.read.text(path).withColumn("_i", F.monotonically_increasing_id())
    header = txt.orderBy("_i").first()["value"].lower()
    if not header.startswith("%%matrixmarket"):
        raise ValueError("%%MatrixMarket header not found")
    pattern = "pattern" in header
    symmetric = "symmetric" in header or "skew-symmetric" in header
    data = txt.filter(
        ~F.col("value").startswith("%") & (F.length(F.trim("value")) > 0)
    )
    first_i = data.agg(F.min("_i")).first()[0]
    size_toks = (
        data.filter(F.col("_i") == first_i).first()["value"].split()
    )
    nrows = int(size_toks[0])
    p = F.split(F.trim("value"), r"\s+")
    half = data.filter(F.col("_i") != first_i).select(
        (p[0].cast("long") - 1).alias("src"),
        (p[1].cast("long") - 1).alias("dst"),
        (F.lit(1.0).cast("float") if pattern else p[2].cast("float")).alias(
            "weight"
        ),
    )
    vertices = spark.range(nrows).select(F.col("id").cast("long"))
    if not symmetric:
        return Graph(vertices, half, directed=True, weighted=not pattern)
    sym = half.unionByName(
        half.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    return Graph(vertices, sym, directed=False, weighted=not pattern)


def write_dot(graph: Graph, path: str) -> None:
    """GraphViz DOT writer (io/DotGraphWriter.cpp): ``graph G { u -- v; }``
    for undirected, ``digraph { u -> v; }`` for directed. Fixture-scale
    (driver collect), same scope as the METIS/GML writers."""
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    rows = e.select("src", "dst").collect()
    arrow = "->" if graph.directed else "--"
    kind = "digraph" if graph.directed else "graph"
    with open(path, "w") as f:
        f.write(f"{kind} G {{\n")
        for r in rows:
            f.write(f"  {r['src']} {arrow} {r['dst']};\n")
        f.write("}\n")


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """CoverReader (io/CoverReader.cpp:9-35): one subset per non-comment
    LINE, whitespace-separated member node ids; subset id == line index.
    Line number carries meaning, so fixture-scale like read_metis
    (zipWithIndex over a single file). Returns a cover table (id, label)
    with duplicate ids allowed (operators/cover.py shape)."""
    lines = (
        spark.sparkContext.textFile(path, minPartitions=1)
        .filter(lambda s: s.strip() != "" and not s.lstrip().startswith("#"))
        .zipWithIndex()
        .flatMap(lambda t: [(int(tok), t[1]) for tok in t[0].split()])
    )
    return spark.createDataFrame(lines, "id long, label long")


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter (io/CoverWriter.cpp): one line per subset in subset-id
    order, members ascending. Fixture-scale (driver collect), same scope
    as the METIS/DOT writers."""
    rows = (
        cover.groupBy("label")
        .agg(F.sort_array(F.collect_list("id")).alias("members"))
        .orderBy("label")
        .collect()
    )
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(str(x) for x in r["members"]) + "\n")


def read_edge_list_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """EdgeListCoverReader (io/EdgeListCoverReader.cpp:13-45): each line is
    ``node subset subset ...`` with node ids offset by ``first_node``.
    Fully distributed (no line-order dependence)."""
    raw = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.filter(~F.col("value").startswith("#"))
        .filter(F.trim(F.col("value")) != "")
        .select(
            (F.element_at(toks, 1).cast("long") - first_node).alias("id"),
            F.explode(F.slice(toks, 2, 1 << 30)).alias("c"),
        )
        .select("id", F.col("c").cast("long").alias("label"))
    )


def read_dgs(spark: SparkSession, path: str) -> DataFrame:
    """DGS dynamic-stream reader (io/DGSReader.cpp:20-120): magic line
    ``DGS004``, header line, then event lines — ``st`` (clock tick),
    ``an <name> [attrs]`` (add node; names map to dense ids in first-seen
    order, the reference's addNode order), ``ae <name> <from> <to>``,
    ``de <from>-<to>``, ``ce <from>-<to> weight=<w>``, ``dn <name>``.
    Returns an event stream (t, etype, u, v, w) consumable by
    streaming.graph_events.apply_events / sources.dynamic_generators.
    Event order is the file's line order — inherently sequential, so
    fixture-scale (driver parse) like the reference's single-threaded
    reader."""
    with open(path) as f:
        lines = f.read().splitlines()
    if not lines or lines[0].strip() != "DGS004":
        raise ValueError("not a DGS004 file")
    names: dict[str, int] = {}
    rows = []
    t = 0

    def nid(name: str) -> int:
        if name not in names:
            names[name] = len(names)
        return names[name]

    for line in lines[2:]:
        parts = line.split()
        if not parts:
            continue
        tag = parts[0]
        if tag == "st":
            t += 1
        elif tag == "an":
            rows.append((t, "NODE_ADD", nid(parts[1]), None, None))
        elif tag == "ae" and len(parts) >= 4:
            rows.append((t, "EDGE_ADD", nid(parts[2]), nid(parts[3]), 1.0))
        elif tag == "ce" and len(parts) == 3:
            u, v = (nid(x) for x in parts[1].split("-"))
            w = float(parts[2].split("=")[1])
            rows.append((t, "EDGE_WEIGHT_UPDATE", u, v, w))
        elif tag == "dn":
            rows.append((t, "NODE_REMOVE", nid(parts[1]), None, None))
        elif tag == "de":
            u, v = (nid(x) for x in parts[1].split("-"))
            rows.append((t, "EDGE_REMOVE", u, v, None))
    return spark.createDataFrame(rows, "t long, etype string, u long, v long, w float")


def write_dgs(events: DataFrame, path: str) -> None:
    """DGSWriter (dynamics/DGSWriter.cpp:15-60): serialize an event stream
    (t, etype, u, v, w) back to DGS004 — ``an u`` / ``dn u`` /
    ``ae u-v u v weight=w`` / ``de u-v`` / ``ce u-v weight=w`` with ``st``
    emitted between timesteps. The reference takes an ordered
    vector<GraphEvent>; here the DataFrame's row order is the stream order
    (collect preserves it at fixture scale, same scope as the METIS/DOT
    writers). Integer ids written as node names round-trip through
    read_dgs's first-seen dense-id minting whenever nodes are added in
    ascending-id order (true of every stream read_dgs itself produces).
    Rows are stably sorted by ``t`` first (the generators build streams as
    per-event-type unions, so row order is only time-ordered WITHIN a
    type); within a timestep the DataFrame's row order is kept."""
    rows = sorted(events.collect(), key=lambda r: r["t"])
    with open(path, "w") as f:
        f.write("DGS004\nnoname 0 0\n")
        t = 0
        for r in rows:
            while t < r["t"]:
                f.write("st\n")
                t += 1
            u, v, w = r["u"], r["v"], r["w"]
            if r["etype"] == "NODE_ADD":
                f.write(f"an {u}\n")
            elif r["etype"] == "NODE_REMOVE":
                f.write(f"dn {u}\n")
            elif r["etype"] == "EDGE_ADD":
                f.write(f"ae {u}-{v} {u} {v} weight={1.0 if w is None else w}\n")
            elif r["etype"] == "EDGE_REMOVE":
                f.write(f"de {u}-{v}\n")
            elif r["etype"] == "EDGE_WEIGHT_UPDATE":
                f.write(f"ce {u}-{v} weight={w}\n")
            else:
                raise ValueError(f"unknown event type {r['etype']!r}")


def read_gexf(spark: SparkSession, path: str) -> DataFrame | Graph:
    """GEXF static reader (Python GEXFIO.py GEXFReader:22-110): schema
    <graph defaultedgetype=..><nodes><node id=../></nodes><edges><edge
    source=.. target=.. [weight=..]/></edges></graph>. Static mode here;
    mode="dynamic" files are served by read_gexf_dynamic (spell/attvalue
    timeline -> initial graph + event stream). Fixture-scale driver parse
    like read_graphml;
    node ids remapped to dense longs in document order."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()

    def tag(el):
        return el.tag.rsplit("}", 1)[-1]

    graph_el = next(el for el in root.iter() if tag(el) == "graph")
    if graph_el.get("mode") == "dynamic":
        raise ValueError(
            "dynamic GEXF: use read_gexf_dynamic (returns initial Graph + event stream)"
        )
    directed = graph_el.get("defaultedgetype", "undirected") == "directed"
    ids: dict[str, int] = {}
    for el in root.iter():
        if tag(el) == "node" and el.get("id") is not None:
            ids.setdefault(el.get("id"), len(ids))
    edges: list[tuple[int, int, float]] = []
    for el in root.iter():
        if tag(el) == "edge":
            u = ids.setdefault(el.get("source"), len(ids))
            v = ids.setdefault(el.get("target"), len(ids))
            edges.append((u, v, float(el.get("weight", 1.0))))
    from networkit_spark.graph import from_edge_rows

    return from_edge_rows(spark, edges, directed=directed, num_nodes=len(ids))


def write_gexf(graph: Graph, path: str) -> None:
    """GEXF static writer (GEXFIO.py GEXFWriter:263-330 static branch):
    gexf 1.2draft namespace, weight as the edge `weight` attribute.
    Fixture-scale (driver collect), same scope as write_graphml."""
    n = graph.num_nodes()
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    rows = e.select("src", "dst", "weight").collect()
    kind = "directed" if graph.directed else "undirected"
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph mode="static" defaultedgetype="{kind}">\n')
        f.write("    <nodes>\n")
        for i in range(n):
            f.write(f'      <node id="{i}" label="{i}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for k, r in enumerate(rows):
            f.write(
                f'      <edge id="{k}" source="{r["src"]}" target="{r["dst"]}"'
                f' weight="{r["weight"]}"/>\n'
            )
        f.write("    </edges>\n  </graph>\n</gexf>\n")


# ---- partition / cover IO breadth (io/*Partition*.cpp) ----------------------


def read_text_partition(spark: SparkSession, path: str) -> DataFrame:
    """PartitionReader (io/PartitionReader.cpp:8-31): one label per line,
    node id == line index, '*'/'#' comment lines skipped.  Line number
    carries meaning, so fixture-scale (zipWithIndex) like read_metis."""
    lines = (
        spark.sparkContext.textFile(path, minPartitions=1)
        .filter(lambda s: not (s.startswith("*") or s.startswith("#")))
        .zipWithIndex()
        .map(lambda t: (t[1], int(t[0])))
    )
    return spark.createDataFrame(lines, "id long, label long")


def write_text_partition(labels: DataFrame, path: str) -> None:
    """PartitionWriter analogue of read_text_partition: one label per line
    in node-id order 0..n-1.  Fixture-scale (driver collect)."""
    rows = labels.select("id", "label").orderBy("id").collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['label']}\n")


def read_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = " "
) -> DataFrame:
    """EdgeListPartitionReader (io/EdgeListPartitionReader.cpp:12-35):
    ``<node><sep><label>`` per line, '#'-prefixed lines skipped, node ids
    shifted down by ``firstNode``.  Line order carries no meaning here, so
    this one is fully distributed (plain text scan)."""
    txt = spark.read.text(path).filter(
        ~F.col("value").startswith("#") & (F.trim("value") != "")
    )
    parts = F.split(F.col("value"), sep)
    return txt.select(
        (parts.getItem(0).cast("long") - first_node).alias("id"),
        parts.getItem(1).cast("long").alias("label"),
    )


def _check_binary_width(width: int) -> None:
    if width not in (4, 8):
        raise ValueError("width must be 4 or 8")


def write_binary_partition(labels: DataFrame, path: str, width: int = 8) -> None:
    """BinaryPartitionWriter (io/BinaryPartitionWriter.cpp:14-31): the
    label of node i as a little-endian ``width``-byte unsigned int, nodes
    in id order 0..n-1, no header.  Width-4 overflow raises like the
    reference.  Fixture-scale (driver collect) like the METIS writer."""
    import numpy as np

    _check_binary_width(width)
    rows = labels.select("id", "label").orderBy("id").collect()
    vals = [int(r["label"]) for r in rows]
    if width == 4 and vals and max(vals) > 0xFFFFFFFF:
        raise ValueError("partition upper bound does not fit in width 4")
    arr = np.array(vals, dtype="<u4" if width == 4 else "<u8")
    arr.tofile(path)


def read_binary_partition(
    spark: SparkSession, path: str, width: int = 8
) -> DataFrame:
    """BinaryPartitionReader (io/BinaryPartitionReader.cpp): inverse of
    write_binary_partition; node id == record index."""
    import numpy as np

    _check_binary_width(width)
    arr = np.fromfile(path, dtype="<u4" if width == 4 else "<u8")
    return spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(arr)], "id long, label long"
    )


def write_binary_edge_list_partition(
    labels: DataFrame, path: str, first_node: int = 0, width: int = 8
) -> None:
    """BinaryEdgeListPartitionWriter (io/BinaryEdgeListPartitionWriter.cpp:
    13-33): (node + firstNode, label) little-endian pairs, ``width`` bytes
    each, in node-id order.  Fixture-scale (driver collect)."""
    import numpy as np

    _check_binary_width(width)
    rows = labels.select("id", "label").orderBy("id").collect()
    flat = []
    for r in rows:
        flat.append(int(r["id"]) + first_node)
        flat.append(int(r["label"]))
    if width == 4 and flat and max(flat) > 0xFFFFFFFF:
        raise ValueError("ids/labels do not fit in width 4")
    np.array(flat, dtype="<u4" if width == 4 else "<u8").tofile(path)


def read_binary_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 0, width: int = 8
) -> DataFrame:
    """BinaryEdgeListPartitionReader (io/BinaryEdgeListPartitionReader.cpp:
    17-75): stream of little-endian (node, label) pairs; node ids shifted
    down by ``firstNode``."""
    import numpy as np

    _check_binary_width(width)
    arr = np.fromfile(path, dtype="<u4" if width == 4 else "<u8")
    if len(arr) % 2 != 0:
        raise ValueError("odd number of records in edge-list partition file")
    pairs = [
        (int(arr[i]) - first_node, int(arr[i + 1]))
        for i in range(0, len(arr), 2)
    ]
    return spark.createDataFrame(pairs, "id long, label long")


def read_snap_cover(
    spark: SparkSession, path: str, id_map: DataFrame | None = None
) -> DataFrame:
    """SNAPEdgeListPartitionReader (io/SNAPEdgeListPartitionReader.cpp:
    17-90): SNAP ``cmty`` files — one community per non-comment line,
    whitespace-separated ORIGINAL node ids; '#' comments.  The reference
    remaps through the caller's node-id map; pass ``id_map`` (orig, id) to
    land on dense engine ids, else raw ids pass through.  Line number is
    the subset id (fixture-scale zipWithIndex, like read_cover)."""
    cov = read_cover(spark, path)
    if id_map is None:
        return cov
    return (
        cov.withColumnRenamed("id", "orig")
        .join(id_map.select(F.col("orig"), F.col("id")), "orig")
        .select("id", "label")
    )


def write_dot_partition(graph: Graph, labels: DataFrame, path: str) -> None:
    """DotPartitionWriter (io/DotPartitionWriter.cpp:8-52): undirected DOT
    with per-cluster HSV hues — non-isolated nodes get
    ``u [style=filled, color="h,0.99,0.99", label=c];`` where h = (rank of
    cluster among sorted cluster ids of non-isolated nodes) / #clusters,
    then ``u -- v;`` edge lines.  Hues rendered %g like C++ ostream.
    Fixture-scale (driver collect) like write_dot."""
    deg = (
        graph.edges.select(F.col("src").alias("id"))
        .unionByName(graph.edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = (
        deg.join(labels, "id").select("id", "label").orderBy("id").collect()
    )
    uniq = sorted({r["label"] for r in nodes})
    factor = 1.0 / len(uniq) if uniq else 0.0
    hue = {c: factor * i for i, c in enumerate(uniq)}
    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    erows = e.select("src", "dst").collect()
    with open(path, "w") as f:
        f.write("graph {\n")
        for r in nodes:
            h = hue[r["label"]]
            f.write(
                f'{r["id"]} [style=filled, color="{h:.6g},0.99,0.99", '
                f'label={r["label"]}];\n'
            )
        for r in erows:
            f.write(f"{r['src']} -- {r['dst']};\n")
        f.write("}\n")


def read_raster(
    spark: SparkSession,
    path: str,
    normalization_factor: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(x, y) point cloud from a NASA SEDAC-style ASCII population raster
    (io/RasterReader.cpp:21-103): a 6-line header (ncols / nrows read
    after the 14-character keys, lines 3-6 ignored), then nrows rows of
    ncols cell values; every cell emits round(value * normalization
    factor) points uniform in its UNIT cell box — the reference keeps
    xdelta = ydelta = 1.0 (its normalized deltas are commented out), so
    row r spans y in [1-(r+1), 1-r] going negative below the first row.
    Point draws are hash-seeded per call (the reference uses its global
    RNG; seeding keeps fixtures reproducible). Driver-side parse like
    every other fixture-tier reader; population grids are inputs to the
    geometric generators, not graphs."""
    import numpy as np

    with open(path) as f:
        lines = f.read().splitlines()
    ncols = int(float(lines[0][14:].strip()))
    nrows = int(float(lines[1][14:].strip()))
    rng = np.random.default_rng(seed)
    pts: list[tuple[float, float]] = []
    for row in range(nrows):
        vals = lines[6 + row].split()
        if len(vals) < ncols:
            raise ValueError("bad raster row length")
        ylb, yub = -float(row), 1.0 - float(row)
        for col in range(ncols):
            # floor(x+0.5) == the reference's std::round (half away
            # from zero) for these non-negative values; Python round() is
            # banker's and would disagree at exact halves
            k = int(float(vals[col]) * normalization_factor + 0.5)
            xlb = float(col)
            for _ in range(k):
                pts.append(
                    (
                        float(xlb + rng.random()),
                        float(ylb + rng.random() * (yub - ylb)),
                    )
                )
    return spark.createDataFrame(pts, "x double, y double")


_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]  # viz/PostscriptWriter.cpp:20-32 fromCyclicRotation table


def write_postscript(
    graph: Graph,
    coords: DataFrame,
    path: str,
    clustering: DataFrame | None = None,
    torus: bool = False,
) -> None:
    """EPS writer (viz/PostscriptWriter.cpp:37-169): 1020×1020 canvas,
    coordinates affinely scaled into the box, intra-cluster edges colored
    by the 24-color cyclic table, inter-cluster edges grey, nodes as
    r=2 dots colored by cluster (black when unassigned). ``torus=True``
    reproduces the wrapAround header + the ±500→∓1000 edge wrapping.
    Fixture-scale (driver collect), same scope as the DOT/GML writers.

    ``coords``: (id, x, y) — any column names, positional. ``clustering``:
    optional (id, label); None reproduces write()'s makeOneClustering
    default (everything in cluster 0). Deviations: edges are emitted in
    (src, dst) order (forEdges order is adjacency-dependent), and a
    degenerate axis (max == min) scales by 1.0 instead of dividing by 0.
    """
    cc = coords.columns
    pts = {
        int(r[cc[0]]): (float(r[cc[1]]), float(r[cc[2]]))
        for r in coords.collect()
    }
    lab: dict[int, int] = {}
    if clustering is not None:
        lab = {
            int(r[0]): int(r[1])
            for r in clustering.collect()
            if r[1] is not None
        }
    else:
        lab = {i: 0 for i in pts}  # makeOneClustering default

    size, border = 1020.0, 0.0
    xs = [p[0] for p in pts.values()] or [0.0]
    ys = [p[1] for p in pts.values()] or [0.0]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    sx = (size - 2 * border) / (mxx - mnx) if mxx > mnx else 1.0
    sy = (size - 2 * border) / (mxy - mny) if mxy > mny else 1.0

    def adj(p):
        return ((p[0] - mnx) * sx + border, (p[1] - mny) * sy + border)

    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    erows = e.select("src", "dst").orderBy("src", "dst").collect()

    with open(path, "w") as f:
        f.write("%!PS-Adobe-3.0 EPSF-3.0\n" if torus else "%!PS-Adobe-1.0\n")
        f.write("%%Title: NetworKit visualization\n")
        f.write(f"%%BoundingBox: 0.000 0.000 {size:.3f} {size:.3f}\n")
        f.write("%%EndComments\n")
        if not torus:
            f.write("%%EndProlog\ngsave\n")
        f.write(
            "/p {newpath} bind def\n/m {moveto} bind def\n"
            "/r {rmoveto} bind def\n/k {rlineto} bind def\n"
            "/l {lineto} bind def\n/n {rlineto} bind def\n"
            "/c {setrgbcolor} bind def\n/s {stroke} bind def\n"
            "/w {setlinewidth} bind def\n/h {show} bind def\n"
            "/a {arc closepath fill} bind def\n"
            "/b {closepath eofill} bind def\n"
        )
        f.write("0.000 0.000 0.000 c\n")
        for r in erows:
            u, v = int(r["src"]), int(r["dst"])
            lu, lv = lab.get(u), lab.get(v)
            if lu is not None and lu == lv:
                cr, cg, cb = _PS_COLORS[lu % len(_PS_COLORS)]
                f.write(f"{cr:.3f} {cg:.3f} {cb:.3f} c ")
            else:
                f.write("0.80 0.80 0.80 c 1.0 w ")
            start, end = adj(pts[u]), adj(pts[v])
            if torus:  # wrapAround: PostscriptWriter.cpp:104-113
                d = [end[0] - start[0], end[1] - start[1]]
                for i in range(2):
                    if d[i] > 500.0:
                        d[i] -= 1000.0
                    elif d[i] < -500.0:
                        d[i] += 1000.0
                end = (start[0] + d[0], start[1] + d[1])
            f.write(
                f"p {start[0]:.3f} {start[1]:.3f} m "
                f"{end[0]:.3f} {end[1]:.3f} l s\n"
            )
        for u in sorted(pts):
            lu = lab.get(u)
            if lu is not None:
                cr, cg, cb = _PS_COLORS[lu % len(_PS_COLORS)]
                f.write(f"{cr:.3f} {cg:.3f} {cb:.3f} c ")
            else:
                f.write("0.0 0.0 0.0 c ")
            px, py = adj(pts[u])
            f.write(f"p {px:.3f} {py:.3f} 2.000 0.00 360.00 a s\n")
        if not torus:
            f.write("grestore\n")


def read_gexf_dynamic(spark: SparkSession, path: str):
    """(initial Graph, events DataFrame (t, etype, u, v, w)) — GEXF
    mode="dynamic" reader (GEXFIO.py GEXFReader:28-257): elements with no
    start attribute belong to the initial graph; start/startopen emits an
    add (or a RESTORE when the element was deleted before), end/endopen a
    removal; <spells> are processed in document order sharing the
    element's deleted/added state; dynamic edge-weight <attvalue for=
    "weight"> rows emit EDGE_WEIGHT_UPDATE (the first one standing in for
    the edge addition, GEXFIO.py:180-186). Initial nodes take dense ids
    in document order; dynamic nodes are remapped to ids >= n_initial in
    event-time addition order (mapDynamicNodes, GEXFIO.py:219-247).
    timeformat="date" times are ordered lexicographically (ISO order)
    like the reference's string sort; ``t`` is then the dense time rank.
    Fixture-scale driver parse like read_gexf."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()

    def tag(el):
        return el.tag.rsplit("}", 1)[-1]

    graph_el = next(el for el in root.iter() if tag(el) == "graph")
    if graph_el.get("mode") != "dynamic":
        raise ValueError("not a dynamic GEXF file; use read_gexf")
    directed = graph_el.get("defaultedgetype", "undirected") == "directed"
    date_mode = graph_el.get("timeformat") == "date"

    has_dyn_w = any(
        tag(a) == "attribute" and a.get("id") == "weight"
        for a in root.iter()
    )

    raw: list[tuple] = []  # (time, etype, ukey, vkey, w)
    initial_nodes: list[str] = []
    initial_edges: list[tuple[str, str, float]] = []

    def times_of(el):
        st = el.get("start") or el.get("startopen") or ""
        en = el.get("end") or el.get("endopen") or ""
        return st, en

    def parse_dynamics(el, etype, ctl, u, v="0", w=1.0):
        # GEXFIO.py:117-197 parseDynamics, one call per element or spell
        st, en = times_of(el)
        if st != "" and en != "":
            if not ctl["deleted"]:
                raw.append((st, "a" + etype, u, v, w))
                ctl["added"] = True
            else:
                raw.append((st, "r" + etype, u, v, w))
            raw.append((en, "d" + etype, u, v, w))
            ctl["deleted"] = True
        if st != "" and en == "":
            if ctl["deleted"]:
                raw.append((st, "r" + etype, u, v, w))
            else:
                raw.append((st, "a" + etype, u, v, w))
                ctl["added"] = True
        if etype == "e" and has_dyn_w:
            for att in el.iter():
                if tag(att) == "attvalue" and att.get("for") == "weight":
                    wt = float(att.get("value"))
                    ws = att.get("start") or att.get("startopen") or ""
                    if not ctl["added"]:
                        raw.append((ws, "ae", u, v, wt))
                        ctl["added"] = True
                    else:
                        raw.append((ws, "ce", u, v, wt))
        if st == "":
            if not ctl["added"]:
                if etype == "n":
                    initial_nodes.append(u)
                else:
                    initial_edges.append((u, v, w))
                ctl["added"] = True
            if en != "":
                raw.append((en, "d" + etype, u, v, w))
                ctl["deleted"] = True

    def walk(el, etype, u, v="0", w=1.0):
        ctl = {"added": False, "deleted": False}
        spells = [sp for sp in el.iter() if tag(sp) == "spell"]
        if spells:
            for sp in spells:
                parse_dynamics(sp, etype, ctl, u, v, w)
            if etype == "e" and has_dyn_w:
                parse_dynamics(el, etype, ctl, u, v, w)  # sibling attvalues
        else:
            parse_dynamics(el, etype, ctl, u, v, w)

    for el in root.iter():
        if tag(el) == "node" and el.get("id") is not None:
            walk(el, "n", el.get("id"))
    for el in root.iter():
        if tag(el) == "edge":
            walk(
                el, "e", el.get("source"), el.get("target"),
                float(el.get("weight", 1.0)),
            )

    # time ordering: numeric when the format allows, ISO-string otherwise
    def tkey(x):
        if date_mode:
            return x
        try:
            return float(x)
        except ValueError:
            return float("inf")

    raw.sort(key=lambda r: tkey(r[0]))
    tmap = {}
    for r in raw:
        tmap.setdefault(tkey(r[0]), len(tmap))

    # id mapping: initial nodes in document order, dynamic nodes in
    # event-time addition order after them (mapDynamicNodes)
    ids = {k: i for i, k in enumerate(dict.fromkeys(initial_nodes))}
    for t, et, u, v, w in raw:
        if et == "an" and u not in ids:
            ids[u] = len(ids)
    for t, et, u, v, w in raw:  # edge endpoints never seen as nodes
        if et[1] == "e":
            for key in (u, v):
                if key not in ids:
                    ids[key] = len(ids)

    ETYPES = {
        "an": "NODE_ADD", "dn": "NODE_REMOVE", "rn": "NODE_RESTORE",
        "ae": "EDGE_ADD", "re": "EDGE_ADD", "de": "EDGE_REMOVE",
        "ce": "EDGE_WEIGHT_UPDATE",
    }
    rows = []
    for t, et, u, v, w in raw:
        if et[1] == "n":
            rows.append((tmap[tkey(t)], ETYPES[et], ids[u], None, None))
        else:
            rows.append((tmap[tkey(t)], ETYPES[et], ids[u], ids[v], float(w)))
    events = spark.createDataFrame(
        rows, "t long, etype string, u long, v long, w float"
    )
    from networkit_spark.graph import from_edge_rows

    g = from_edge_rows(
        spark,
        [(ids[u], ids[v], w) for u, v, w in initial_edges],
        directed=directed,
        num_nodes=len(dict.fromkeys(initial_nodes)),
    )
    return g, events


def write_gexf_dynamic(graph: Graph, path: str, events: DataFrame) -> None:
    """GEXF mode="dynamic" writer (GEXFIO.py GEXFWriter:269-398): nodes =
    initial + NODE_ADD events, edges = initial + EDGE_ADD events, each
    carrying <spells> whose start/end are the element's event time steps;
    EDGE_WEIGHT_UPDATE rows become dynamic weight <attvalue>s with
    start=t, endopen=t+1. ``events``: (t, etype, u, v, w) — the dense
    time rank plays the reference's TIME_STEP counter. Fixture-scale
    (driver collect), same scope as write_gexf."""
    ev = sorted(
        (
            (int(r["t"]), r["etype"], int(r["u"]),
             None if r["v"] is None else int(r["v"]),
             None if r["w"] is None else float(r["w"]))
            for r in events.collect()
        ),
        key=lambda r: r[0],
    )
    n0 = graph.num_nodes()
    dyn_nodes = [u for _, et, u, _, _ in ev if et == "NODE_ADD"]
    # one <node> element per distinct id (spells carry the add/remove
    # history) — duplicate NODE_ADDs must not emit duplicate elements
    all_nodes = list(dict.fromkeys(
        list(range(n0)) + [u for u in dyn_nodes if u >= n0]
    ))
    has_dyn_w = any(et == "EDGE_WEIGHT_UPDATE" for _, et, _, _, _ in ev)

    e = graph.edges if graph.directed else graph.edges.filter(
        F.col("src") <= F.col("dst")
    )
    init_edges = [
        (int(r["src"]), int(r["dst"]), float(r["weight"]))
        for r in e.select("src", "dst", "weight").collect()
    ]
    # same dedup for edges: a removed-then-re-added edge (or one both
    # initial and EDGE_ADDed) gets ONE element whose <spells> list holds
    # the full end/start history, never two elements each repeating it.
    # Null EDGE_ADD weights default to 1.0 (apply_events' coalesce).
    seen = {
        ((u, v) if graph.directed else (min(u, v), max(u, v)))
        for u, v, _ in init_edges
    }
    dyn_edges = []
    for _, et, u, v, w in ev:
        if et != "EDGE_ADD":
            continue
        key = (u, v) if graph.directed else (min(u, v), max(u, v))
        if key in seen:
            continue
        seen.add(key)
        dyn_edges.append((u, v, 1.0 if w is None else w))
    node_start = {"NODE_ADD", "NODE_RESTORE"}
    kind = "directed" if graph.directed else "undirected"

    def spells_for(match):
        out = []
        for t, et, u, v, w in ev:
            if not match(et, u, v):
                continue
            if et in node_start or et == "EDGE_ADD":
                out.append(("spell", "start", t))
            elif et in ("NODE_REMOVE", "EDGE_REMOVE"):
                out.append(("spell", "end", t))
            elif et == "EDGE_WEIGHT_UPDATE":
                # null update weight would serialize as the unparseable
                # weight="None"; default like apply_events does
                out.append(("attvalue", 1.0 if w is None else w, t))
        return out

    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">\n')
        f.write(f'  <graph mode="dynamic" timeformat="double" '
                f'defaultedgetype="{kind}">\n')
        if has_dyn_w:
            f.write('    <attributes class="edge" mode="dynamic">\n'
                    '      <attribute id="weight" title="Weight" '
                    'type="float"/>\n    </attributes>\n')
        f.write("    <nodes>\n")
        for n in all_nodes:
            sp = spells_for(
                lambda et, u, v, n=n: et.startswith("NODE") and u == n
            )
            if sp:
                f.write(f'      <node id="{n}">\n        <spells>\n')
                for _, op, t in sp:
                    f.write(f'          <spell {op}="{t}"/>\n')
                f.write("        </spells>\n      </node>\n")
            else:
                f.write(f'      <node id="{n}"/>\n')
        f.write("    </nodes>\n    <edges>\n")
        for i, (u, v, w) in enumerate(init_edges + dyn_edges):
            def match(et, a, b, u=u, v=v):
                return et.startswith("EDGE") and (
                    (a, b) == (u, v) or (not graph.directed and (b, a) == (u, v))
                )
            sp = spells_for(match)
            wattr = f' weight="{w}"' if graph.weighted else ""
            if not sp:
                f.write(f'      <edge id="{i}" source="{u}" target="{v}"'
                        f'{wattr}/>\n')
                continue
            f.write(f'      <edge id="{i}" source="{u}" target="{v}"'
                    f'{wattr}>\n')
            spells = [x for x in sp if x[0] == "spell"]
            atts = [x for x in sp if x[0] == "attvalue"]
            if spells:
                f.write("        <spells>\n")
                for _, op, t in spells:
                    f.write(f'          <spell {op}="{t}"/>\n')
                f.write("        </spells>\n")
            if atts:
                f.write("        <attvalues>\n")
                for _, wv, t in atts:
                    f.write(f'          <attvalue for="weight" value="{wv}" '
                            f'start="{t}" endopen="{t + 1}"/>\n')
                f.write("        </attvalues>\n")
            f.write("      </edge>\n")
        f.write("    </edges>\n  </graph>\n</gexf>\n")
