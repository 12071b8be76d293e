"""Driver-contract query implementations + matching DuckDB oracle SQL.

The driver (see __spark_entry__.py) runs each Spark query and its oracle SQL
side-by-side on the same parquet tables at sf=0.01 and compares row count,
schema, and an order-insensitive value hash. Both sides therefore:

* alias every computed column identically,
* cast counts to BIGINT / weights+scores to DOUBLE,
* round floating-point outputs to 6 decimals,
* pin iteration counts (fixed-superstep variants) so convergence pacing can
  never diverge between the engines.

The graph queries run the REAL engine (networkit_spark.operators.*) over an
entity graph derived from the `events` table exactly the way the transcript
pipeline derives its graph (FIXTURES.md §1): events ≙ turns, user_id ≙
conv_id, event_type ≙ tool, (ts, event_id) ≙ turn ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from networkit_spark.edges import mint_dense_ids
from networkit_spark.graph import Graph

# --------------------------------------------------------------------------
# events -> entity graph (Spark side)
# --------------------------------------------------------------------------


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def events_edge_keys(ev: DataFrame) -> DataFrame:
    """Undirected (src_key, dst_key, weight) — user<->etype per event plus
    etype(t-1)<->etype(t) transitions per user under (ts, event_id) order."""
    user = F.concat(F.lit("user:"), F.col("user_id").cast("string"))
    et = F.concat(F.lit("etype:"), F.col("event_type"))
    p1 = ev.select(user.alias("a"), et.alias("b"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p2 = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.concat(F.lit("etype:"), F.col("prev")).alias("a"), et.alias("b"))
    )
    return (
        p1.unionByName(p2)
        .select(F.least("a", "b").alias("src_key"), F.greatest("a", "b").alias("dst_key"))
        .groupBy("src_key", "dst_key")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def events_graph(spark: SparkSession, sf_dir: str) -> tuple[Graph, DataFrame]:
    """(Graph, vertices-with-keys). weight kept DOUBLE end-to-end here so the
    DuckDB comparison is exact (counts are integral in double)."""
    from networkit_spark.plans.checkpoint import materialize

    pairs = events_edge_keys(load(spark, sf_dir, "events"))
    keys = pairs.select(F.col("src_key").alias("key")).unionByName(
        pairs.select(F.col("dst_key").alias("key"))
    )
    # materialize (not persist): every downstream action re-scans these;
    # a checkpointed-RDD scan is ~10x an InMemoryRelation-over-AQE scan
    vertices = materialize(mint_dense_ids(keys))
    da = vertices.withColumnRenamed("key", "src_key").withColumnRenamed("id", "src")
    db = vertices.withColumnRenamed("key", "dst_key").withColumnRenamed("id", "dst")
    half = (
        pairs.join(da, "src_key")
        .join(db, "dst_key")
        .select("src", "dst", F.col("weight").cast("float").alias("weight"))
    )
    sym = materialize(
        half.unionByName(
            half.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    )
    return Graph(vertices.select("id"), sym, directed=False, weighted=True), vertices


def events_digraph(spark: SparkSession, sf_dir: str) -> tuple[Graph, DataFrame]:
    """DIRECTED transcript-style entity graph: user->etype per event plus
    etype(t-1)->etype(t) transitions under (ts, event_id) order — tool
    transitions are inherently directed, which is what SCC decomposes."""
    ev = load(spark, sf_dir, "events")
    user = F.concat(F.lit("user:"), F.col("user_id").cast("string"))
    et = F.concat(F.lit("etype:"), F.col("event_type"))
    p1 = ev.select(user.alias("src_key"), et.alias("dst_key"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p2 = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.concat(F.lit("etype:"), F.col("prev")).alias("src_key"),
            et.alias("dst_key"),
        )
    )
    pairs = (
        p1.unionByName(p2)
        .groupBy("src_key", "dst_key")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    from networkit_spark.plans.checkpoint import materialize

    keys = pairs.select(F.col("src_key").alias("key")).unionByName(
        pairs.select(F.col("dst_key").alias("key"))
    )
    vertices = materialize(mint_dense_ids(keys))
    da = vertices.withColumnRenamed("key", "src_key").withColumnRenamed("id", "src")
    db = vertices.withColumnRenamed("key", "dst_key").withColumnRenamed("id", "dst")
    edges = materialize(
        pairs.join(da, "src_key")
        .join(db, "dst_key")
        .select("src", "dst", F.col("weight").cast("float").alias("weight"))
    )
    return Graph(vertices.select("id"), edges, directed=True, weighted=True), vertices


DIGRAPH_CTE = """
ev AS (SELECT user_id, event_type, ts, event_id FROM events),
dpair_rows AS (
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS sk,
           'etype:' || event_type AS dk
    FROM ev
    UNION ALL
    SELECT 'etype:' || prev AS sk, 'etype:' || event_type AS dk
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM ev
    ) WHERE prev IS NOT NULL
),
dpairs AS MATERIALIZED (
    SELECT sk, dk, CAST(count(*) AS DOUBLE) AS weight FROM dpair_rows GROUP BY 1, 2
),
ddict AS MATERIALIZED (
    SELECT key, CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS id
    FROM (
        SELECT DISTINCT sk AS key FROM dpairs
        UNION
        SELECT DISTINCT dk FROM dpairs
    )
),
dedges AS MATERIALIZED (
    SELECT da.id AS src, db.id AS dst, p.weight
    FROM dpairs p
    JOIN ddict da ON da.key = p.sk
    JOIN ddict db ON db.key = p.dk
),
dvertices AS MATERIALIZED (SELECT id FROM ddict)
"""


def sql_scc() -> str:
    """SCC labels (min member id) via mutual reachability over a recursive
    transitive closure — structurally independent of the engine's
    coloring/backward-marking algorithm, same unique fixed point."""
    return f"""WITH RECURSIVE {DIGRAPH_CTE.strip()},
reach(s, v) AS (
    SELECT id, id FROM dvertices
    UNION
    SELECT r.s, e.dst FROM reach r JOIN dedges e ON e.src = r.v
)
SELECT r1.v AS id, MIN(r1.s) AS label
FROM reach r1 JOIN reach r2 ON r2.s = r1.v AND r2.v = r1.s
GROUP BY r1.v ORDER BY r1.v"""


def sql_digraph_edges() -> str:
    return f"""WITH {DIGRAPH_CTE.strip()}
SELECT src, dst, CAST(weight AS DOUBLE) AS weight FROM dedges ORDER BY src, dst"""


# --------------------------------------------------------------------------
# shared DuckDB CTE: the identical derivation in ANSI SQL
# --------------------------------------------------------------------------

GRAPH_CTE = """
ev AS (SELECT user_id, event_type, ts, event_id FROM events),
pair_rows AS (
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS a,
           'etype:' || event_type AS b
    FROM ev
    UNION ALL
    SELECT 'etype:' || prev AS a, 'etype:' || event_type AS b
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM ev
    ) WHERE prev IS NOT NULL
),
pairs AS MATERIALIZED (
    SELECT least(a, b) AS src_key, greatest(a, b) AS dst_key,
           CAST(count(*) AS DOUBLE) AS weight
    FROM pair_rows GROUP BY 1, 2
),
dict AS MATERIALIZED (
    SELECT key, CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS id
    FROM (
        SELECT DISTINCT src_key AS key FROM pairs
        UNION
        SELECT DISTINCT dst_key FROM pairs
    )
),
half AS (
    SELECT da.id AS src, db.id AS dst, p.weight
    FROM pairs p
    JOIN dict da ON da.key = p.src_key
    JOIN dict db ON db.key = p.dst_key
),
edges AS MATERIALIZED (
    SELECT src, dst, weight FROM half
    UNION ALL
    SELECT dst AS src, src AS dst, weight FROM half WHERE src <> dst
),
vertices AS MATERIALIZED (SELECT id FROM dict)
"""


def _with_graph(body: str) -> str:
    """body is either 'SELECT ...' or 'extra_cte AS (...), ... SELECT ...'."""
    sep = " " if body.lstrip().upper().startswith("SELECT") else ", "
    return f"WITH {GRAPH_CTE}{sep}{body}"


# degrees with self-loop weight doubled (Graph.cpp:552-558 semantics)
DEG_CTE = """
deg AS (
    SELECT src AS id,
           CAST(count(*) AS BIGINT) AS degree,
           SUM(CASE WHEN src = dst THEN weight * 2 ELSE weight END) AS wdeg
    FROM edges GROUP BY src
),
degrees AS (
    SELECT v.id, COALESCE(d.degree, 0) AS degree, COALESCE(d.wdeg, 0.0) AS wdeg
    FROM vertices v LEFT JOIN deg d ON d.id = v.id
)
"""


def _pr_ctes(iters: int, damp: float = 0.85) -> list[str]:
    """CTE list for the unrolled pull-PageRank chain (PageRank.cpp
    semantics); the last CTE is pr{iters}, holding UNNORMALIZED scores."""
    ctes = [
        """deg2 AS (
    SELECT src AS id, SUM(CASE WHEN src = dst THEN weight * 2 ELSE weight END) AS wdeg
    FROM edges GROUP BY src
)""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices)",
        "pr0 AS (SELECT id, (SELECT 1.0/n FROM nn) AS score FROM vertices)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pr{k} AS MATERIALIZED (
    SELECT v.id,
           (SELECT (1.0 - {damp})/n FROM nn) + {damp} * COALESCE(m.mass, 0.0) AS score
    FROM vertices v
    LEFT JOIN (
        SELECT e.dst AS id, SUM(p.score * e.weight / dg.wdeg) AS mass
        FROM edges e
        JOIN pr{k-1} p ON p.id = e.src
        JOIN deg2 dg ON dg.id = e.src
        WHERE dg.wdeg > 0
        GROUP BY e.dst
    ) m ON m.id = v.id
)"""
        )
    return ctes


def sql_pagerank(iters: int, damp: float = 0.85) -> str:
    """Unrolled fixed-iteration pull PageRank (PageRank.cpp semantics),
    final sum-normalization, scores rounded to 6 decimals."""
    body = (
        ", ".join(_pr_ctes(iters, damp))
        + f""" SELECT id, ROUND(score / (SELECT SUM(score) FROM pr{iters}), 6) AS score
FROM pr{iters} ORDER BY id"""
    )
    return _with_graph(body)


def sql_profile_rank_correlation(pr_iters: int, damp: float = 0.85) -> str:
    """Pairwise correlation matrix between the degree / weighted-degree /
    PageRank score vectors — profiling/stat.py Correlation.run:431-485:
    population covariance, Pearson, Spearman (Pearson over helpers.ranked
    average ranks, helpers.pyx:12-40), and Fechner mean concordance sign
    with the reference's copysign zero-deviation edge."""
    last = f"pr{pr_iters}"
    body = f"""{DEG_CTE.strip()},
{", ".join(_pr_ctes(pr_iters, damp))},
m AS (
    SELECT id, 'degree' AS measure, CAST(degree AS DOUBLE) AS x FROM degrees
    UNION ALL
    SELECT id, 'pagerank',
           ROUND(score / (SELECT SUM(score) FROM {last}), 6) FROM {last}
    UNION ALL
    SELECT id, 'wdeg', CAST(wdeg AS DOUBLE) FROM degrees
),
cnt AS (SELECT measure, x, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1, 2),
rk AS (
    SELECT measure, x, c,
           SUM(c) OVER (PARTITION BY measure ORDER BY x) - c AS less
    FROM cnt
),
ranks AS (
    SELECT m.id, m.measure, m.x, r.less + (r.c + 1) / 2.0 AS rnk
    FROM m JOIN rk r ON r.measure = m.measure AND r.x = m.x
),
st AS (SELECT measure, AVG(x) AS mx, AVG(rnk) AS mr FROM ranks GROUP BY 1),
dev AS (
    SELECT r.id, r.measure, r.x - s.mx AS dx, r.rnk - s.mr AS dr
    FROM ranks r JOIN st s ON s.measure = r.measure
),
sd AS (
    SELECT measure,
           sqrt(SUM(dx * dx) / count(*)) AS sx,
           sqrt(SUM(dr * dr) / count(*)) AS sr
    FROM dev GROUP BY 1
),
pr_pairs AS (
    SELECT a.measure AS measure_a, b.measure AS measure_b,
           SUM(a.dx * b.dx) / count(*) AS cov,
           SUM(a.dr * b.dr) / count(*) AS rcov,
           SUM(CASE WHEN a.dx * b.dx > 0 THEN 1.0
                    WHEN a.dx * b.dx < 0 THEN -1.0
                    WHEN a.dx = 0 AND b.dx < 0 THEN -1.0
                    WHEN b.dx = 0 AND a.dx < 0 THEN -1.0
                    ELSE 1.0 END) / count(*) AS fech
    FROM dev a JOIN dev b ON b.id = a.id AND a.measure < b.measure
    GROUP BY 1, 2
)
SELECT p.measure_a, p.measure_b,
       ROUND(p.cov, 6) + 0.0 AS covariance,
       ROUND(CASE WHEN sa.sx * sb.sxb <> 0
                  THEN p.cov / (sa.sx * sb.sxb) END, 6) + 0.0 AS pearson,
       ROUND(CASE WHEN sa.sr * sb.srr <> 0
                  THEN p.rcov / (sa.sr * sb.srr) END, 6) + 0.0 AS spearman,
       ROUND(p.fech, 6) + 0.0 AS fechner
FROM pr_pairs p
JOIN sd sa ON sa.measure = p.measure_a
JOIN (SELECT measure, sx AS sxb, sr AS srr FROM sd) sb ON sb.measure = p.measure_b
ORDER BY measure_a, measure_b"""
    return _with_graph(body)


def _cc_ctes(iters: int) -> list[str]:
    ctes = ["cc0 AS (SELECT id, id AS label FROM vertices)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""cc{k} AS MATERIALIZED (
    SELECT l.id, least(l.label, COALESCE(m.cand, l.label)) AS label
    FROM cc{k-1} l
    LEFT JOIN (
        SELECT e.dst AS id, MIN(p.label) AS cand
        FROM edges e JOIN cc{k-1} p ON p.id = e.src
        WHERE e.src <> e.dst
        GROUP BY e.dst
    ) m ON m.id = l.id
)"""
        )
    return ctes


def sql_components(iters: int) -> str:
    """Unrolled hash-min label propagation; converges well before ``iters``
    on this graph (and the Spark side runs the same fixed count)."""
    body = ", ".join(_cc_ctes(iters)) + f" SELECT id, label FROM cc{iters} ORDER BY id"
    return _with_graph(body)


def sql_labelprop(iters: int) -> str:
    """Unrolled synchronous LP with (weight desc, label asc) tie-break
    (PLP.cpp:80-92, MPLP.cpp:122-128). Self-loops stay in the weighting —
    forNeighborsOf visits them and their weight backs the node's own
    current label (engine twin drops its loop filter identically)."""
    body = ", ".join(_lp_ctes(iters)) + f" SELECT id, label FROM lp{iters} ORDER BY id"
    return _with_graph(body)


def _lp_ctes(iters: int) -> list[str]:
    ctes = ["lp0 AS (SELECT id, id AS label FROM vertices)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""lp{k} AS MATERIALIZED (
    SELECT l.id, COALESCE(c.cand, l.label) AS label
    FROM lp{k-1} l
    LEFT JOIN (
        SELECT dst AS id, label AS cand FROM (
            SELECT e.dst, p.label, SUM(e.weight) AS wsum,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.dst
                       ORDER BY SUM(e.weight) DESC, p.label ASC
                   ) AS rn
            FROM edges e JOIN lp{k-1} p ON p.id = e.src
            GROUP BY e.dst, p.label
        ) WHERE rn = 1
    ) c ON c.id = l.id
)"""
        )
    return ctes


TRI_CTE = """
simple AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges WHERE src <> dst
),
und AS MATERIALIZED (SELECT u AS a, v AS b FROM simple UNION ALL SELECT v, u FROM simple),
degt AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
orient AS MATERIALIZED (
    SELECT u.a AS src, u.b AS dst
    FROM und u
    JOIN degt da ON da.id = u.a
    JOIN degt db ON db.id = u.b
    WHERE (da.deg > db.deg) OR (da.deg = db.deg AND u.a > u.b)
),
tri AS MATERIALIZED (
    SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
    FROM orient o1
    JOIN orient o2 ON o1.src = o2.src AND o1.dst <> o2.dst
    WHERE EXISTS (
        SELECT 1 FROM orient o3 WHERE o3.src = o1.dst AND o3.dst = o2.dst
    )
)
"""


def sql_triangle_pernode() -> str:
    body = f""", {TRI_CTE.strip().rstrip()},
corners AS (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
)
SELECT v.id, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS triangles
FROM vertices v
LEFT JOIN (SELECT id, count(*) AS cnt FROM corners GROUP BY id) t ON t.id = v.id
ORDER BY v.id"""
    return _with_graph(body.lstrip(", \n"))


def sql_triangle_global() -> str:
    body = f"{TRI_CTE.strip()} SELECT CAST(count(*) AS BIGINT) AS triangles FROM tri"
    return _with_graph(body)


def sql_lcc() -> str:
    body = f""", {TRI_CTE.strip()},
corners AS (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
pernode AS (
    SELECT v.id, COALESCE(t.cnt, 0) AS triangles
    FROM vertices v
    LEFT JOIN (SELECT id, count(*) AS cnt FROM corners GROUP BY id) t ON t.id = v.id
),
sdeg AS (SELECT a AS id, count(*) AS degree FROM und GROUP BY a)
SELECT p.id,
       ROUND(CASE WHEN COALESCE(s.degree, 0) >= 2
                  THEN 2.0 * p.triangles / (s.degree * (s.degree - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM pernode p LEFT JOIN sdeg s ON s.id = p.id
ORDER BY p.id"""
    return _with_graph(body.lstrip(", \n"))


def sql_transitivity() -> str:
    body = f""", {TRI_CTE.strip()},
sdeg AS (SELECT a AS id, count(*) AS d FROM und GROUP BY a)
SELECT ROUND(6.0 * (SELECT count(*) FROM tri) /
             (SELECT SUM(d * (d - 1)) FROM sdeg), 6) AS transitivity"""
    return _with_graph(body.lstrip(", \n"))


def sql_approx_transitivity(samples_per_vertex: int, seed: int = 42) -> str:
    """Mirror of operators/triangles.py approx_transitivity: identical
    hash-seeded neighbor-pair draws over identically-sorted adjacency
    arrays; every summed term is an integer-valued double, so the estimate
    matches bit-for-bit before rounding."""
    from networkit_spark.functions.hashing import md5_long_sql

    h1 = md5_long_sql(
        f"('{seed}:' || CAST(id AS STRING) || ':' || CAST(j AS STRING) || ':0')"
    )
    h2 = md5_long_sql(
        f"('{seed}:' || CAST(id AS STRING) || ':' || CAST(j AS STRING) || ':1')"
    )
    return _with_graph(
        f"""simple3 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges WHERE src <> dst
),
und3 AS (SELECT u AS a, v AS b FROM simple3 UNION ALL SELECT v, u FROM simple3),
arr3 AS (
    SELECT a AS id, list(b ORDER BY b) AS nbrs, count(*) AS deg
    FROM und3 GROUP BY a HAVING count(*) >= 2
),
samp AS (
    SELECT id, nbrs, deg, CAST(deg*(deg-1)/2.0 AS DOUBLE) AS w, t.j AS j
    FROM arr3 CROSS JOIN (SELECT unnest(range({samples_per_vertex})) AS j) t
),
pick AS (
    SELECT id, w,
           nbrs[CAST(({h1} % deg) + 1 AS INT)] AS b,
           nbrs[CAST((({h2} % (deg-1))
                      + CASE WHEN ({h2} % (deg-1)) >= ({h1} % deg) THEN 1 ELSE 0 END
                     ) + 1 AS INT)] AS c
    FROM samp
),
chk AS (
    SELECT p.w,
           CASE WHEN s.u IS NOT NULL THEN 1.0 ELSE 0.0 END AS closed
    FROM pick p
    LEFT JOIN simple3 s ON s.u = least(p.b, p.c) AND s.v = greatest(p.b, p.c)
)
SELECT ROUND(SUM(w * closed) / SUM(w), 6) + 0.0 AS approx_transitivity FROM chk"""
    )


def sql_triangle_edge_scores() -> str:
    """Per-canonical-edge triangle membership counts
    (TriangleEdgeScore.cpp:63-105)."""
    body = f""", {TRI_CTE.strip()},
tri_edges AS (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
),
canon_e AS (SELECT u, v FROM simple)
SELECT c.u AS src, c.v AS dst, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS score
FROM canon_e c
LEFT JOIN (SELECT u, v, count(*) AS cnt FROM tri_edges GROUP BY u, v) t
       ON t.u = c.u AND t.v = c.v
ORDER BY c.u, c.v"""
    return _with_graph(body.lstrip(", \n"))


def sql_degrees() -> str:
    return _with_graph(
        f"{DEG_CTE.strip()} SELECT id, degree, wdeg FROM degrees ORDER BY id"
    )


def sql_edges() -> str:
    return _with_graph(
        "SELECT src, dst, CAST(weight AS DOUBLE) AS weight FROM edges ORDER BY src, dst"
    )


def sql_top_entities(k: int = 20) -> str:
    body = f"""{DEG_CTE.strip()}
SELECT d.key, g.degree, g.wdeg
FROM degrees g JOIN dict d ON d.id = g.id
ORDER BY g.wdeg DESC, d.key ASC
LIMIT {k}"""
    return _with_graph(body)


def _sql_contract(inner: str, last: str) -> str:
    return f"""WITH {inner.rstrip().rstrip(',')},
cdict AS MATERIALIZED (
    SELECT label, CAST(row_number() OVER (ORDER BY label) - 1 AS BIGINT) AS cid
    FROM (SELECT DISTINCT label FROM {last})
),
contracted AS (
    SELECT ca.cid AS src, cb.cid AS dst,
           SUM(CASE WHEN e.src = e.dst THEN e.weight ELSE 0 END) AS loop_w,
           SUM(CASE WHEN e.src <> e.dst THEN e.weight ELSE 0 END) AS nl_w
    FROM edges e
    JOIN {last} la ON la.id = e.src
    JOIN {last} lb ON lb.id = e.dst
    JOIN cdict ca ON ca.label = la.label
    JOIN cdict cb ON cb.label = lb.label
    GROUP BY ca.cid, cb.cid
)
SELECT src, dst,
       CAST(CASE WHEN src = dst THEN loop_w + nl_w / 2 ELSE nl_w END AS DOUBLE) AS weight
FROM contracted ORDER BY src, dst"""


def sql_coarsen(cc_iters: int) -> str:
    return _sql_contract(*_cc_inner(cc_iters))


def sql_coarsen_lp(lp_iters: int) -> str:
    return _sql_contract(*_lp_inner(lp_iters))


def sql_modularity(lp_iters: int) -> str:
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
tew AS (
    SELECT (SUM(weight) - SUM(CASE WHEN src = dst THEN weight ELSE 0 END)) / 2
           + SUM(CASE WHEN src = dst THEN weight ELSE 0 END) AS w
    FROM edges
),
intra AS (
    SELECT (SUM(e.weight) - SUM(CASE WHEN e.src = e.dst THEN e.weight ELSE 0 END)) / 2
           + SUM(CASE WHEN e.src = e.dst THEN e.weight ELSE 0 END) AS w
    FROM edges e
    JOIN {last} la ON la.id = e.src
    JOIN {last} lb ON lb.id = e.dst
    WHERE la.label = lb.label
),
wdeg AS (
    SELECT src AS id, SUM(CASE WHEN src = dst THEN weight * 2 ELSE weight END) AS wd
    FROM edges GROUP BY src
),
vols AS (
    SELECT l.label, SUM(COALESCE(w.wd, 0)) AS vol
    FROM {last} l LEFT JOIN wdeg w ON w.id = l.id
    GROUP BY l.label
)
SELECT ROUND(
    (SELECT COALESCE(w, 0) FROM intra) / (SELECT w FROM tew)
    - (SELECT SUM((vol / (SELECT w FROM tew)) * (vol / (SELECT w FROM tew)) / 4.0)
       FROM vols),
6) + 0.0 AS modularity"""


# --------------------------------------------------------------------------
# documents / embeddings / events pipeline oracles (DuckDB dialect)
# --------------------------------------------------------------------------

# normalized tokens CTE over documents (DuckDB needs the 'g' regex flag;
# Spark's regexp_replace is global by default — same semantics)
DOCS_CTE = """
docs_norm AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               ' +', ' ', 'g')) AS norm
    FROM documents
),
docs_tok AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split(norm, ' '), t -> t <> '') AS toks,
           norm
    FROM docs_norm
)
"""


def sql_pack_sequences(capacity: int, seed: int = 42) -> str:
    """Contiguous-fill packing replay: cumsum of token counts along
    (md5(seed:pack:doc_id), doc_id); bin = floor(start/capacity)."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(f"('{seed}:pack:' || CAST(doc_id AS STRING))")
    return f"""WITH {DOCS_CTE},
nt AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, {h} AS h
    FROM docs_tok
),
rk AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
    FROM nt
)
SELECT doc_id, n_tokens,
       CAST(FLOOR((cum - n_tokens) / CAST({capacity} AS DOUBLE)) AS BIGINT) AS bin,
       CAST((cum - n_tokens) % {capacity} AS BIGINT) AS bin_offset
FROM rk ORDER BY doc_id"""


def sql_token_stats() -> str:
    return f"""WITH {DOCS_CTE}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(length(norm) AS BIGINT) AS n_chars_norm,
       ROUND(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS avg_token_len
FROM docs_tok ORDER BY doc_id"""


_EN = "'the','a','of','in','to','is','and'"


def sql_quality() -> str:
    return f"""WITH {DOCS_CTE},
q AS (
    SELECT doc_id,
           CAST(greatest(len(toks), 1) AS DOUBLE) AS n,
           CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE) AS stop_hits,
           CAST(len(list_distinct(toks)) AS DOUBLE) AS distinct_toks
    FROM docs_tok
)
SELECT doc_id,
       ROUND(stop_hits / n, 6) AS stopword_ratio,
       ROUND(distinct_toks / n, 6) AS distinct_ratio,
       ROUND(0.5 * (distinct_toks / n) + 0.3 * (1.0 - stop_hits / n)
             + 0.2 * least(n / 100.0, 1.0), 6) AS quality
FROM q ORDER BY doc_id"""


_LANG_LISTS = {
    "de": "'der','die','das','und','ist'",
    "en": _EN,
    "es": "'el','la','de','en','y','que'",
    "fr": "'le','la','et','les','des'",
}


def sql_lang_id() -> str:
    hit_cols = ",\n           ".join(
        f"CAST(len(list_filter(toks, t -> t IN ({lst}))) AS BIGINT) AS h_{lang}"
        for lang, lst in sorted(_LANG_LISTS.items())
    )
    # sequential (count desc, lang asc) fold, same as the Spark when-chain
    best, best_n = "'unk'", "CAST(0 AS BIGINT)"
    for lang in sorted(_LANG_LISTS):
        best = f"CASE WHEN h_{lang} > {best_n} THEN '{lang}' ELSE {best} END"
        best_n = f"CASE WHEN h_{lang} > {best_n} THEN h_{lang} ELSE {best_n} END"
    return f"""WITH {DOCS_CTE},
hits AS (
    SELECT doc_id,
           {hit_cols}
    FROM docs_tok
)
SELECT doc_id, {best} AS lang_guess FROM hits ORDER BY doc_id"""


def sql_fingerprint() -> str:
    from networkit_spark.functions.hashing import md5_long_sql

    return f"""WITH {DOCS_CTE}
SELECT doc_id, {md5_long_sql('norm')} AS fp FROM docs_norm ORDER BY doc_id"""


def sql_token_topk(k: int = 20) -> str:
    return f"""WITH {DOCS_CTE},
tok AS (SELECT unnest(toks) AS token FROM docs_tok)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM tok GROUP BY token
ORDER BY cnt DESC, token ASC LIMIT {k}"""


def sql_lm_score(vocab_size: int, add_k: float) -> str:
    """Unigram-LM quality proxy twin of textstats.lm_quality_score: same
    top-V vocabulary (count DESC, token ASC), same add-k smoothing over
    V+1 events with residual-count <unk>, same 6dp-rounded mean logprob."""
    return f"""WITH {DOCS_CTE},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs_tok),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
vocab AS (SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT {vocab_size}),
stats AS (
    SELECT (SELECT count(*) FROM tok) AS n_total,
           (SELECT COALESCE(sum(cnt), 0) FROM vocab) AS sv,
           (SELECT count(*) FROM vocab) AS v
),
scored AS (
    SELECT t.doc_id,
           ln((COALESCE(vb.cnt, s.n_total - s.sv) + {add_k})
              / (s.n_total + {add_k} * (s.v + 1))) AS lp
    FROM tok t
    CROSS JOIN stats s
    LEFT JOIN vocab vb ON t.tok = vb.tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(lp), 6) AS avg_logprob
FROM scored GROUP BY doc_id"""


def sql_dedup_exact() -> str:
    return """SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS dup_count,
       MIN(doc_id) AS rep_id
FROM documents GROUP BY md5(text)"""


def _sql_grams_expr(n: int) -> str:
    """A DuckDB list of word n-grams over docs_tok.toks (in token order)."""
    return (
        f"CASE WHEN len(toks) >= {n} "
        f"THEN list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> array_to_string(toks[i:i+{n}-1], ' ')) "
        f"ELSE [] END"
    )


def sql_ngram_repetition(n: int = 2) -> str:
    return f"""WITH {DOCS_CTE},
ng AS (SELECT doc_id, {_sql_grams_expr(n)} AS grams FROM docs_tok)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS total_ngrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_ngrams,
       ROUND(CASE WHEN len(grams) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) END,
             6) AS dup_fraction
FROM ng ORDER BY doc_id"""


def sql_decontaminate(n: int = 3, bench_mod: int = 23) -> str:
    return f"""WITH {DOCS_CTE},
shd AS (
    SELECT doc_id, unnest(list_distinct({_sql_grams_expr(n)})) AS shingle
    FROM docs_tok
),
bench AS (SELECT DISTINCT shingle FROM shd WHERE doc_id % {bench_mod} = 0),
target AS (SELECT doc_id FROM documents WHERE doc_id % {bench_mod} <> 0),
hits AS (
    SELECT s.doc_id, COUNT(*) AS n_hits
    FROM shd s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % {bench_mod} <> 0
    GROUP BY s.doc_id
)
SELECT t.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM target t LEFT JOIN hits h ON t.doc_id = h.doc_id
ORDER BY t.doc_id"""


SHINGLES_CTE = """
tok_pos AS (
    SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
    FROM docs_tok
),
sh AS MATERIALIZED (
    SELECT DISTINCT doc_id AS id,
           concat_ws(' ', tok,
                     lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                     lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS shingle
    FROM tok_pos
    QUALIFY lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)
"""


def sql_minhash_bands(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    mins = ",\n           ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    parts = []
    for b in range(bands):
        sig = ", ".join(f"h{b * rows + j}" for j in range(rows))
        parts.append(
            f"SELECT id, CAST({b} AS INT) AS band, md5(concat_ws('|', {sig})) AS bucket FROM mins"
        )
    return f"""WITH {DOCS_CTE}, {SHINGLES_CTE.strip()},
mins AS (
    SELECT id,
           {mins}
    FROM sh GROUP BY id
)
{' UNION ALL '.join(parts)}"""


def sql_dedup_canonical(
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
    rounds: int = 4,
) -> str:
    """Canonical doc per near-dup cluster: the engine's minhash bands +
    stop-bucket-capped candidate pairs, then ``rounds`` of min-label
    propagation (pinned, exact for cluster diameter <= rounds)."""
    rows = num_hashes // bands
    mins = ",\n           ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    parts = []
    for b in range(bands):
        sig = ", ".join(f"h{b * rows + j}" for j in range(rows))
        parts.append(
            f"SELECT id, CAST({b} AS INT) AS band, "
            f"md5(concat_ws('|', {sig})) AS bucket FROM mins"
        )
    ctes = [
        f"mins AS (SELECT id, {mins} FROM sh GROUP BY id)",
        "bandrows AS (" + " UNION ALL ".join(parts) + ")",
        "sized AS (SELECT id, band, bucket, "
        "COUNT(*) OVER (PARTITION BY band, bucket) AS sz FROM bandrows)",
        f"kept AS (SELECT id, band, bucket FROM sized WHERE sz <= {max_bucket})",
        "prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM kept a "
        "JOIN kept b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)",
        "sym AS (SELECT id_a AS u, id_b AS v FROM prs "
        "UNION ALL SELECT id_b, id_a FROM prs)",
        "l0 AS (SELECT DISTINCT u AS id, u AS canonical FROM sym)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""nm{r} AS (
    SELECT s.u AS id, MIN(l.canonical) AS nmin
    FROM sym s JOIN l{r-1} l ON l.id = s.v GROUP BY s.u
),
l{r} AS (
    SELECT l.id, LEAST(l.canonical, COALESCE(n.nmin, l.canonical)) AS canonical
    FROM l{r-1} l LEFT JOIN nm{r} n ON n.id = l.id
)"""
        )
    return (
        f"WITH {DOCS_CTE}, {SHINGLES_CTE.strip()},\n"
        + ",\n".join(ctes)
        + f"\nSELECT id, canonical FROM l{rounds} ORDER BY id"
    )


def sql_simhash(bits: int = 32) -> str:
    from networkit_spark.functions.hashing import md5_long_sql

    sums = ",\n           ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""WITH {DOCS_CTE},
tok AS (
    SELECT DISTINCT doc_id AS id, unnest(toks) AS tok FROM docs_tok
),
hashed AS (SELECT id, {md5_long_sql('tok')} AS hv FROM tok),
bitsums AS (
    SELECT id,
           {sums}
    FROM hashed GROUP BY id
)
SELECT id, CAST({packed} AS BIGINT) AS simhash FROM bitsums ORDER BY id"""


def sql_jaccard_pairs(threshold: float = 0.5, max_freq: int = 100) -> str:
    return f"""WITH {DOCS_CTE}, {SHINGLES_CTE.strip()},
kept AS (
    SELECT id, shingle FROM sh
    WHERE shingle IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_freq}
    )
),
sizes AS (SELECT id, count(*) AS sz FROM kept GROUP BY id),
shared AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
    FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b,
       ROUND(CAST(s.shared AS DOUBLE) / (sa.sz + sb.sz - s.shared), 6) AS jaccard
FROM shared s
JOIN sizes sa ON sa.id = s.id_a
JOIN sizes sb ON sb.id = s.id_b
WHERE CAST(s.shared AS DOUBLE) / (sa.sz + sb.sz - s.shared) >= {threshold}"""


EMB_CTE = """
emb AS (
    SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
    FROM embeddings
),
norms AS MATERIALIZED (
    SELECT vec_id,
           sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm,
           e
    FROM emb
)
"""


def sql_cosine_topk(n_queries: int = 5, k: int = 10) -> str:
    return f"""WITH {EMB_CTE},
sims AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]),
                             (a, b) -> a + b) / (q.nrm * c.nrm), 6) AS sim
    FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {n_queries}
)
SELECT query_id, neighbor_id, sim FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rn FROM sims
) WHERE rn <= {k}"""


def sql_lsh_ann(
    n_queries: int = 5,
    k: int = 3,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Mirror of functions/similarity.py lsh_ann_topk: the SAME seeded
    Gaussian hyperplanes (shared decimal literals), per-table sign buckets,
    OR-amplified candidate union, exact cosine re-rank."""
    from networkit_spark.functions.similarity import hyperplanes

    planes = hyperplanes(dim, nbits, n_tables, seed)
    tables = []
    for t, tbl in enumerate(planes):
        bits = []
        for i, plane in enumerate(tbl):
            lits = "[" + ", ".join(repr(x) for x in plane) + "]"
            dot = (
                f"list_reduce(list_transform(list_zip(e, {lits}),"
                " p -> p[1] * p[2]), (a, b) -> a + b)"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** i} ELSE 0 END)")
        tables.append(
            f"SELECT vec_id, CAST({t} AS INT) AS tbl,"
            f" CAST({' + '.join(bits)} AS BIGINT) AS bucket FROM norms"
        )
    return f"""WITH {EMB_CTE},
withb AS MATERIALIZED ({' UNION ALL '.join(tables)}),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
    FROM withb q JOIN withb c ON c.tbl = q.tbl AND c.bucket = q.bucket
    WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           ROUND(list_reduce(list_transform(list_zip(q.e, c.e), p -> p[1] * p[2]),
                             (a, b) -> a + b) / (q.nrm * c.nrm), 6) AS sim
    FROM cand cd
    JOIN norms q ON q.vec_id = cd.query_id
    JOIN norms c ON c.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, sim FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rn FROM sims
) WHERE rn <= {k}"""


def sql_multimodal_meta() -> str:
    return """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 128 AS INT) AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 128 AS INT) AS height
FROM documents ORDER BY doc_id"""


def sql_sessionize(gap_s: int = 1800) -> str:
    return f"""WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_s} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM marked
),
per_session AS (
    SELECT user_id, session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_len,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM per_session GROUP BY user_id ORDER BY user_id"""


# --------------------------------------------------------------------------
# centrality / distance / measure oracles (DuckDB dialect)
# --------------------------------------------------------------------------


def sql_degree_centrality(normalized: bool = False) -> str:
    scale = "/ ((SELECT count(*) FROM vertices) - 1)" if normalized else ""
    return _with_graph(
        f"""{DEG_CTE.strip()}
SELECT id, ROUND(CAST(degree AS DOUBLE){scale}, 6) AS score FROM degrees ORDER BY id"""
    )


def sql_eigenvector(iters: int) -> str:
    """Per-step L2-normalized power iteration, exactly the operator's shape
    (operators/centrality.py eigenvector_centrality)."""
    ctes = [
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices)",
        "ev0 AS (SELECT id, 1.0/sqrt((SELECT n FROM nn)) AS score FROM vertices)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""raw{k} AS MATERIALIZED (
    SELECT v.id, COALESCE(m.mass, 0.0) AS raw
    FROM vertices v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.score * e.weight) AS mass
        FROM edges e JOIN ev{k-1} p ON p.id = e.src GROUP BY e.dst
    ) m ON m.id = v.id
),
ev{k} AS MATERIALIZED (
    SELECT id, raw / (SELECT sqrt(SUM(raw*raw)) FROM raw{k}) AS score FROM raw{k}
)"""
        )
    body = ", ".join(ctes) + f" SELECT id, ROUND(score, 6) AS score FROM ev{iters} ORDER BY id"
    return _with_graph(body)


def sql_katz(iters: int, alpha: float, beta: float) -> str:
    ctes = ["kz0 AS (SELECT id, 0.0 AS score FROM vertices)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""kz{k} AS MATERIALIZED (
    SELECT v.id, {beta} + {alpha} * COALESCE(m.mass, 0.0) AS score
    FROM vertices v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.score * e.weight) AS mass
        FROM edges e JOIN kz{k-1} p ON p.id = e.src GROUP BY e.dst
    ) m ON m.id = v.id
)"""
        )
    body = ", ".join(ctes) + (
        f""" SELECT id, ROUND(score / (SELECT sqrt(SUM(score*score)) FROM kz{iters}), 6) AS score
FROM kz{iters} ORDER BY id"""
    )
    return _with_graph(body)


def _bfs_ctes(iters: int, source: int = 0) -> list[str]:
    """Shared unrolled min-plus BFS CTE chain (b0..b{iters}) — composed by
    sql_bfs and sql_bfs_sample (like _cc_ctes/_lp_ctes) so neither slices
    the other's SQL text."""
    ctes = [f"b0 AS (SELECT CAST({source} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""b{k} AS MATERIALIZED (
    SELECT id, MIN(dist) AS dist FROM (
        SELECT id, dist FROM b{k-1}
        UNION ALL
        SELECT e.dst AS id, p.dist + 1 AS dist
        FROM edges e JOIN b{k-1} p ON p.id = e.src
    ) GROUP BY id
)"""
        )
    return ctes


def sql_bfs(iters: int, source: int = 0) -> str:
    """Unrolled min-plus BFS from ``source``; unreachable vertices absent."""
    body = ", ".join(_bfs_ctes(iters, source)) + f" SELECT id, dist FROM b{iters} ORDER BY id"
    return _with_graph(body)


def sql_sssp(iters: int, source: int = 0) -> str:
    """Unrolled Bellman-Ford relaxation (weighted min-plus)."""
    ctes = [f"s0 AS (SELECT CAST({source} AS BIGINT) AS id, 0.0 AS dist)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"""s{k} AS MATERIALIZED (
    SELECT id, MIN(dist) AS dist FROM (
        SELECT id, dist FROM s{k-1}
        UNION ALL
        SELECT e.dst AS id, p.dist + e.weight AS dist
        FROM edges e JOIN s{k-1} p ON p.id = e.src
    ) GROUP BY id
)"""
        )
    body = ", ".join(ctes) + f" SELECT id, ROUND(dist, 6) AS dist FROM s{iters} ORDER BY id"
    return _with_graph(body)


def _lp_inner(lp_iters: int) -> tuple[str, str]:
    """(CTE block, last-CTE name) for oracles consuming an LP partition —
    composed from GRAPH_CTE + _lp_ctes, the same parts sql_labelprop
    renders, never sliced back out of rendered SQL (ADVICE r3)."""
    return ", ".join([GRAPH_CTE.strip()] + _lp_ctes(lp_iters)), f"lp{lp_iters}"


def _cc_inner(cc_iters: int) -> tuple[str, str]:
    """Same contract as _lp_inner for the hash-min components chain."""
    return ", ".join([GRAPH_CTE.strip()] + _cc_ctes(cc_iters)), f"cc{cc_iters}"


TEW_CTE = """tew AS (
    SELECT (SUM(weight) - SUM(CASE WHEN src = dst THEN weight ELSE 0 END)) / 2
           + SUM(CASE WHEN src = dst THEN weight ELSE 0 END) AS w
    FROM edges
)"""


def sql_coverage(lp_iters: int) -> str:
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
{TEW_CTE},
intra AS (
    SELECT (SUM(e.weight) - SUM(CASE WHEN e.src = e.dst THEN e.weight ELSE 0 END)) / 2
           + SUM(CASE WHEN e.src = e.dst THEN e.weight ELSE 0 END) AS w
    FROM edges e
    JOIN {last} la ON la.id = e.src
    JOIN {last} lb ON lb.id = e.dst
    WHERE la.label = lb.label
)
SELECT ROUND((SELECT COALESCE(w, 0) FROM intra) / (SELECT w FROM tew), 6) + 0.0 AS coverage"""


def sql_edgecut(lp_iters: int) -> str:
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
cut AS (
    SELECT SUM(e.weight) / 2 AS w
    FROM edges e
    JOIN {last} la ON la.id = e.src
    JOIN {last} lb ON lb.id = e.dst
    WHERE la.label <> lb.label
)
SELECT ROUND(COALESCE((SELECT w FROM cut), 0), 6) + 0.0 AS edge_cut"""


def sql_conductance(lp_iters: int) -> str:
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
wdeg AS (
    SELECT src AS id, SUM(CASE WHEN src = dst THEN weight * 2 ELSE weight END) AS wd
    FROM edges GROUP BY src
),
vols AS (
    SELECT l.label, SUM(COALESCE(w.wd, 0)) AS vol
    FROM {last} l LEFT JOIN wdeg w ON w.id = l.id GROUP BY l.label
),
total AS (SELECT SUM(vol) AS tv FROM vols),
cut AS (
    SELECT la.label, SUM(e.weight) AS c
    FROM edges e
    JOIN {last} la ON la.id = e.src
    JOIN {last} lb ON lb.id = e.dst
    WHERE la.label <> lb.label
    GROUP BY la.label
)
SELECT v.label,
       ROUND(CASE WHEN least(v.vol, (SELECT tv FROM total) - v.vol) > 0
             THEN COALESCE(c.c, 0.0) / least(v.vol, (SELECT tv FROM total) - v.vol)
             ELSE 0.0 END, 6) AS conductance
FROM vols v LEFT JOIN cut c ON c.label = v.label
ORDER BY v.label"""


def sql_stable_fraction(lp_iters: int) -> str:
    """Reference stability criterion over lp{N}
    (StablePartitionNodes.cpp:42-70): stable iff isolated, or the own
    label's incident weight (self-loops included) is positive and
    STRICTLY greater than every other label's weight — ties with another
    label mark the node unstable."""
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
lw AS (
    SELECT e.dst AS id, p.label AS nlabel, SUM(e.weight) AS w
    FROM edges e JOIN {last} p ON p.id = e.src
    GROUP BY e.dst, p.label
),
st AS (
    SELECT l.id,
           MAX(CASE WHEN w.nlabel = l.label THEN w.w END) AS own_w,
           MAX(CASE WHEN w.nlabel <> l.label THEN w.w END) AS other_max,
           COUNT(w.nlabel) AS nn
    FROM {last} l LEFT JOIN lw w ON w.id = l.id
    GROUP BY l.id, l.label
)
SELECT ROUND(
    CAST(SUM(CASE WHEN nn = 0
                    OR (COALESCE(own_w, 0) > 0
                        AND COALESCE(own_w, 0) > COALESCE(other_max, 0))
             THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 6) + 0.0 AS stable_fraction
FROM st"""


def _apsp_ctes(iters: int) -> list[str]:
    """All-pairs unweighted BFS, frontier-unrolled: ap{k}(s, v, dist) holds
    every pair with true distance <= k (simple symmetric adjacency)."""
    ctes = [
        "uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "ap0 AS (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM vertices)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""apn{k} AS (
    SELECT p.s, e.dst AS v, CAST({k} AS BIGINT) AS dist
    FROM ap{k-1} p JOIN uadj e ON e.src = p.v
    WHERE p.dist = {k-1}
    GROUP BY p.s, e.dst
),
ap{k} AS MATERIALIZED (
    SELECT s, v, dist FROM ap{k-1}
    UNION ALL
    SELECT n.s, n.v, n.dist FROM apn{k} n
    WHERE NOT EXISTS (SELECT 1 FROM ap{k-1} o WHERE o.s = n.s AND o.v = n.v)
)"""
        )
    return ctes


def sql_harmonic_closeness(iters: int, normalized: bool = False) -> str:
    scale = f" / ({'(SELECT count(*) FROM vertices) - 1'})" if normalized else ""
    body = ", ".join(_apsp_ctes(iters)) + f""",
hsc AS (
    SELECT s AS id, SUM(1.0 / dist) AS sc FROM ap{iters} WHERE dist > 0 GROUP BY s
)
SELECT ver.id, ROUND(COALESCE(h.sc, 0.0){scale}, 6) AS score
FROM vertices ver LEFT JOIN hsc h ON h.id = ver.id ORDER BY ver.id"""
    return _with_graph(body)


def sql_closeness(iters: int, normalized: bool = False) -> str:
    """Standard-variant closeness 1/sum(dist), Closeness.hpp:80-94."""
    scale = " * ((SELECT count(*) FROM vertices) - 1)" if normalized else ""
    body = ", ".join(_apsp_ctes(iters)) + f""",
csc AS (
    SELECT s AS id, SUM(dist) AS sum_d FROM ap{iters} GROUP BY s
)
SELECT ver.id,
       ROUND(CASE WHEN c.sum_d > 0 THEN 1.0 / c.sum_d ELSE 0.0 END{scale}, 6) AS score
FROM vertices ver LEFT JOIN csc c ON c.id = ver.id ORDER BY ver.id"""
    return _with_graph(body)


def sql_diameter(iters: int) -> str:
    body = ", ".join(_apsp_ctes(iters)) + (
        f" SELECT CAST(MAX(dist) AS BIGINT) AS diameter FROM ap{iters}"
    )
    return _with_graph(body)


def sql_betweenness(iters: int, normalized: bool = False) -> str:
    """Exact betweenness via the pair-dependency closed form over an
    all-pairs (dist, sigma) table: bc(v) = Σ_{s≠v≠t, s≠t, d(s,v)+d(v,t)=d(s,t)}
    σ_sv·σ_vt/σ_st — summed over ORDERED pairs, matching Betweenness.cpp's
    all-sources dependency accumulation (no undirected halving). The
    (dist, sigma) table is frontier-unrolled BFS with path counting — a
    structurally different algorithm from the engine's Brandes backward
    pass, same fixed point."""
    ctes = [
        "uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        """bw0 AS (
    SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist, CAST(1 AS DOUBLE) AS sigma
    FROM vertices
)""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""bwn{k} AS (
    SELECT p.s, e.dst AS v, CAST({k} AS BIGINT) AS dist, SUM(p.sigma) AS sigma
    FROM bw{k-1} p JOIN uadj e ON e.src = p.v
    WHERE p.dist = {k-1}
    GROUP BY p.s, e.dst
),
bw{k} AS MATERIALIZED (
    SELECT s, v, dist, sigma FROM bw{k-1}
    UNION ALL
    SELECT n.s, n.v, n.dist, n.sigma FROM bwn{k} n
    WHERE NOT EXISTS (SELECT 1 FROM bw{k-1} o WHERE o.s = n.s AND o.v = n.v)
)"""
        )
    scale = (
        " / (((SELECT count(*) FROM vertices) - 1.0)"
        " * ((SELECT count(*) FROM vertices) - 2.0))"
        if normalized
        else ""
    )
    body = ", ".join(ctes) + f""",
bsc AS (
    SELECT sv.v AS id, SUM(sv.sigma * vt.sigma / st.sigma) AS sc
    FROM bw{iters} sv
    JOIN bw{iters} vt ON vt.s = sv.v
    JOIN bw{iters} st ON st.s = sv.s AND st.v = vt.v
    WHERE sv.dist + vt.dist = st.dist
      AND sv.s <> sv.v AND vt.v <> sv.v AND sv.s <> vt.v
    GROUP BY sv.v
)
SELECT ver.id, ROUND(COALESCE(b.sc, 0.0){scale}, 6) AS score
FROM vertices ver LEFT JOIN bsc b ON b.id = ver.id ORDER BY ver.id"""
    return _with_graph(body)


def sql_approx_betweenness_rk(
    num_samples: int, max_depth: int, seed: int = 42
) -> str:
    """Riondato-Kornaropoulos sampled-path betweenness
    (ApproxBetweenness.cpp semantics, md5-derandomized): unrolled
    forward BFS with path counts from the sampled sources, then
    max_depth-1 unrolled backward-walk steps with sigma-weighted
    inverse-CDF predecessor picks — identical draws and cumulative
    order as the engine."""
    from networkit_spark.functions.hashing import md5_long_sql

    unit = float(1 << 48)
    hs = md5_long_sql(f"('{seed}:abs:' || CAST(i AS STRING))")
    ht = md5_long_sql(f"('{seed}:abt:' || CAST(i AS STRING))")
    ctes = [
        "uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices)",
        f"""smp AS MATERIALIZED (
    SELECT i, s, CAST((s + off) % (SELECT n FROM nn) AS BIGINT) AS t FROM (
        SELECT CAST(unnest(range({num_samples})) AS BIGINT) AS i
    ) w, LATERAL (
        SELECT CAST({hs} % (SELECT n FROM nn) AS BIGINT) AS s,
               CAST({ht} % ((SELECT n FROM nn) - 1) + 1 AS BIGINT) AS off
    ) d
)""",
        """bw0 AS (
    SELECT s, s AS v, CAST(0 AS BIGINT) AS dist, CAST(1 AS DOUBLE) AS sigma
    FROM (SELECT DISTINCT s FROM smp)
)""",
    ]
    for k in range(1, max_depth + 1):
        ctes.append(
            f"""bwn{k} AS (
    SELECT p.s, e.dst AS v, CAST({k} AS BIGINT) AS dist, SUM(p.sigma) AS sigma
    FROM bw{k-1} p JOIN uadj e ON e.src = p.v
    WHERE p.dist = {k-1}
    GROUP BY p.s, e.dst
),
bw{k} AS MATERIALIZED (
    SELECT s, v, dist, sigma FROM bw{k-1}
    UNION ALL
    SELECT n.s, n.v, n.dist, n.sigma FROM bwn{k} n
    WHERE NOT EXISTS (SELECT 1 FROM bw{k-1} o WHERE o.s = n.s AND o.v = n.v)
)"""
        )
    D = f"bw{max_depth}"
    ctes.append(
        f"""wk0 AS (
    SELECT m.i, m.s, m.t AS cur, b.dist AS dd
    FROM smp m JOIN {D} b ON b.s = m.s AND b.v = m.t
    WHERE b.dist >= 1
)"""
    )
    for j in range(1, max_depth):
        hp = md5_long_sql(f"('{seed}:abp:{j}:' || CAST(i AS STRING))")
        ctes.append(
            f"""pr{j} AS (
    SELECT w.i, e.src AS p, b.sigma
    FROM wk{j-1} w
    JOIN uadj e ON e.dst = w.cur
    JOIN {D} b ON b.s = w.s AND b.v = e.src AND b.dist = w.dd - 1
    WHERE w.dd > 1
),
pk{j} AS (
    SELECT i, p FROM (
        SELECT i, p, ROW_NUMBER() OVER (PARTITION BY i ORDER BY p) AS rn
        FROM (
            SELECT i, p,
                   SUM(sigma) OVER (PARTITION BY i ORDER BY p
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   ({hp} / {unit!r}) * SUM(sigma) OVER (PARTITION BY i) AS rd
            FROM pr{j}
        ) WHERE cum > rd
    ) WHERE rn = 1
),
wk{j} AS MATERIALIZED (
    SELECT w.i, w.s, COALESCE(k.p, w.cur) AS cur,
           CASE WHEN k.p IS NOT NULL THEN w.dd - 1 ELSE w.dd END AS dd
    FROM wk{j-1} w LEFT JOIN pk{j} k ON k.i = w.i
)"""
        )
    credit_union = " UNION ALL ".join(
        f"SELECT i, p FROM pk{j}" for j in range(1, max_depth)
    )
    body = (
        ", ".join(ctes)
        + f""",
cr AS ({credit_union}),
cnt AS (SELECT p AS id, CAST(COUNT(*) AS BIGINT) AS c FROM cr GROUP BY p)
SELECT v.id,
       ROUND(COALESCE(c.c, 0) / {float(num_samples)!r}, 6) + 0.0 AS score
FROM vertices v LEFT JOIN cnt c ON c.id = v.id
ORDER BY v.id"""
    )
    return _with_graph(body)


def sql_plm_invariants() -> str:
    """Closed-form oracle for the free-running PLM invariant row
    (entry_queries.q_graph_plm): n_nodes is recomputed from the same edge
    derivation; the partition-validity counts collapse to n_nodes/0 and the
    modularity invariants (finite, in [-0.5, 1], non-decreasing per level)
    are TRUE for a correct run."""
    return _with_graph(
        """SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(0 AS BIGINT) AS null_labels,
       TRUE AS has_levels,
       TRUE AS q_in_range,
       TRUE AS q_nondecreasing
FROM vertices"""
    )


def sql_plm_pinned(sweeps: int, gamma: float = 1.0) -> str:
    """Unrolled synchronous Louvain move phase, sweep-for-sweep the shape of
    operators/louvain.py _move_phase(exact_sweeps=True): per sweep, each
    node's affinity to neighboring communities, the PLM.cpp:129-135 gain
    Δmod = (aff_C - aff_D\\u)/ω + γ·vol(u)·((vol(D)-vol(u)) - vol(C))/(2ω²),
    argmax gain > 1e-15 with smallest-community tie-break, all moves applied
    at once. Every gain operand is an exactly-representable integer sum, so
    the comparison order is identical across engines."""
    ctes = [
        TEW_CTE,
        """pvol AS MATERIALIZED (
    SELECT ver.id, COALESCE(w.wd, 0) AS vol
    FROM vertices ver LEFT JOIN (
        SELECT src AS id, SUM(CASE WHEN src = dst THEN weight * 2 ELSE weight END) AS wd
        FROM edges GROUP BY src
    ) w ON w.id = ver.id
)""",
        "pnl AS MATERIALIZED (SELECT src, dst, weight FROM edges WHERE src <> dst)",
        "pl0 AS (SELECT id, id AS label FROM vertices)",
    ]
    for k in range(1, sweeps + 1):
        p = f"pl{k-1}"
        ctes.append(
            f"""pcv{k} AS MATERIALIZED (
    SELECT l.label, SUM(v.vol) AS cvol
    FROM {p} l JOIN pvol v ON v.id = l.id GROUP BY l.label
),
paff{k} AS MATERIALIZED (
    SELECT e.src AS id, lb.label AS cand, SUM(e.weight) AS aff
    FROM pnl e JOIN {p} lb ON lb.id = e.dst
    GROUP BY e.src, lb.label
),
pbest{k} AS (
    SELECT id, cand FROM (
        SELECT a.id, a.cand,
               ROW_NUMBER() OVER (
                   PARTITION BY a.id ORDER BY
                   ((a.aff - COALESCE(own.aff, 0)) / (SELECT w FROM tew)
                    + {gamma} * v.vol * ((dv.cvol - v.vol) - cv.cvol)
                      / (2.0 * (SELECT w FROM tew) * (SELECT w FROM tew))) DESC,
                   a.cand ASC
               ) AS rn
        FROM paff{k} a
        JOIN {p} l ON l.id = a.id
        JOIN pvol v ON v.id = a.id
        JOIN pcv{k} dv ON dv.label = l.label
        JOIN pcv{k} cv ON cv.label = a.cand
        LEFT JOIN paff{k} own ON own.id = a.id AND own.cand = l.label
        WHERE a.cand <> l.label
          AND ((a.aff - COALESCE(own.aff, 0)) / (SELECT w FROM tew)
               + {gamma} * v.vol * ((dv.cvol - v.vol) - cv.cvol)
                 / (2.0 * (SELECT w FROM tew) * (SELECT w FROM tew))) > 1e-15
    ) WHERE rn = 1
),
pl{k} AS MATERIALIZED (
    SELECT l.id, COALESCE(b.cand, l.label) AS label
    FROM {p} l LEFT JOIN pbest{k} b ON b.id = l.id
)"""
        )
    body = ", ".join(ctes) + f" SELECT id, label FROM pl{sweeps} ORDER BY id"
    return _with_graph(body)


def sql_core_decomposition(iters: int) -> str:
    """Unrolled h-index iteration (same recurrence as
    operators/centrality.py core_decomposition): core0 = simple degree;
    core_k(v) = min(core_{k-1}(v), H(neighbor cores)). H over the
    desc-sorted neighbor cores is MAX(rn where core >= rn) — the indicator
    is prefix-true, so it equals the Spark side's Σ 1[a[i] >= i+1]."""
    ctes = [
        """sek AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges WHERE src <> dst
)""",
        "sndk AS MATERIALIZED (SELECT u AS a, v AS b FROM sek UNION ALL SELECT v, u FROM sek)",
        """kc0 AS (
    SELECT ver.id, CAST(COALESCE(d.deg, 0) AS BIGINT) AS core
    FROM vertices ver
    LEFT JOIN (SELECT a AS id, count(*) AS deg FROM sndk GROUP BY a) d ON d.id = ver.id
)""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""kh{k} AS (
    SELECT id, MAX(CASE WHEN ncore >= rn THEN rn ELSE 0 END) AS h FROM (
        SELECT e.a AS id, c.core AS ncore,
               ROW_NUMBER() OVER (PARTITION BY e.a ORDER BY c.core DESC) AS rn
        FROM sndk e JOIN kc{k-1} c ON c.id = e.b
    ) GROUP BY id
),
kc{k} AS MATERIALIZED (
    SELECT p.id,
           CAST(CASE WHEN h.h IS NULL THEN p.core
                     ELSE least(p.core, h.h) END AS BIGINT) AS core
    FROM kc{k-1} p LEFT JOIN kh{k} h ON h.id = p.id
)"""
        )
    body = ", ".join(ctes) + f" SELECT id, core FROM kc{iters} ORDER BY id"
    return _with_graph(body)


def sql_sample_nodes(k: int, seed: int = 42) -> str:
    from networkit_spark.functions.hashing import md5_long_sql

    rk = md5_long_sql(f"('{seed}:' || CAST(id AS STRING))")
    return _with_graph(
        f"""SELECT id FROM (
    SELECT id, {rk} AS rk FROM vertices ORDER BY rk, id LIMIT {k}
) ORDER BY id"""
    )


def sql_sample_edges(k: int, seed: int = 42) -> str:
    from networkit_spark.functions.hashing import md5_long_sql

    rk = md5_long_sql(
        f"('{seed}:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
    )
    return _with_graph(
        f"""canon AS (SELECT DISTINCT src, dst FROM edges WHERE src <= dst)
SELECT src, dst FROM (
    SELECT src, dst, {rk} AS rk FROM canon ORDER BY rk, src, dst LIMIT {k}
) ORDER BY src, dst"""
    )


def sql_partition_measures(lp_iters: int, lp_iters_b: int) -> str:
    """NMI / node-structural Rand / Jaccard dissimilarity between the
    lp{lp_iters} and lp{lp_iters_b} partitions (lp{b} is an intermediate
    CTE of the same unrolled chain). Formulas: NMIDistance.cpp,
    NodeStructuralRandMeasure.cpp, JaccardMeasure.cpp."""
    assert lp_iters_b < lp_iters
    inner, a = _lp_inner(lp_iters)
    b = f"lp{lp_iters_b}"
    return f"""WITH {inner},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
msz AS (SELECT label, CAST(count(*) AS DOUBLE) AS s FROM {a} GROUP BY label),
mse AS (SELECT label, CAST(count(*) AS DOUBLE) AS s FROM {b} GROUP BY label),
mov AS (
    SELECT za.label AS la, eb.label AS lb, CAST(count(*) AS DOUBLE) AS s
    FROM {a} za JOIN {b} eb ON eb.id = za.id GROUP BY 1, 2
),
sums AS (
    SELECT (SELECT SUM(s*(s-1)/2.0) FROM msz) AS sum_z,
           (SELECT SUM(s*(s-1)/2.0) FROM mse) AS sum_e,
           (SELECT SUM(s*(s-1)/2.0) FROM mov) AS sum_i,
           (SELECT n FROM nn) AS n
),
mi AS (
    SELECT SUM((o.s / (SELECT n FROM nn))
               * log2(o.s * (SELECT n FROM nn) / (z.s * e.s))) AS mi
    FROM mov o JOIN msz z ON z.label = o.la JOIN mse e ON e.label = o.lb
),
ent AS (
    SELECT (SELECT -SUM((s/(SELECT n FROM nn)) * log2(s/(SELECT n FROM nn))) FROM msz) AS hz,
           (SELECT -SUM((s/(SELECT n FROM nn)) * log2(s/(SELECT n FROM nn))) FROM mse) AS he
)
SELECT
  ROUND(CASE WHEN (SELECT hz + he FROM ent) < 1e-12 THEN 0.0
             ELSE 1.0 - 2.0 * (SELECT mi FROM mi) / (SELECT hz + he FROM ent) END, 6)
    + 0.0 AS nmi_distance,
  ROUND(1.0 - 2.0 * (n*(n-1)/2.0 + 2.0*sum_i - (sum_z + sum_e)) / (n*(n-1)), 6)
    + 0.0 AS rand_distance,
  ROUND(CASE WHEN (n*(n-1) - 2.0*(n*(n-1)/2.0 + sum_i - (sum_z + sum_e))) > 0
             THEN 1.0 - 2.0*sum_i / (n*(n-1) - 2.0*(n*(n-1)/2.0 + sum_i - (sum_z + sum_e)))
             ELSE 0.0 END, 6) + 0.0 AS jaccard_distance
FROM sums"""


def sql_linkpred(max_hinge_degree: int | None = None) -> str:
    """All-index link prediction over 2-hop non-adjacent pairs (matches
    operators/linkprediction.py, including the hub-hinge cap)."""
    hinge_cap = (
        f"JOIN sdeg dh ON dh.id = uw.a AND dh.deg <= {max_hinge_degree}"
        if max_hinge_degree is not None
        else ""
    )
    return _with_graph(
        f"""simple2 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
und2 AS MATERIALIZED (SELECT a, b FROM simple2 UNION ALL SELECT b, a FROM simple2),
sdeg AS (SELECT a AS id, count(*) AS deg FROM und2 GROUP BY a),
wedges AS (
    SELECT uw.b AS u, wv.b AS v, uw.a AS w
    FROM und2 uw JOIN und2 wv ON uw.a = wv.a AND uw.b < wv.b
    {hinge_cap}
),
overlap AS (
    SELECT w2.u, w2.v,
           CAST(count(*) AS BIGINT) AS cn,
           SUM(1.0 / ln(dw.deg)) AS aa,
           SUM(1.0 / dw.deg) AS ra
    FROM wedges w2 JOIN sdeg dw ON dw.id = w2.w
    GROUP BY w2.u, w2.v
),
cand AS (
    SELECT o.* FROM overlap o
    WHERE NOT EXISTS (
        SELECT 1 FROM simple2 s WHERE s.a = o.u AND s.b = o.v
    )
)
SELECT c.u, c.v, c.cn, ROUND(c.aa, 6) AS aa, ROUND(c.ra, 6) AS ra,
       ROUND(CAST(c.cn AS DOUBLE) / (du.deg + dv.deg - c.cn), 6) AS jaccard,
       CAST(du.deg * dv.deg AS BIGINT) AS pa,
       CAST(du.deg + dv.deg - c.cn AS BIGINT) AS tn
FROM cand c
JOIN sdeg du ON du.id = c.u
JOIN sdeg dv ON dv.id = c.v
WHERE c.cn >= 1
ORDER BY c.u, c.v"""
    )


def sql_linkpred_ext(
    max_hinge_degree: int | None = None, cc_iters: int = 12
) -> str:
    """The remaining predictor-family indices (matches
    operators/linkprediction.py extended_link_prediction_scores +
    same_community_index over hash-min CC labels): nd, ari (with the
    reference's set_union quirk reproduced), u_deg/v_deg, nm (cn + 3-path
    count), sc."""
    hinge_cap = (
        f"JOIN sdeg dh ON dh.id = uw.a AND dh.deg <= {max_hinge_degree}"
        if max_hinge_degree is not None
        else ""
    )
    a_cap = (
        f"JOIN sdeg da ON da.id = ua.b AND da.deg <= {max_hinge_degree}"
        if max_hinge_degree is not None
        else ""
    )
    body = ", ".join(
        _cc_ctes(cc_iters)
        + [
            f"""simple2 AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM edges WHERE src <> dst
),
und2 AS MATERIALIZED (SELECT a, b FROM simple2 UNION ALL SELECT b, a FROM simple2),
sdeg AS (SELECT a AS id, count(*) AS deg FROM und2 GROUP BY a),
wedges AS (
    SELECT uw.b AS u, wv.b AS v
    FROM und2 uw JOIN und2 wv ON uw.a = wv.a AND uw.b < wv.b
    {hinge_cap}
),
cand AS MATERIALIZED (
    SELECT o.u, o.v, o.cn FROM (
        SELECT u, v, CAST(count(*) AS BIGINT) AS cn FROM wedges GROUP BY u, v
    ) o
    WHERE o.cn >= 1
      AND NOT EXISTS (SELECT 1 FROM simple2 s WHERE s.a = o.u AND s.b = o.v)
),
paths AS (
    SELECT c.u, c.v, CAST(count(*) AS BIGINT) AS p3
    FROM cand c
    JOIN und2 ua ON ua.a = c.u
    {a_cap}
    JOIN und2 ab ON ab.a = ua.b
    JOIN und2 vb ON vb.a = c.v AND vb.b = ab.b
    GROUP BY c.u, c.v
),
terms AS (
    SELECT c.u, c.v, c.cn,
           CAST(du.deg AS BIGINT) AS u_deg, CAST(dv.deg AS BIGINT) AS v_deg,
           du.deg + dv.deg - c.cn AS un,
           (SELECT count(*) FROM vertices) - (du.deg + dv.deg - c.cn) AS d,
           COALESCE(p.p3, 0) AS p3
    FROM cand c
    JOIN sdeg du ON du.id = c.u
    JOIN sdeg dv ON dv.id = c.v
    LEFT JOIN paths p ON p.u = c.u AND p.v = c.v
)
SELECT t.u, t.v, t.cn,
       ROUND(CAST(t.cn AS DOUBLE) / sqrt(t.u_deg * t.v_deg), 6) AS nd,
       ROUND(CASE WHEN (t.cn + t.un) * (t.un + t.d) = 0 THEN 0.0
                  ELSE (t.cn * t.d - t.un * t.un)
                       / ((t.cn + t.un) * (t.un + t.d)) END, 6) AS ari,
       t.u_deg, t.v_deg,
       CAST(t.cn + t.p3 AS BIGINT) AS nm,
       CAST(CASE WHEN lu.label = lv.label THEN 1 ELSE 0 END AS INTEGER) AS sc
FROM terms t
JOIN cc{cc_iters} lu ON lu.id = t.u
JOIN cc{cc_iters} lv ON lv.id = t.v
ORDER BY t.u, t.v"""
        ]
    )
    return _with_graph(body)


# ---- sparsification edge scores (sparsification/*.cpp) ---------------------

def sql_sparsify_scores(seed: int = 42, max_rank: int = 10) -> str:
    """Mirror of operators/sparsification.py: per canonical simple edge the
    six backbone scores (random / SCAN / chance-corrected-triangle /
    local-degree / local-similarity / Simmelian overlap), all on
    simple-support degrees."""
    from networkit_spark.functions.hashing import md5_long_sql

    rand = md5_long_sql(
        f"('{seed}:re:' || CAST(b.u AS STRING) || ':' || CAST(b.v AS STRING))"
    )
    body = f""", {TRI_CTE.strip()},
tri_edges AS (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
),
tscore AS (
    SELECT c.u, c.v, CAST(COALESCE(t.cnt, 0) AS BIGINT) AS tri
    FROM simple c
    LEFT JOIN (SELECT u, v, count(*) AS cnt FROM tri_edges GROUP BY u, v) t
           ON t.u = c.u AND t.v = c.v
),
sdeg AS (SELECT a AS id, count(*) AS deg FROM und GROUP BY a),
base AS MATERIALIZED (
    SELECT ts.u, ts.v, ts.tri, du.deg AS ud, dv.deg AS vd
    FROM tscore ts JOIN sdeg du ON du.id = ts.u JOIN sdeg dv ON dv.id = ts.v
),
nn AS (SELECT count(*) AS n FROM vertices),
ldd AS (
    SELECT d.a AS node, d.b AS nbr, dn.deg AS ndeg, dj.deg AS nbrdeg
    FROM und d JOIN sdeg dn ON dn.id = d.a JOIN sdeg dj ON dj.id = d.b
),
ld AS (
    SELECT least(node, nbr) AS u, greatest(node, nbr) AS v,
           MAX(CASE WHEN ndeg <= 1 THEN 1.0
                    ELSE 1.0 - ln(CAST(rnk AS DOUBLE)) / ln(CAST(ndeg AS DOUBLE)) END) AS e
    FROM (
        SELECT node, nbr, ndeg,
               rank() OVER (PARTITION BY node ORDER BY nbrdeg DESC) AS rnk
        FROM ldd
    ) GROUP BY 1, 2
),
lsd AS (
    SELECT u AS node, v AS nbr, ud AS ndeg,
           CAST(tri AS DOUBLE) / (ud + vd - tri) AS sim FROM base
    UNION ALL
    SELECT v, u, vd, CAST(tri AS DOUBLE) / (ud + vd - tri) FROM base
),
ls AS (
    SELECT least(node, nbr) AS u, greatest(node, nbr) AS v,
           MAX(CASE WHEN ndeg <= 1 THEN 1.0
                    ELSE 1.0 - ln(CAST(rn AS DOUBLE)) / ln(CAST(ndeg AS DOUBLE)) END) AS e
    FROM (
        SELECT node, nbr, ndeg,
               row_number() OVER (PARTITION BY node ORDER BY sim DESC, nbr ASC) AS rn
        FROM lsd
    ) GROUP BY 1, 2
),
std AS (
    SELECT u AS node, v AS nbr, tri FROM base
    UNION ALL SELECT v, u, tri FROM base
),
stop AS MATERIALIZED (
    SELECT node, nbr FROM (
        SELECT node, nbr, rank() OVER (PARTITION BY node ORDER BY tri DESC) - 1 AS rnk
        FROM std
    ) WHERE rnk <= {max_rank}
),
sov AS (
    SELECT b.u, b.v, count(*) AS ov
    FROM base b
    JOIN stop t1 ON t1.node = b.u
    JOIN stop t2 ON t2.node = b.v AND t2.nbr = t1.nbr
    GROUP BY b.u, b.v
)
SELECT b.u AS src, b.v AS dst,
       ROUND({rand} / 281474976710656.0, 9) AS rand_score,
       ROUND((b.tri + 1.0) / sqrt((b.ud + 1.0) * (b.vd + 1.0)), 6) AS scan_score,
       ROUND(CASE WHEN b.tri > 0
                  THEN b.tri * (nn.n - 2.0) / ((b.ud - 1.0) * (b.vd - 1.0))
                  WHEN b.ud = 1 OR b.vd = 1 THEN 1.0
                  ELSE 0.0 END, 6) AS chance_score,
       ROUND(ld.e, 6) AS local_degree,
       ROUND(ls.e, 6) AS local_sim,
       CAST(COALESCE(so.ov, 0) AS DOUBLE) AS simmelian
FROM base b
CROSS JOIN nn
JOIN ld ON ld.u = b.u AND ld.v = b.v
JOIN ls ON ls.u = b.u AND ls.v = b.v
LEFT JOIN sov so ON so.u = b.u AND so.v = b.v
ORDER BY b.u, b.v"""
    return _with_graph(body.lstrip(", \n"))


# ---- assortativity (correlation/Assortativity.cpp) -------------------------

def sql_assortativity() -> str:
    """One row: degree assortativity (ordinal Pearson over the symmetric
    simple edge set — all moments are exact integers, so the ratio is
    deterministic across engines) + nominal assortativity of the vertex-TYPE
    partition (user vs event-type entities — the graph's real nominal
    attribute) in the exact integer form (diag·m − Σ ra·rb)/(m² − Σ ra·rb)."""
    body = f"""vtype AS (
    SELECT id, CASE WHEN key LIKE 'user:%' THEN 0 ELSE 1 END AS label FROM dict
),
usim AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
adeg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS x FROM usim GROUP BY src),
pairsx AS (
    SELECT du.x AS xs, dv.x AS xd
    FROM usim u JOIN adeg du ON du.id = u.src JOIN adeg dv ON dv.id = u.dst
),
ost AS (
    SELECT CAST(count(*) AS DOUBLE) AS m, SUM(xs) AS sx,
           SUM(xs * xd) AS sxy, SUM(xs * xs) AS sxx
    FROM pairsx
),
lab AS (
    SELECT lu.label AS ls, lv.label AS ld
    FROM usim u
    JOIN vtype lu ON lu.id = u.src
    JOIN vtype lv ON lv.id = u.dst
),
cells AS MATERIALIZED (SELECT ls, ld, count(*) AS c FROM lab GROUP BY ls, ld),
nm AS (SELECT SUM(c) AS m FROM cells),
ndiag AS (SELECT COALESCE(SUM(c), 0) AS d FROM cells WHERE ls = ld),
rr AS (
    SELECT SUM(a.ra * b.rb) AS s
    FROM (SELECT ls, SUM(c) AS ra FROM cells GROUP BY ls) a
    JOIN (SELECT ld, SUM(c) AS rb FROM cells GROUP BY ld) b ON b.ld = a.ls
)
SELECT ROUND((ost.sxy - ost.sx * ost.sx / ost.m)
             / (ost.sxx - ost.sx * ost.sx / ost.m), 6) AS degree_assort,
       ROUND(CAST(ndiag.d * nm.m - rr.s AS DOUBLE)
             / CAST(nm.m * nm.m - rr.s AS DOUBLE), 6) AS nominal_assort
FROM ost, nm, ndiag, rr"""
    return _with_graph(body)


# ---- local-max matching (matching/LocalMaxMatcher.cpp) ---------------------

def sql_matching(rounds: int = 16) -> str:
    """Unrolled local-max matching rounds under the deterministic
    (w, u, v)-max total order; converged rounds are no-ops, so ``rounds``
    only needs to exceed the actual round count at this scale."""
    ctes = [
        """rem0 AS MATERIALIZED (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v, MAX(weight) AS w
    FROM edges WHERE src <> dst GROUP BY 1, 2
)"""
    ]
    agrees = []
    for r in range(rounds):
        ctes.append(
            f"""d{r} AS (
    SELECT u AS node, u, v, w FROM rem{r}
    UNION ALL SELECT v, u, v, w FROM rem{r}
),
best{r} AS (
    SELECT node, u, v FROM (
        SELECT node, u, v,
               row_number() OVER (PARTITION BY node ORDER BY w DESC, u DESC, v DESC) AS rn
        FROM d{r}
    ) WHERE rn = 1
),
agree{r} AS MATERIALIZED (
    SELECT r.u, r.v, r.w FROM rem{r} r
    JOIN best{r} b1 ON b1.node = r.u AND b1.u = r.u AND b1.v = r.v
    JOIN best{r} b2 ON b2.node = r.v AND b2.u = r.u AND b2.v = r.v
),
mv{r} AS (SELECT u AS id FROM agree{r} UNION SELECT v FROM agree{r}),
rem{r + 1} AS MATERIALIZED (
    SELECT * FROM rem{r}
    WHERE u NOT IN (SELECT id FROM mv{r}) AND v NOT IN (SELECT id FROM mv{r})
)"""
        )
        agrees.append(f"SELECT u, v, w FROM agree{r}")
    body = ", ".join(ctes) + f"""
SELECT u, v, CAST(w AS DOUBLE) AS weight FROM ({' UNION ALL '.join(agrees)})
ORDER BY u"""
    return _with_graph(body)


def _linkpred_split_ctes(test_per_mille: int, cap: int, seed: int) -> str:
    """Shared CTE chain for the link-prediction harness: hash-bucket
    holdout split, capped-hinge distance-2 candidates with
    common-neighbor scores (operators/linkpred_eval.py)."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(
        f"('{seed}:lps:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
    )
    return f"""canon AS MATERIALIZED (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges WHERE src <> dst GROUP BY 1, 2
),
marked AS (SELECT u, v, {h} % 1000 AS bkt FROM canon),
train AS MATERIALIZED (SELECT u, v FROM marked WHERE bkt >= {test_per_mille}),
test AS MATERIALIZED (SELECT u, v FROM marked WHERE bkt < {test_per_mille}),
tsym AS MATERIALIZED (
    SELECT u AS a, v AS b FROM train UNION ALL SELECT v, u FROM train
),
tdeg AS (SELECT a, count(*) AS d FROM tsym GROUP BY a),
hinge AS (
    SELECT t.a, t.b FROM tsym t JOIN tdeg d ON d.a = t.a WHERE d.d <= {cap}
),
cand0 AS (
    SELECT h1.b AS u, h2.b AS v, CAST(count(*) AS BIGINT) AS score
    FROM hinge h1 JOIN hinge h2 ON h1.a = h2.a AND h1.b < h2.b
    GROUP BY 1, 2
),
cand AS MATERIALIZED (
    SELECT c.u, c.v, c.score FROM cand0 c
    WHERE NOT EXISTS (SELECT 1 FROM train t WHERE t.u = c.u AND t.v = c.v)
)"""


def sql_linkpred_eval(
    test_per_mille: int, cap: int, k: int, seed: int = 42
) -> str:
    """One-row ROC-AUC summary: the exact Mann-Whitney AUC over the full
    distinct-score curve (integer numerator/denominator — see
    operators/linkpred_eval.py for the trapezoid-equivalence note) plus
    precision@k under the (score DESC, u, v) tie-break."""
    return _with_graph(f"""{_linkpred_split_ctes(test_per_mille, cap, seed)},
preds AS MATERIALIZED (
    SELECT c.u, c.v, c.score,
           CASE WHEN t.u IS NOT NULL THEN 1 ELSE 0 END AS pos
    FROM cand c LEFT JOIN test t ON t.u = c.u AND t.v = c.v
),
stab AS (
    SELECT score, SUM(pos) AS pos_c, SUM(1 - pos) AS neg_c
    FROM preds GROUP BY score
),
cums AS (
    SELECT score, pos_c, neg_c,
           SUM(neg_c) OVER (ORDER BY score) AS cum_neg
    FROM stab
),
aggr AS (
    SELECT SUM(pos_c) AS p, SUM(neg_c) AS n,
           SUM(pos_c * (2 * (cum_neg - neg_c) + neg_c)) AS num
    FROM cums
),
tk AS (
    SELECT COALESCE(SUM(pos), 0) AS tp
    FROM (SELECT pos FROM preds ORDER BY score DESC, u, v LIMIT {k})
),
counts AS (
    SELECT (SELECT count(*) FROM train) AS n_train,
           (SELECT count(*) FROM test) AS n_test,
           (SELECT count(*) FROM preds) AS n_cand
)
SELECT CAST(n_train AS BIGINT) AS n_train,
       CAST(n_test AS BIGINT) AS n_test,
       CAST(n_cand AS BIGINT) AS n_candidates,
       CAST(p AS BIGINT) AS n_positives,
       CAST(num AS BIGINT) AS auc_num,
       CAST(2 * p * n AS BIGINT) AS auc_den,
       CASE WHEN p * n > 0
            THEN CAST(num AS DOUBLE) / CAST(2 * p * n AS DOUBLE) END AS auc,
       CAST(tp AS BIGINT) AS tp_at_k,
       CASE WHEN n_cand > 0
            THEN CAST(tp AS DOUBLE) / CAST(LEAST({k}, n_cand) AS DOUBLE)
       END AS precision_at_k
FROM counts, aggr, tk""")


def sql_linkpred_katz(
    test_per_mille: int, cap: int, beta: float, seed: int = 42
) -> str:
    """KatzIndex (maxPathLength=3) damped walk counts on the distance-2
    candidates; walks1 = 0 for non-adjacent pairs, so
    score = beta^2*walks2 + beta^3*walks3.  The score is rounded to 6dp on
    both sides (walks2/walks3 stay exact integers): the engines fold the
    double chain in different orders, so raw doubles hash-mismatch below
    1e-9 even though the algorithm agrees."""
    return _with_graph(f"""{_linkpred_split_ctes(test_per_mille, cap, seed)},
w2 AS (
    SELECT c.u, c.v, CAST(count(*) AS BIGINT) AS walks2
    FROM cand c
    JOIN tsym e1 ON e1.a = c.u
    JOIN tsym e2 ON e2.a = c.v AND e2.b = e1.b
    GROUP BY c.u, c.v
),
w3 AS (
    SELECT c.u, c.v, CAST(count(*) AS BIGINT) AS walks3
    FROM cand c
    JOIN tsym e1 ON e1.a = c.u
    JOIN tsym e2 ON e2.a = e1.b
    JOIN tsym e3 ON e3.a = e2.b AND e3.b = c.v
    GROUP BY c.u, c.v
)
SELECT c.u, c.v,
       COALESCE(w2.walks2, 0) AS walks2,
       COALESCE(w3.walks3, 0) AS walks3,
       round({beta} * {beta} * CAST(COALESCE(w2.walks2, 0) AS DOUBLE)
             + {beta} * {beta} * {beta} * CAST(COALESCE(w3.walks3, 0) AS DOUBLE),
             6) AS score
FROM cand c
LEFT JOIN w2 ON w2.u = c.u AND w2.v = c.v
LEFT JOIN w3 ON w3.u = c.u AND w3.v = c.v
ORDER BY c.u, c.v""")


def _triangle_score_cte() -> str:
    """Canonical per-edge triangle counts as a double attribute (the input
    table for the edge-score combinator oracles)."""
    return f"""{TRI_CTE.strip()},
tri_edges AS (
    SELECT least(a, b) AS u, greatest(a, b) AS v FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c) FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c) FROM tri
),
tsc AS MATERIALIZED (
    SELECT c.u, c.v, CAST(COALESCE(t.cnt, 0) AS DOUBLE) AS score
    FROM simple c
    LEFT JOIN (SELECT u, v, count(*) AS cnt FROM tri_edges GROUP BY u, v) t
           ON t.u = c.u AND t.v = c.v
)"""


def sql_edge_score_utils() -> str:
    """Geometric-mean / min-max-normalized / multiscale-backbone scores
    over the triangle edge scores (operators/edgescores.py)."""
    return _with_graph(f"""{_triangle_score_cte()},
ns AS (
    SELECT id, SUM(score) AS nsum, count(*) AS ndeg FROM (
        SELECT u AS id, score FROM tsc UNION ALL SELECT v, score FROM tsc
    ) GROUP BY id
),
mm AS (SELECT MIN(score) AS lo, MAX(score) AS hi FROM tsc)
SELECT t.u, t.v, CAST(t.score AS BIGINT) AS raw,
       ROUND(CASE WHEN t.score > 0
                  THEN t.score / sqrt(nu.nsum * nv.nsum) ELSE 0.0 END, 6)
           AS gm_score,
       ROUND(CASE WHEN mm.hi > mm.lo
                  THEN (t.score - mm.lo) / (mm.hi - mm.lo) ELSE 0.0 END, 6)
           AS norm_score,
       ROUND(GREATEST(
           CASE WHEN nu.nsum > 0
                THEN 1.0 - POW(1.0 - t.score / nu.nsum, CAST(nu.ndeg AS DOUBLE) - 1.0)
                ELSE 0.0 END,
           CASE WHEN nv.nsum > 0
                THEN 1.0 - POW(1.0 - t.score / nv.nsum, CAST(nv.ndeg AS DOUBLE) - 1.0)
                ELSE 0.0 END), 6) AS ms_score
FROM tsc t
JOIN ns nu ON nu.id = t.u
JOIN ns nv ON nv.id = t.v
CROSS JOIN mm
ORDER BY t.u, t.v""")


def sql_quadrangles() -> str:
    """ChibaNishizekiQuadrangleEdgeScore: per canonical edge, 4-cycles
    through it — the same 3-chain join + closure the Spark operator runs."""
    return _with_graph("""
e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
p AS (
    SELECT l.dst AS u, l.src AS y, m.dst AS x, r.dst AS v
    FROM e l
    JOIN e m ON m.src = l.src
    JOIN e r ON r.src = m.dst
    WHERE l.dst <> m.dst AND l.src <> r.dst AND l.dst <> r.dst
),
closed AS (
    SELECT p.u, p.v FROM p JOIN e c ON c.src = p.u AND c.dst = p.v
    WHERE p.u < p.v
)
SELECT u, v, CAST(count(*) AS BIGINT) AS quadrangles
FROM closed GROUP BY u, v ORDER BY u, v""")


def sql_prefix_jaccard() -> str:
    """PrefixJaccardScore.cpp:20-120 over the triangle edge scores: per
    node, neighbors ranked by attribute DESC with rank = #strictly-greater
    (SQL rank()-1); per edge, max over rank prefixes of
    |A_r intersect B_r| / |A_r union B_r| with the endpoints excluded."""
    return _with_graph(f"""{_triangle_score_cte()},
dview AS (
    SELECT u AS node, v AS nbr, score AS a FROM tsc
    UNION ALL SELECT v, u, score FROM tsc
),
rankedn AS (
    SELECT node, nbr, rank() OVER (PARTITION BY node ORDER BY a DESC) - 1 AS rk
    FROM dview
),
aside AS (
    SELECT e.u, e.v, r.nbr, r.rk AS ru FROM tsc e
    JOIN rankedn r ON r.node = e.u AND r.nbr <> e.v
),
bside AS (
    SELECT e.u, e.v, r.nbr, r.rk AS rv FROM tsc e
    JOIN rankedn r ON r.node = e.v AND r.nbr <> e.u
),
cmn AS (
    SELECT a.u, a.v, GREATEST(a.ru, b.rv) AS rc
    FROM aside a JOIN bside b ON b.u = a.u AND b.v = a.v AND b.nbr = a.nbr
),
ga AS (SELECT u, v, ru AS r, count(*) AS na FROM aside GROUP BY 1, 2, 3),
gb AS (SELECT u, v, rv AS r, count(*) AS nb FROM bside GROUP BY 1, 2, 3),
gc AS (SELECT u, v, rc AS r, count(*) AS nc FROM cmn GROUP BY 1, 2, 3),
allr AS (
    SELECT COALESCE(ga.u, gb.u, gc.u) AS u,
           COALESCE(ga.v, gb.v, gc.v) AS v,
           COALESCE(ga.r, gb.r, gc.r) AS r,
           COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb, COALESCE(nc, 0) AS nc
    FROM ga
    FULL OUTER JOIN gb ON gb.u = ga.u AND gb.v = ga.v AND gb.r = ga.r
    FULL OUTER JOIN gc ON gc.u = COALESCE(ga.u, gb.u)
                      AND gc.v = COALESCE(ga.v, gb.v)
                      AND gc.r = COALESCE(ga.r, gb.r)
),
jac AS (
    SELECT u, v,
           SUM(nc) OVER w / CAST(SUM(na) OVER w + SUM(nb) OVER w - SUM(nc) OVER w AS DOUBLE) AS j
    FROM allr
    WINDOW w AS (PARTITION BY u, v ORDER BY r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
best AS (SELECT u, v, MAX(j) AS pj FROM jac GROUP BY u, v)
SELECT e.u, e.v, ROUND(COALESCE(b.pj, 0.0), 6) AS pj_score
FROM tsc e LEFT JOIN best b ON b.u = e.u AND b.v = e.v
ORDER BY e.u, e.v""")


def sql_score_linearize(seed: int = 42) -> str:
    """EdgeScoreLinearizer over the triangle edge scores: rank/(m-1) under
    (score, md5(seed:lin:u:v) tiebreak, u, v) ascending, and the same with
    score/tiebreak descending for the inverse ordering — the exact total
    order the Spark operator feeds to global_cumsum."""
    from networkit_spark.functions.hashing import md5_long_sql

    tb = md5_long_sql(
        f"('{seed}:lin:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
    )
    return _with_graph(f"""{_triangle_score_cte()},
tbx AS (SELECT u, v, score, {tb} AS tb FROM tsc),
mm AS (SELECT count(*) AS m FROM tbx),
rk AS (
    SELECT u, v, score,
           row_number() OVER (ORDER BY score, tb, u, v) - 1 AS rf,
           row_number() OVER (ORDER BY score DESC, tb DESC, u, v) - 1 AS ri
    FROM tbx
)
SELECT rk.u, rk.v, CAST(rk.score AS BIGINT) AS raw,
       ROUND(CAST(rf AS DOUBLE) / (mm.m - 1), 6) AS lin_score,
       ROUND(CAST(ri AS DOUBLE) / (mm.m - 1), 6) AS lin_inv
FROM rk CROSS JOIN mm
ORDER BY rk.u, rk.v""")


def sql_biconnected_summary() -> str:
    """Per-node block count from first principles (no Tarjan-Vishkin, no
    DFS): the biconnected blocks containing v biject with the connected
    components of G - v that contain a neighbor of v, so a recursive
    closure seeded at v's neighbors and forbidden from entering v counts
    them directly (min reachable vertex = component label)."""
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
cedges AS MATERIALIZED (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v
    FROM edges WHERE src <> dst GROUP BY 1, 2
),
csym AS MATERIALIZED (
    SELECT u AS a, v AS b FROM cedges UNION ALL SELECT v, u FROM cedges
),
reach(ex, s, x) AS (
    SELECT a, b, b FROM csym
    UNION
    SELECT r.ex, r.s, e.b FROM reach r
    JOIN csym e ON e.a = r.x AND e.b <> r.ex
),
ncomp AS (
    SELECT ex, s, MIN(x) AS lbl FROM reach GROUP BY ex, s
),
summary AS (
    SELECT ex AS id, COUNT(DISTINCT lbl) AS n FROM ncomp GROUP BY ex
)
SELECT v.id, CAST(COALESCE(s.n, 0) AS BIGINT) AS n_comps,
       COALESCE(s.n, 0) > 1 AS is_articulation
FROM vertices v LEFT JOIN summary s ON s.id = v.id
ORDER BY v.id"""


def sql_suitor_matching(rounds: int = 16) -> str:
    """Unrolled locally-dominant rounds under the SUITOR strict edge order
    (w DESC, u ASC, v ASC) — the greedy matching the reference's
    SuitorMatcher computes (see operators/matching.py suitor_matching)."""
    ctes = [
        """rem0 AS MATERIALIZED (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v, MAX(weight) AS w
    FROM edges WHERE src <> dst GROUP BY 1, 2
)"""
    ]
    agrees = []
    for r in range(rounds):
        ctes.append(
            f"""d{r} AS (
    SELECT u AS node, u, v, w FROM rem{r}
    UNION ALL SELECT v, u, v, w FROM rem{r}
),
best{r} AS (
    SELECT node, u, v FROM (
        SELECT node, u, v,
               row_number() OVER (PARTITION BY node ORDER BY w DESC, u ASC, v ASC) AS rn
        FROM d{r}
    ) WHERE rn = 1
),
agree{r} AS MATERIALIZED (
    SELECT r.u, r.v, r.w FROM rem{r} r
    JOIN best{r} b1 ON b1.node = r.u AND b1.u = r.u AND b1.v = r.v
    JOIN best{r} b2 ON b2.node = r.v AND b2.u = r.u AND b2.v = r.v
),
mv{r} AS (SELECT u AS id FROM agree{r} UNION SELECT v FROM agree{r}),
rem{r + 1} AS MATERIALIZED (
    SELECT * FROM rem{r}
    WHERE u NOT IN (SELECT id FROM mv{r}) AND v NOT IN (SELECT id FROM mv{r})
)"""
        )
        agrees.append(f"SELECT u, v, w FROM agree{r}")
    body = ", ".join(ctes) + f"""
SELECT u, v, CAST(w AS DOUBLE) AS weight FROM ({' UNION ALL '.join(agrees)})
ORDER BY u"""
    return _with_graph(body)


# ---- effective diameter (distance/EffectiveDiameter.cpp) -------------------

def sql_effective_diameter(iters: int, ratio: float = 0.9) -> str:
    body = ", ".join(_apsp_ctes(iters)) + f""",
hist AS (SELECT dist, count(*) AS c FROM ap{iters} WHERE dist > 0 GROUP BY dist),
tot AS (SELECT SUM(c) AS t FROM hist),
cum AS (SELECT dist, SUM(c) OVER (ORDER BY dist) AS cc FROM hist)
SELECT CAST(MIN(dist) AS BIGINT) AS eff_diameter
FROM cum, tot WHERE cc >= {ratio} * t"""
    return _with_graph(body)


# ---- embedding near-dup pairs + IVF ANN ------------------------------------

def _lsh_bucket_tables_sql(nbits: int, n_tables: int, seed: int, dim: int) -> str:
    from networkit_spark.functions.similarity import hyperplanes

    planes = hyperplanes(dim, nbits, n_tables, seed)
    tables = []
    for t, tbl in enumerate(planes):
        bits = []
        for i, plane in enumerate(tbl):
            lits = "[" + ", ".join(repr(x) for x in plane) + "]"
            dot = (
                f"list_reduce(list_transform(list_zip(e, {lits}),"
                " p -> p[1] * p[2]), (a, b) -> a + b)"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** i} ELSE 0 END)")
        tables.append(
            f"SELECT vec_id, CAST({t} AS INT) AS tbl,"
            f" CAST({' + '.join(bits)} AS BIGINT) AS bucket FROM norms"
        )
    return " UNION ALL ".join(tables)


_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]),"
    " (x, y) -> x + y)"
)


def sql_embed_near_dup(
    threshold: float = 0.9,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int = 64,
) -> str:
    """Mirror of similarity.embed_near_dup_pairs: sign-LSH candidate union,
    exact cosine filter at the threshold."""
    dot = _DOT.format(a="qa.e", b="qb.e")
    return f"""WITH {EMB_CTE},
withb AS MATERIALIZED ({_lsh_bucket_tables_sql(nbits, n_tables, seed, dim)}),
cand AS (
    SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
    FROM withb l JOIN withb r ON r.tbl = l.tbl AND r.bucket = l.bucket
    WHERE l.vec_id < r.vec_id
),
sims AS (
    SELECT cd.a, cd.b,
           ROUND({dot} / (qa.nrm * qb.nrm), 6) AS sim
    FROM cand cd
    JOIN norms qa ON qa.vec_id = cd.a
    JOIN norms qb ON qb.vec_id = cd.b
)
SELECT a, b, sim FROM sims WHERE sim >= {threshold} ORDER BY a, b"""


def sql_ivf_ann(
    n_queries: int = 5, k: int = 3, n_cells: int = 8, nprobe: int = 2
) -> str:
    """Mirror of similarity.ivf_ann_topk: sampled-vector centroids (first
    n_cells vectors by id rank), nearest-cell inverted lists, nprobe
    probing, exact cosine re-rank within the probed cells."""
    adot = _DOT.format(a="n.e", b="c.cv")
    rdot = _DOT.format(a="q.e", b="c.e")
    return f"""WITH {EMB_CTE},
cells AS MATERIALIZED (
    SELECT vec_id AS cell, e AS cv, nrm AS cnrm FROM norms
    ORDER BY vec_id LIMIT {n_cells}
),
asim AS MATERIALIZED (
    SELECT n.vec_id, c.cell,
           ROUND({adot} / (n.nrm * c.cnrm), 6) AS csim
    FROM norms n CROSS JOIN cells c
),
lists AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
        FROM asim
    ) WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
        FROM asim WHERE vec_id < {n_queries}
    ) WHERE rn <= {nprobe}
),
cand AS (
    SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
    FROM probes p JOIN lists l ON l.cell = p.cell
    WHERE l.vec_id <> p.query_id
),
sims AS (
    SELECT cd.query_id, cd.neighbor_id,
           ROUND({rdot} / (q.nrm * c.nrm), 6) AS sim
    FROM cand cd
    JOIN norms q ON q.vec_id = cd.query_id
    JOIN norms c ON c.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, sim FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rn FROM sims
) WHERE rn <= {k}"""


def sql_top_closeness(iters: int, k: int = 10) -> str:
    """Top-k standard-closeness vertices, ties by id asc
    (centrality/TopCloseness.cpp ranking contract). sum_d is an exact
    integer so 1/sum_d is the identical IEEE double in both engines."""
    body = ", ".join(_apsp_ctes(iters)) + f""",
csc AS (SELECT s AS id, SUM(dist) AS sum_d FROM ap{iters} GROUP BY s),
sc AS (
    SELECT ver.id,
           CASE WHEN c.sum_d > 0 THEN 1.0 / c.sum_d ELSE 0.0 END AS score
    FROM vertices ver LEFT JOIN csc c ON c.id = ver.id
)
SELECT id, ROUND(score, 6) AS score FROM sc
ORDER BY score DESC, id ASC LIMIT {k}"""
    return _with_graph(body)


# ---- maximal independent set (independentset/Luby.cpp) ---------------------

def sql_mis(rounds: int = 24, seed: int = 42) -> str:
    """Unrolled hash-priority Luby rounds, mirroring operators/mis.py:
    per round a vertex enters on a strict priority minimum over its active
    closed neighborhood; it and its neighbors deactivate."""
    from networkit_spark.functions.hashing import md5_long_sql

    ctes = [
        "ae0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "av0 AS (SELECT id FROM vertices)",
    ]
    winners = []
    for r in range(1, rounds + 1):
        h = md5_long_sql(f"('{seed}:mis:{r}:' || CAST(id AS STRING))")
        ctes.append(
            f"""pri{r} AS (SELECT id, {h} AS p FROM av{r - 1}),
nm{r} AS (
    SELECT e.dst AS id, MIN(p.p) AS m
    FROM ae{r - 1} e JOIN pri{r} p ON p.id = e.src
    GROUP BY e.dst
),
win{r} AS MATERIALIZED (
    SELECT pr.id FROM pri{r} pr
    LEFT JOIN nm{r} n ON n.id = pr.id
    WHERE n.m IS NULL OR pr.p < n.m
),
gone{r} AS (
    SELECT id FROM win{r}
    UNION
    SELECT e.dst FROM ae{r - 1} e JOIN win{r} w ON w.id = e.src
),
av{r} AS MATERIALIZED (
    SELECT id FROM av{r - 1} WHERE id NOT IN (SELECT id FROM gone{r})
),
ae{r} AS MATERIALIZED (
    SELECT src, dst FROM ae{r - 1}
    WHERE src NOT IN (SELECT id FROM gone{r})
      AND dst NOT IN (SELECT id FROM gone{r})
)"""
        )
        winners.append(f"SELECT id FROM win{r}")
    body = ", ".join(ctes) + f""",
chosen AS ({' UNION ALL '.join(winners)})
SELECT v.id, CAST(CASE WHEN c.id IS NULL THEN 0 ELSE 1 END AS INT) AS in_set
FROM vertices v LEFT JOIN chosen c ON c.id = v.id
ORDER BY v.id"""
    return _with_graph(body)


# ---- ANF sketches (distance/NeighborhoodFunctionApproximation.cpp,
#      EffectiveDiameterApproximation.cpp, HopPlotApproximation.cpp) --------

def _anf_ctes(k: int, r: int, seed: int, max_h: int) -> tuple[list[str], str, str]:
    """Shared CTE chain: init masks, global max, max_h OR-supersteps.
    Returns (ctes, b_sum_expr, finished_expr) — mirrors operators/anf.py."""
    from networkit_spark.functions.hashing import (
        fm_init_mask_sql,
        lowest_unset_bit_pos_sql,
        md5_long_sql,
    )

    mcols = [f"m{j}" for j in range(k)]
    width = f"(SELECT CAST(CEIL(LOG2(GREATEST(count(*), 2))) AS INT) + {r} FROM vertices)"
    init_cols = ", ".join(
        fm_init_mask_sql(
            md5_long_sql(f"('{seed}:anf:{j}:' || CAST(id AS STRING))"), width
        )
        + f" AS {c}"
        for j, c in enumerate(mcols)
    )
    ctes = [
        "ae AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        f"mk0 AS MATERIALIZED (SELECT id, {init_cols} FROM vertices)",
        "hc AS ("
        + "SELECT "
        + ", ".join(f"bit_or({c}) AS h_{c}" for c in mcols)
        + " FROM mk0)",
    ]
    for h in range(1, max_h + 1):
        upd = ", ".join(
            f"p.{c} | COALESCE(nb.n_{c}, CAST(0 AS BIGINT)) AS {c}" for c in mcols
        )
        aggs = ", ".join(f"bit_or(p.{c}) AS n_{c}" for c in mcols)
        ctes.append(
            f"""mk{h} AS MATERIALIZED (
    SELECT p.id, {upd}
    FROM mk{h - 1} p LEFT JOIN (
        SELECT e.dst AS id, {aggs}
        FROM ae e JOIN mk{h - 1} p ON p.id = e.src GROUP BY e.dst
    ) nb ON nb.id = p.id
)"""
        )
    b_sum = "(" + " + ".join(lowest_unset_bit_pos_sql(c) for c in mcols) + ")"
    fin = "(" + " AND ".join(f"({c} = hc.h_{c})" for c in mcols) + ")"
    return ctes, b_sum, fin


def sql_neighborhood_function(
    k: int = 4, r: int = 7, seed: int = 42, max_h: int = 8
) -> str:
    from networkit_spark.operators.anf import FM_CORRECTION

    ctes, b_sum, _ = _anf_ctes(k, r, seed, max_h)
    est = f"POWER(2, CAST({b_sum} AS DOUBLE) / {k}) / {FM_CORRECTION}"
    rounds = " UNION ALL ".join(
        f"SELECT CAST({h} AS INT) AS h, {est} AS est FROM mk{h}"
        for h in range(1, max_h + 1)
    )
    body = ", ".join(ctes) + f""",
ests AS ({rounds}),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices)
SELECT h, ROUND(SUM(est), 4) AS nf,
       ROUND(LEAST(1.0, SUM(est) / (SELECT n * n FROM nv)), 6) AS hop_plot
FROM ests GROUP BY h ORDER BY h"""
    return _with_graph(body)


def sql_effective_diameter_fm(
    ratio: float = 0.9, k: int = 4, r: int = 7, seed: int = 42, max_h: int = 8
) -> str:
    from networkit_spark.operators.anf import FM_CORRECTION

    ctes, b_sum, fin = _anf_ctes(k, r, seed, max_h)
    s_cut = (
        f"(SELECT CAST(CEIL({k} * LOG2(CEIL({ratio} * count(*)) * {FM_CORRECTION})"
        f" - 1e-12) AS INT) FROM vertices)"
    )
    rounds = " UNION ALL ".join(
        f"SELECT id, CAST({h} AS INT) AS h, {b_sum} AS b_sum, {fin} AS finished"
        f" FROM mk{h}, hc"
        for h in range(1, max_h + 1)
    )
    body = ", ".join(ctes) + f""",
ests AS ({rounds}),
done AS (
    SELECT id, MIN(h) AS done_h FROM ests
    WHERE finished OR b_sum >= {s_cut}
    GROUP BY id
)
SELECT ROUND(SUM(COALESCE(d.done_h, {max_h})) * 1.0 / count(*), 6) AS eff_diameter
FROM vertices v LEFT JOIN done d ON d.id = v.id"""
    return _with_graph(body)


# ---- PageRankNibble (scd/ApproximatePageRank.cpp, PageRankNibble.cpp) -----

def sql_pagerank_nibble(
    seed: int = 0, alpha: float = 0.15, rounds: int = 8
) -> str:
    """Batched-push APR (eps=0, pinned rounds) + conductance sweep,
    mirroring operators/scd.py round for round."""
    a, om = alpha, 1.0 - alpha
    ctes = [
        DEG_CTE.strip().rstrip(),
        "w1 AS (SELECT src AS id, SUM(weight) AS wdeg1 FROM edges GROUP BY src)",
        "tvv AS (SELECT SUM(weight) + COALESCE(SUM(CASE WHEN src = dst THEN weight END), 0) AS tv FROM edges)",
        f"s0 AS (SELECT CAST({seed} AS BIGINT) AS id, 0.0 AS p, 1.0 AS res)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""g{r} AS (
    SELECT e.dst AS id, SUM({om} * s.res * e.weight / (2 * d.wdeg)) AS gain
    FROM s{r - 1} s
    JOIN degrees d ON d.id = s.id AND d.wdeg > 0
    JOIN edges e ON e.src = s.id
    WHERE s.res > 0
    GROUP BY e.dst
),
s{r} AS MATERIALIZED (
    SELECT COALESCE(x.id, g.id) AS id,
           COALESCE(x.p, 0)
             + CASE WHEN x.res > 0 AND COALESCE(d.wdeg, 0) > 0
                    THEN {a} * x.res ELSE 0 END AS p,
           CASE WHEN x.res > 0 AND COALESCE(d.wdeg, 0) > 0
                THEN {om} * x.res / 2 ELSE COALESCE(x.res, 0) END
             + COALESCE(g.gain, 0) AS res
    FROM g{r} g FULL JOIN s{r - 1} x ON x.id = g.id
    LEFT JOIN degrees d ON d.id = COALESCE(x.id, g.id)
)"""
        )
    body = ", ".join(ctes) + f""",
sup AS (
    SELECT s.id, ROUND(s.p / NULLIF(d.wdeg, 0), 9) AS score,
           COALESCE(w1.wdeg1, 0) AS wdeg1
    FROM s{rounds} s
    LEFT JOIN degrees d ON d.id = s.id
    LEFT JOIN w1 ON w1.id = s.id
    WHERE s.p > 0 OR s.res > 0
),
rk AS MATERIALIZED (
    SELECT id, wdeg1,
           ROW_NUMBER() OVER (ORDER BY score DESC NULLS LAST, id ASC) AS rnk
    FROM sup
),
swev AS (
    SELECT * FROM (
        SELECT CASE WHEN u.src = u.dst THEN ra.rnk
                    ELSE LEAST(COALESCE(ra.rnk, 2147483647),
                               COALESCE(rb.rnk, 2147483647)) END AS enter,
               CASE WHEN u.src <> u.dst AND ra.rnk IS NOT NULL
                         AND rb.rnk IS NOT NULL
                    THEN GREATEST(ra.rnk, rb.rnk) END AS leave,
               u.weight AS w
        FROM (SELECT src, dst, weight FROM edges WHERE src <= dst) u
        LEFT JOIN rk ra ON ra.id = u.src
        LEFT JOIN rk rb ON rb.id = u.dst
    ) WHERE enter IS NOT NULL AND enter <> 2147483647
),
dl AS (
    SELECT rnk, SUM(d) AS delta FROM (
        SELECT enter AS rnk, w AS d FROM swev
        UNION ALL
        SELECT leave AS rnk, -w AS d FROM swev WHERE leave IS NOT NULL
    ) GROUP BY rnk
),
sw AS (
    SELECT r.rnk, r.id,
           SUM(COALESCE(dl.delta, 0)) OVER (ORDER BY r.rnk) AS cut,
           SUM(r.wdeg1) OVER (ORDER BY r.rnk) AS vol
    FROM rk r LEFT JOIN dl ON dl.rnk = r.rnk
),
cnd AS (
    SELECT rnk,
           CASE WHEN LEAST(vol, (SELECT tv FROM tvv) - vol) > 0
                THEN ROUND(cut / LEAST(vol, (SELECT tv FROM tvv) - vol), 9)
           END AS cond
    FROM sw WHERE rnk < (SELECT count(*) FROM vertices)
),
bk AS (SELECT rnk AS k FROM cnd WHERE cond IS NOT NULL ORDER BY cond, rnk LIMIT 1)
SELECT id FROM rk WHERE rnk <= (SELECT k FROM bk) ORDER BY id"""
    return _with_graph(body)


# ---- SEIR epidemic (simulation/EpidemicSimulationSEIR.cpp) ----------------

def sql_seir(
    zero: int = 0,
    t_max: int = 8,
    trans_p: float = 0.5,
    e_time: int = 2,
    i_time: int = 7,
    seed: int = 42,
) -> str:
    """Unrolled synchronous SEIR sweeps mirroring operators/epidemic.py."""
    from networkit_spark.functions.hashing import md5_long_sql

    cut = int(trans_p * (2**48))
    ctes = [
        "ae AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        f"st0 AS (SELECT id, CASE WHEN id = {zero} THEN 2 ELSE 0 END AS st, 0 AS ts FROM vertices)",
    ]
    census = []
    for t in range(t_max):
        h = md5_long_sql(
            f"('{seed}:sir:{t}:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
        )
        ctes.append(
            f"""ex{t} AS (
    SELECT DISTINCT e.dst AS id
    FROM ae e JOIN st{t} s ON s.id = e.src AND s.st = 2
    WHERE {h} <= {cut}
),
st{t + 1} AS MATERIALIZED (
    SELECT s.id,
           CASE WHEN s.st = 0 AND x.id IS NOT NULL THEN 1
                WHEN s.st = 1 AND {t} - s.ts >= {e_time} THEN 2
                WHEN s.st = 2 AND {t} - s.ts >= {i_time} THEN 3
                ELSE s.st END AS st,
           CASE WHEN (s.st = 0 AND x.id IS NOT NULL)
                  OR (s.st = 1 AND {t} - s.ts >= {e_time})
                  OR (s.st = 2 AND {t} - s.ts >= {i_time})
                THEN {t} ELSE s.ts END AS ts
    FROM st{t} s LEFT JOIN ex{t} x ON x.id = s.id
)"""
        )
        census.append(
            f"SELECT {t} AS t, st AS state, count(*) AS population FROM st{t + 1} GROUP BY st"
        )
    body = ", ".join(ctes) + f""",
cs AS ({' UNION ALL '.join(census)}),
grid AS (
    SELECT g.t, q.state
    FROM generate_series(0, {t_max - 1}) g(t), generate_series(0, 3) q(state)
)
SELECT CAST(grid.t AS INT) AS t, CAST(grid.state AS INT) AS state,
       CAST(COALESCE(cs.population, 0) AS BIGINT) AS population
FROM grid LEFT JOIN cs ON cs.t = grid.t AND cs.state = grid.state
ORDER BY t, state"""
    return _with_graph(body)


# ---- Laplacian centrality + sfigality (centrality/LaplacianCentrality.cpp,
#      Sfigality.cpp) --------------------------------------------------------

def sql_laplacian_centrality(normalized: bool = True) -> str:
    body = f"""wd AS (
    SELECT v.id, COALESCE(s.wd, 0.0) AS wd
    FROM vertices v LEFT JOIN (
        SELECT src AS id, SUM(weight) AS wd FROM edges GROUP BY src
    ) s ON s.id = v.id
),
nbr AS (
    SELECT e.src AS id,
           SUM(e.weight * (e.weight + 2.0 * w.wd)) AS loss_nbr
    FROM edges e JOIN wd w ON w.id = e.dst GROUP BY e.src
),
tot AS (
    SELECT (SELECT SUM(wd * wd) FROM wd)
         + (SELECT SUM(weight * weight) FROM edges) AS te
),
sc AS (
    SELECT w.id, w.wd * w.wd + COALESCE(n.loss_nbr, 0.0) AS score
    FROM wd w LEFT JOIN nbr n ON n.id = w.id
)
SELECT id, ROUND({'score / (SELECT te FROM tot)' if normalized else 'score'}, 6) AS score
FROM sc ORDER BY id"""
    return _with_graph(body)


def sql_sfigality() -> str:
    body = """dg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
hi AS (
    SELECT e.src AS id,
           SUM(CASE WHEN a.deg < b.deg THEN 1 ELSE 0 END) AS sf
    FROM edges e
    JOIN dg a ON a.id = e.src
    JOIN dg b ON b.id = e.dst
    GROUP BY e.src
)
SELECT v.id,
       ROUND(COALESCE(hi.sf, 0) * 1.0 / NULLIF(dg.deg, 0), 6) AS score
FROM vertices v
LEFT JOIN dg ON dg.id = v.id
LEFT JOIN hi ON hi.id = v.id
ORDER BY v.id"""
    return _with_graph(body)


# ---- Node2Vec biased walks (embedding/BiasedRandomWalk.cpp) ----------------

def _node2vec_ctes(
    p: float = 4.0,
    q: float = 0.25,
    walk_length: int = 5,
    walks_per_node: int = 1,
    seed: int = 42,
) -> list[str]:
    """Unrolled walk-step CTE chain ending in ``wk(walk_id, step, node)``,
    mirroring operators/node2vec.py — composed by sql_node2vec_walks and
    sql_sgns. The gate pins p and q to powers of two: weights are integral
    counts, so every wadj and every cumulative sum is an exact dyadic
    rational — window-sum association order can't perturb the inverse-CDF
    pick in either engine. Belt-and-braces, tot is the MAX of the ordered
    running sum (not a separate unordered partition sum), matching the
    engine side, so even non-dyadic weights can't strand a draw past the
    final cum."""
    from networkit_spark.functions.hashing import md5_long_sql

    def draw(step: int) -> str:
        return md5_long_sql(f"('{seed}:walk:{step}:' || CAST(walk_id AS STRING))")

    ctes = [
        "ed AS MATERIALIZED (SELECT src, dst, MAX(weight) AS w FROM edges GROUP BY src, dst)",
        f"""starts AS (
    SELECT id * {walks_per_node} + c.c AS walk_id, id AS node
    FROM vertices, generate_series(0, {walks_per_node - 1}) c(c)
)""",
        """rk AS (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS rn,
           COUNT(*) OVER (PARTITION BY src) AS cnt
    FROM ed
)""",
        f"""st1 AS MATERIALIZED (
    SELECT walk_id, t, v FROM (
        SELECT s.walk_id, s.node AS t, r.dst AS v, r.rn, r.cnt
        FROM starts s JOIN rk r ON r.src = s.node
    ) WHERE rn = ({draw(1)} % cnt) + 1
)""",
    ]
    for i in range(2, walk_length):
        ctes.append(
            f"""cand{i} AS (
    SELECT st.walk_id, st.t, st.v, e.dst AS x,
           CASE WHEN e.dst = st.t THEN e.w / {p}
                WHEN a.src IS NOT NULL THEN e.w
                ELSE e.w / {q} END AS wadj
    FROM st{i - 1} st JOIN ed e ON e.src = st.v
    LEFT JOIN ed a ON a.src = st.t AND a.dst = e.dst
),
st{i} AS MATERIALIZED (
    SELECT walk_id, MIN(v) AS t, MIN(x) AS v FROM (
        SELECT walk_id, v, x, cum,
               MAX(cum) OVER (PARTITION BY walk_id) AS tot,
               h
        FROM (
            SELECT walk_id, v, x,
                   SUM(wadj) OVER (PARTITION BY walk_id ORDER BY x) AS cum,
                   {draw(i)} AS h
            FROM cand{i}
        )
    ) WHERE cum > h * POWER(2.0, -48) * tot
    GROUP BY walk_id
)"""
        )
    rows = ["SELECT walk_id, 0 AS step, node FROM starts"]
    for i in range(1, walk_length):
        rows.append(f"SELECT walk_id, {i} AS step, v AS node FROM st{i}")
    ctes.append(f"wk AS ({' UNION ALL '.join(rows)})")
    return ctes


def sql_node2vec_walks(
    p: float = 4.0,
    q: float = 0.25,
    walk_length: int = 5,
    walks_per_node: int = 1,
    seed: int = 42,
) -> str:
    body = ", ".join(_node2vec_ctes(p, q, walk_length, walks_per_node, seed)) + """
SELECT CAST(walk_id AS BIGINT) AS walk_id, CAST(step AS INT) AS step,
       CAST(node AS BIGINT) AS node
FROM wk ORDER BY walk_id, step"""
    return _with_graph(body)


def sql_sgns(
    dim: int = 8,
    window: int = 2,
    negatives: int = 2,
    lr: float = 4.0,
    epochs: int = 3,
    seed: int = 42,
    p: float = 4.0,
    q: float = 0.25,
    walk_length: int = 5,
    walks_per_node: int = 2,
) -> str:
    """Unrolled synchronous mean-gradient SGNS epochs mirroring
    operators/sgns.py (module docstring there has the bit-exact grid
    protocol: the per-pair coefficient snaps to the 2^-24 grid after the
    sigmoid, every gradient contribution snaps to the 2^-30 grid before the
    per-(node, dim) SUM, so sums are order-exact and weights stay dyadic)."""
    from networkit_spark.functions.hashing import md5_long_sql

    Q24, Q30 = float(1 << 24), float(1 << 30)
    P48 = float(1 << 48)
    negdraw = md5_long_sql(
        f"('{seed}:neg:' || CAST(i AS STRING) || ':' || "
        "CAST(walk_id AS STRING) || ':' || CAST(cs AS STRING) || ':' || "
        "CAST(os AS STRING))"
    )
    initdraw = md5_long_sql(
        f"('{seed}:init:' || CAST(id AS STRING) || ':' || CAST(j AS STRING))"
    )
    ctes = _node2vec_ctes(p, q, walk_length, walks_per_node, seed)
    ctes += [
        # word2vec unigram^0.75 table, integer-exact (operators/sgns.py
        # unigram_table): cnt^0.75 = sqrt(sqrt(cnt^3)) (sqrt is correctly
        # rounded, pow is not) on the 2^-20 integer grid, T = 8x vocab,
        # largest-remainder apportionment, draw = md5 % T equi-join on slot
        """vcnt AS (SELECT node, CAST(COUNT(*) AS DOUBLE) AS cnt FROM wk GROUP BY node)""",
        """uq AS (
    SELECT node,
           CAST(FLOOR(SQRT(SQRT(cnt * cnt * cnt)) * 1048576.0 + 0.5) AS BIGINT) AS q
    FROM vcnt
)""",
        "uqt AS (SELECT SUM(q) AS qq, 8 * COUNT(*) AS t FROM uq)",
        """ub AS (
    SELECT node, q,
           ((SELECT t FROM uqt) * q) // (SELECT qq FROM uqt) AS base,
           ((SELECT t FROM uqt) * q) % (SELECT qq FROM uqt) AS rem
    FROM uq
)""",
        """urk AS (
    SELECT node, base, rem,
           ROW_NUMBER() OVER (ORDER BY rem DESC, node ASC) AS rn
    FROM ub
)""",
        "urr AS (SELECT (SELECT t FROM uqt) - SUM(base) AS r FROM urk)",
        """usl AS (
    SELECT node,
           base + CASE WHEN rn <= (SELECT r FROM urr) THEN 1 ELSE 0 END AS slots
    FROM urk
)""",
        """ust AS (
    SELECT node, CAST(slots AS BIGINT) AS slots,
           CAST(SUM(slots) OVER (ORDER BY node) - slots AS BIGINT) AS start
    FROM usl WHERE slots > 0
)""",
        """utab AS MATERIALIZED (
    SELECT u.start + UNNEST(RANGE(0, u.slots)) AS slot, u.node FROM ust u
)""",
        f"""pos AS MATERIALIZED (
    SELECT a.walk_id, a.step AS cs, b.step AS os, a.node AS c, b.node AS o
    FROM wk a JOIN wk b ON b.walk_id = a.walk_id
    WHERE a.step <> b.step AND ABS(a.step - b.step) <= {window}
)""",
        f"""neg AS (
    SELECT d.walk_id, d.cs, d.os, d.i, d.c, tb.node AS o
    FROM (
        SELECT walk_id, cs, os, c, o AS po, i.i,
               {negdraw} % (SELECT t FROM uqt) AS slot
        FROM pos, generate_series(0, {negatives - 1}) i(i)
    ) d JOIN utab tb ON tb.slot = d.slot
    WHERE tb.node <> d.po
)""",
        f"""sgp AS MATERIALIZED (
    SELECT walk_id, cs, os, -1 AS i, c, o, 1.0 AS label FROM pos
    UNION ALL
    SELECT walk_id, cs, os, i, c, o, 0.0 AS label FROM neg
)""",
        "np AS (SELECT COUNT(*) AS cnt FROM sgp)",
        f"""win0 AS MATERIALIZED (
    SELECT id, j.j,
           FLOOR((({initdraw}) / {P48} - 0.5) / {float(dim)} * {Q30} + 0.5) / {Q30} AS w
    FROM vertices, generate_series(0, {dim - 1}) j(j)
)""",
        f"""wout0 AS MATERIALIZED (
    SELECT id, j.j, 0.0 AS w FROM vertices, generate_series(0, {dim - 1}) j(j)
)""",
    ]
    for e in range(epochs):
        ctes.append(
            f"""sc{e} AS MATERIALIZED (
    SELECT pr.walk_id, pr.cs, pr.os, pr.i, pr.c, pr.o,
           FLOOR({lr} * (pr.label - 1.0 / (1.0 + EXP(-SUM(wi.w * wo.w))))
                 / (SELECT cnt FROM np) * {Q24} + 0.5) / {Q24} AS g
    FROM sgp pr
    JOIN win{e} wi ON wi.id = pr.c
    JOIN wout{e} wo ON wo.id = pr.o AND wo.j = wi.j
    GROUP BY pr.walk_id, pr.cs, pr.os, pr.i, pr.c, pr.o, pr.label
)"""
        )
        ctes.append(
            f"""dwi{e} AS (
    SELECT g.c AS id, wo.j,
           SUM(FLOOR(g.g * wo.w * {Q30} + 0.5) / {Q30}) AS dv
    FROM sc{e} g JOIN wout{e} wo ON wo.id = g.o GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""dwo{e} AS (
    SELECT g.o AS id, wi.j,
           SUM(FLOOR(g.g * wi.w * {Q30} + 0.5) / {Q30}) AS dv
    FROM sc{e} g JOIN win{e} wi ON wi.id = g.c GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""win{e + 1} AS MATERIALIZED (
    SELECT w.id, w.j, w.w + COALESCE(d.dv, 0.0) AS w
    FROM win{e} w LEFT JOIN dwi{e} d ON d.id = w.id AND d.j = w.j
)"""
        )
        ctes.append(
            f"""wout{e + 1} AS MATERIALIZED (
    SELECT w.id, w.j, w.w + COALESCE(d.dv, 0.0) AS w
    FROM wout{e} w LEFT JOIN dwo{e} d ON d.id = w.id AND d.j = w.j
)"""
        )
    outs = ", ".join(
        f"ROUND(MAX(CASE WHEN j = {j} THEN w END), 6) + 0.0 AS e{j}"
        for j in range(dim)
    )
    body = ", ".join(ctes) + f"""
SELECT CAST(id AS BIGINT) AS id, {outs}
FROM win{epochs} GROUP BY id ORDER BY id"""
    return _with_graph(body)


# ---- Maximum spanning forest (graph/RandomMaximumSpanningForest.cpp) -------

def sql_msf(rounds: int = 10, jumps: int = 8) -> str:
    """Unrolled Boruvka mirroring operators/spanning.py: per round, each
    component's lexicographic-max (w, u, v) incident cross edge joins the
    forest, 2-cycles in the best-edge pointer graph break to the smaller
    component, and `jumps` pointer-squaring steps contract to roots
    (2^jumps >= any chain depth at gate scale). Under the strict total
    order the forest is unique, so both engines converge to the same set;
    rounds past convergence are no-ops on empty cross sets."""
    ctes = [
        """rem0 AS MATERIALIZED (
    SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, MAX(weight) AS w
    FROM edges WHERE src <> dst GROUP BY 1, 2
)""",
        "lab0 AS (SELECT id AS node, id AS comp FROM vertices)",
    ]
    for i in range(1, rounds + 1):
        p = f"p0_{i}"
        ctes.append(
            f"""cross{i} AS MATERIALIZED (
    SELECT r.u, r.v, r.w, lu.comp AS cu, lv.comp AS cv
    FROM rem{i-1} r
    JOIN lab{i-1} lu ON lu.node = r.u
    JOIN lab{i-1} lv ON lv.node = r.v
    WHERE lu.comp <> lv.comp
),
best{i} AS MATERIALIZED (
    SELECT comp, u, v, w, other FROM (
        SELECT comp, u, v, w, other,
               ROW_NUMBER() OVER (PARTITION BY comp
                                  ORDER BY w DESC, u DESC, v DESC) AS rn
        FROM (
            SELECT cu AS comp, u, v, w, cv AS other FROM cross{i}
            UNION ALL
            SELECT cv AS comp, u, v, w, cu AS other FROM cross{i}
        )
    ) WHERE rn = 1
),
{p} AS (
    SELECT b.comp,
           CASE WHEN gp.other = b.comp AND b.comp < b.other
                THEN b.comp ELSE b.other END AS parent
    FROM best{i} b LEFT JOIN best{i} gp ON gp.comp = b.other
)"""
        )
        for k in range(1, jumps + 1):
            ctes.append(
                f"""p{k}_{i} AS (
    SELECT a.comp, COALESCE(b.parent, a.parent) AS parent
    FROM p{k-1}_{i} a LEFT JOIN p{k-1}_{i} b ON b.comp = a.parent
)"""
            )
        ctes.append(
            f"""lab{i} AS MATERIALIZED (
    SELECT l.node, COALESCE(p.parent, l.comp) AS comp
    FROM lab{i-1} l LEFT JOIN p{jumps}_{i} p ON p.comp = l.comp
),
rem{i} AS (SELECT u, v, w FROM cross{i})"""
        )
    picks = " UNION ALL ".join(
        f"SELECT DISTINCT u, v, w FROM best{i}" for i in range(1, rounds + 1)
    )
    body = ", ".join(ctes) + f""",
forest AS ({picks})
SELECT DISTINCT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       CAST(w AS DOUBLE) AS weight
FROM forest ORDER BY u, v"""
    return _with_graph(body)


# ---- Reachable nodes (reachability/ReachableNodes.cpp) ---------------------

def sql_reachable_nodes() -> str:
    """Exact reachable-set sizes over the recursive transitive closure —
    structurally independent of the engine's semi-naive frontier loop,
    same unique fixed point."""
    return f"""WITH RECURSIVE {DIGRAPH_CTE.strip()},
reach(s, v) AS (
    SELECT id, id FROM dvertices
    UNION
    SELECT r.s, e.dst FROM reach r JOIN dedges e ON e.src = r.v
)
SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS reachable
FROM reach GROUP BY s ORDER BY id"""


# ---- Eccentricity / SPSP / Volume (distance/) ------------------------------

def sql_eccentricity(iters: int) -> str:
    """Per-node eccentricity + largest max-distance vertex over the
    unrolled all-pairs hop table (distance/Eccentricity.cpp semantics with
    the engine's deterministic argmax tie-break)."""
    body = ", ".join(_apsp_ctes(iters)) + f""",
ecc AS (SELECT s, MAX(dist) AS ecc FROM ap{iters} GROUP BY s)
SELECT e.s AS id, CAST(e.ecc AS BIGINT) AS ecc, CAST(MAX(a.v) AS BIGINT) AS farthest
FROM ecc e JOIN ap{iters} a ON a.s = e.s AND a.dist = e.ecc
GROUP BY e.s, e.ecc ORDER BY id"""
    return _with_graph(body)


def sql_spsp(iters: int, sources: list[int]) -> str:
    """Some-pairs shortest paths: the all-pairs hop table filtered to the
    pinned source set (distance/SPSP.cpp)."""
    src_list = ", ".join(str(int(s)) for s in sources)
    body = ", ".join(_apsp_ctes(iters)) + f"""
SELECT s, v AS t, CAST(dist AS BIGINT) AS dist
FROM ap{iters} WHERE s IN ({src_list}) ORDER BY s, t"""
    return _with_graph(body)


def sql_volume(rs: list[float], samples: int, seed: int = 42) -> str:
    """Expected r-ball size over the deterministic hash-rank node sample —
    recursive weighted ball expansion pruned at rmax, min distance per
    (source, node), then one count per radius (distance/Volume.cpp:40-69).
    Structurally independent of the engine's frontier relaxation loop."""
    from networkit_spark.functions.hashing import md5_long_sql

    rk = md5_long_sql(f"('{seed}:' || CAST(id AS STRING))")
    rmax = max(rs)
    grid = ", ".join(f"({float(r)})" for r in sorted(rs))
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
samp AS MATERIALIZED (
    SELECT id AS s FROM (
        SELECT id, {rk} AS rk FROM vertices ORDER BY rk, id LIMIT {samples}
    )
),
wadj AS MATERIALIZED (
    SELECT src, dst, MIN(weight) AS weight FROM edges WHERE src <> dst GROUP BY src, dst
),
ball(s, v, d) AS (
    SELECT s, s, CAST(0 AS DOUBLE) FROM samp
    UNION
    SELECT b.s, e.dst, b.d + e.weight FROM ball b JOIN wadj e ON e.src = b.v
    WHERE b.d + e.weight <= {float(rmax)}
),
mind AS (SELECT s, v, MIN(d) AS d FROM ball GROUP BY s, v),
grid(r) AS (VALUES {grid})
SELECT g.r, ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM samp) AS DOUBLE), 6) AS volume
FROM mind m JOIN grid g ON m.d <= g.r GROUP BY g.r ORDER BY g.r"""


# ---- Local partition / cover evaluation (community/) ------------------------

def sql_partition_eval(lp_iters: int) -> str:
    """Per-cluster intrapartition density, hub dominance, and isolated
    interpartition conductance/expansion over the lp{N} partition
    (IntrapartitionDensity.cpp, PartitionHubDominance.cpp,
    IsolatedInterpartitionConductance.cpp, ...Expansion.cpp)."""
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
lbl AS (SELECT id, label FROM {last}),
fe AS (SELECT src, dst, weight FROM edges WHERE src <= dst),
el AS (
    SELECT f.weight, lu.label AS lu, lv.label AS lv
    FROM fe f JOIN lbl lu ON lu.id = f.src JOIN lbl lv ON lv.id = f.dst
),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS size FROM lbl GROUP BY label),
intra AS (SELECT lu AS label, COUNT(*) AS m FROM el WHERE lu = lv GROUP BY lu),
ends AS (
    SELECT lu AS label, weight, (lu <> lv) AS x FROM el
    UNION ALL
    SELECT lv, weight, (lu <> lv) FROM el
),
pl AS (
    SELECT label, SUM(CASE WHEN x THEN weight ELSE 0 END) AS cut,
           SUM(weight) AS vol
    FROM ends GROUP BY label
),
tot AS (SELECT 2.0 * SUM(weight) AS tv FROM fe),
nn AS (SELECT COUNT(*) AS n FROM vertices),
indeg AS (
    SELECT e.src AS id, COUNT(*) AS d
    FROM edges e JOIN lbl lu ON lu.id = e.src JOIN lbl lv ON lv.id = e.dst
    WHERE lu.label = lv.label GROUP BY e.src
),
hub AS (
    SELECT l.label, MAX(COALESCE(i.d, 0)) AS hd
    FROM lbl l LEFT JOIN indeg i ON i.id = l.id GROUP BY l.label
)
SELECT s.label, s.size,
  ROUND(CASE WHEN s.size > 1 THEN COALESCE(it.m, 0) / (s.size*(s.size-1)/2.0)
             ELSE 1.0 END, 6) + 0.0 AS density,
  ROUND(CASE WHEN s.size > 1 THEN CAST(h.hd AS DOUBLE) / (s.size - 1)
             ELSE 1.0 END, 6) + 0.0 AS hub_dominance,
  ROUND(CASE WHEN least(p.vol, (SELECT tv FROM tot) - p.vol) > 0
             THEN COALESCE(p.cut, 0) / least(p.vol, (SELECT tv FROM tot) - p.vol)
             ELSE 0.0 END, 6) + 0.0 AS iso_conductance,
  ROUND(CASE WHEN least(s.size, (SELECT n FROM nn) - s.size) > 0
             THEN COALESCE(p.cut, 0) / least(s.size, (SELECT n FROM nn) - s.size)
             ELSE 0.0 END, 6) + 0.0 AS iso_expansion
FROM sizes s
LEFT JOIN intra it ON it.label = s.label
JOIN hub h ON h.label = s.label
LEFT JOIN pl p ON p.label = s.label
ORDER BY s.label"""


def sql_sampled_rand(
    lp_iters: int,
    lp_iters_b: int,
    node_samples: int,
    edge_samples: int,
    seed: int = 42,
) -> str:
    """Hash-derandomized sampled node-structural and graph-structural Rand
    dissimilarities between lp{a} and lp{b}
    (SampledNodeStructuralRandMeasure.cpp:18-48,
    SampledGraphStructuralRandMeasure.cpp:18-50) — identical md5-ranked
    sample as operators/measures.py."""
    from networkit_spark.functions.hashing import md5_long_sql

    assert lp_iters_b < lp_iters
    inner, last = _lp_inner(lp_iters)
    a, b = last, f"lp{lp_iters_b}"
    vh = md5_long_sql(f"('{seed}:snr:' || CAST(id AS STRING))")
    eh = md5_long_sql(
        f"('{seed}:sgr:' || CAST(src AS STRING) || ':' || CAST(dst AS STRING))"
    )
    agree = (
        "(za.label = zb.label AND ea.label = eb.label) OR "
        "(za.label <> zb.label AND ea.label <> eb.label)"
    )
    return f"""WITH {inner},
rv AS (SELECT id, ROW_NUMBER() OVER (ORDER BY {vh}, id) - 1 AS r FROM vertices),
hn AS (SELECT COUNT(*) // 2 AS h FROM vertices),
sn AS (SELECT LEAST({node_samples}, (SELECT h FROM hn)) AS s),
pa AS (SELECT r AS k, id AS u FROM rv WHERE r < (SELECT s FROM sn)),
pb AS (
    SELECT r - (SELECT h FROM hn) AS k, id AS v FROM rv
    WHERE r >= (SELECT h FROM hn)
      AND r < (SELECT h FROM hn) + (SELECT s FROM sn)
),
np AS (SELECT u, v FROM pa JOIN pb USING (k)),
nagr AS (
    SELECT COUNT(*) AS s,
           SUM(CASE WHEN {agree} THEN 1 ELSE 0 END) AS ag
    FROM np
    JOIN {a} za ON za.id = np.u JOIN {a} zb ON zb.id = np.v
    JOIN {b} ea ON ea.id = np.u JOIN {b} eb ON eb.id = np.v
),
ce AS (SELECT DISTINCT src, dst FROM edges WHERE src <= dst),
re AS (
    SELECT src, dst, ROW_NUMBER() OVER (ORDER BY {eh}, src, dst) - 1 AS r
    FROM ce
),
se AS (SELECT src, dst FROM re WHERE r < {edge_samples}),
eagr AS (
    SELECT COUNT(*) AS s,
           SUM(CASE WHEN {agree} THEN 1 ELSE 0 END) AS ag
    FROM se
    JOIN {a} za ON za.id = se.src JOIN {a} zb ON zb.id = se.dst
    JOIN {b} ea ON ea.id = se.src JOIN {b} eb ON eb.id = se.dst
)
SELECT
  ROUND(1.0 - (SELECT ag FROM nagr) * 1.0 / (SELECT s FROM nagr), 6) + 0.0
    AS sampled_node_rand,
  ROUND(1.0 - (SELECT ag FROM eagr) * 1.0 / (SELECT s FROM eagr), 6) + 0.0
    AS sampled_graph_rand"""


def sql_sampled_closeness(num_samples: int, seed: int = 42) -> str:
    """Eppstein-Wang sampled closeness with the same md5-ranked pivots
    and recursive-ball BFS distances as the engine
    (ApproxCloseness.cpp's sampling-estimator role)."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(f"('{seed}:acl:' || CAST(id AS STRING))")
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
sedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices),
pv AS MATERIALIZED (
    SELECT id FROM (
        SELECT id, ROW_NUMBER() OVER (ORDER BY {h}, id) AS r FROM vertices
    ) WHERE r <= {num_samples}
),
kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM pv),
ball(s, v, d) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM pv
    UNION
    SELECT b.s, e.dst, b.d + 1 FROM ball b JOIN sedges e ON e.src = b.v
    WHERE b.d + 1 <= (SELECT n FROM nn)
),
dists AS (SELECT s, v AS id, MIN(d) AS dist FROM ball GROUP BY s, v),
agg AS (SELECT id, CAST(SUM(dist) AS DOUBLE) AS sum_d FROM dists GROUP BY id)
SELECT v.id,
       ROUND(CASE WHEN a.sum_d > 0
                  THEN 1.0 / ((CAST((SELECT n FROM nn) AS DOUBLE)
                               / ((SELECT k FROM kk) * ((SELECT n FROM nn) - 1.0)))
                              * a.sum_d)
                  ELSE 0.0 END, 6) + 0.0 AS closeness_est
FROM vertices v LEFT JOIN agg a ON a.id = v.id
ORDER BY v.id"""


def sql_local_coverage(lp_iters: int) -> str:
    """Per-vertex local partition coverage against the lp{N} partition
    (LocalPartitionCoverage.cpp:12-30): same-cluster weighted degree over
    weighted degree, loops once, isolated vertices 0."""
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
lbl AS (SELECT id, label FROM {last}),
per AS (
    SELECT e.src AS id,
           COALESCE(SUM(CASE WHEN a.label = b.label THEN e.weight END), 0.0) AS num,
           SUM(e.weight) AS den
    FROM edges e JOIN lbl a ON a.id = e.src JOIN lbl b ON b.id = e.dst
    GROUP BY e.src
)
SELECT v.id,
       ROUND(CASE WHEN p.num > 0 THEN p.num / p.den ELSE 0.0 END, 6) + 0.0
           AS coverage
FROM vertices v LEFT JOIN per p ON p.id = v.id
ORDER BY v.id"""


def sql_permanence(lp_iters: int) -> str:
    """Per-vertex permanence against the lp{N} partition
    (PermanenceCentrality.cpp:139-160 getPermanence, :112-137
    getIntraClustering): internal-degree / max-single-external-community
    strength / degree minus (1 - intra clustering), where the intra
    clustering counts monochromatic triangles over the simple support."""
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
lbl AS (SELECT id, label FROM {last}),
ne AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
nl AS (
    SELECT n.src, n.dst, a.label AS lsrc, b.label AS ldst
    FROM ne n JOIN lbl a ON a.id = n.src JOIN lbl b ON b.id = n.dst
),
st AS (SELECT src, lsrc, ldst, COUNT(*) AS s FROM nl GROUP BY 1, 2, 3),
pn AS (
    SELECT src AS id, SUM(s) AS deg,
           COALESCE(SUM(CASE WHEN ldst = lsrc THEN s END), 0) AS ideg,
           COALESCE(MAX(CASE WHEN ldst <> lsrc THEN s END), 0) AS emax
    FROM st GROUP BY src
),
ie AS (SELECT src, dst FROM nl WHERE lsrc = ldst AND src < dst),
tr AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM ie e1
    JOIN ie e2 ON e2.src = e1.dst
    JOIN ie e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
    SELECT a AS id FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr
),
tric AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
SELECT p.id,
  ROUND(CAST(p.ideg AS DOUBLE) / GREATEST(p.emax, 1) / p.deg
        - (1.0 - CASE WHEN p.ideg >= 2
                      THEN COALESCE(tc.t, 0) * 2.0 / (p.ideg * (p.ideg - 1))
                      ELSE 0.0 END), 6) + 0.0 AS permanence
FROM pn p LEFT JOIN tric tc ON tc.id = p.id
ORDER BY p.id"""


def sql_adjusted_rand(lp_iters: int, lp_iters_b: int) -> str:
    """Chance-corrected Rand distance between lp{a} and lp{b}
    (AdjustedRandMeasure.cpp:7-56), same degenerate-case zeros as the
    engine (abs tolerance 1e-12)."""
    assert lp_iters_b < lp_iters
    inner, last = _lp_inner(lp_iters)
    a, b = last, f"lp{lp_iters_b}"
    return f"""WITH {inner},
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
msz AS (SELECT label, CAST(count(*) AS DOUBLE) AS s FROM {a} GROUP BY label),
mse AS (SELECT label, CAST(count(*) AS DOUBLE) AS s FROM {b} GROUP BY label),
mov AS (
    SELECT za.label AS la, eb.label AS lb, CAST(count(*) AS DOUBLE) AS s
    FROM {a} za JOIN {b} eb ON eb.id = za.id GROUP BY 1, 2
),
sums AS (
    SELECT (SELECT SUM(s*(s-1)/2.0) FROM msz) AS sum_z,
           (SELECT SUM(s*(s-1)/2.0) FROM mse) AS sum_e,
           (SELECT SUM(s*(s-1)/2.0) FROM mov) AS sum_i,
           (SELECT n FROM nn) AS n
)
SELECT ROUND(
  CASE WHEN (sum_z + sum_e) / 2.0 < 1e-12 THEN 0.0
       WHEN abs((sum_z + sum_e) / 2.0 - sum_z*sum_e/(n*(n-1)/2.0)) < 1e-12 THEN 0.0
       ELSE 1.0 - (sum_i - sum_z*sum_e/(n*(n-1)/2.0))
                  / ((sum_z + sum_e) / 2.0 - sum_z*sum_e/(n*(n-1)/2.0))
  END, 6) + 0.0 AS adjusted_rand_distance
FROM sums"""


def sql_cover_f1(lp_iters: int, cc_iters: int) -> str:
    """Best-match F1 of each lp{N} community against the connected
    components viewed as a reference cover (CoverF1Similarity.cpp)."""
    inner, last = _lp_inner(lp_iters)
    return f"""WITH {inner},
{', '.join(_cc_ctes(cc_iters))},
c AS (SELECT id, label AS subset FROM {last}),
r AS (SELECT id, label AS rsub FROM cc{cc_iters}),
csz AS (SELECT subset, CAST(COUNT(*) AS DOUBLE) AS cs FROM c GROUP BY subset),
rsz AS (SELECT rsub, CAST(COUNT(*) AS DOUBLE) AS rs FROM r GROUP BY rsub),
ov AS (
    SELECT c.subset, r.rsub, CAST(COUNT(*) AS DOUBLE) AS ov
    FROM c JOIN r ON r.id = c.id GROUP BY c.subset, r.rsub
),
f1 AS (
    SELECT o.subset, MAX(2.0 * o.ov / (cz.cs + rz.rs)) AS f1
    FROM ov o JOIN csz cz ON cz.subset = o.subset JOIN rsz rz ON rz.rsub = o.rsub
    GROUP BY o.subset
)
SELECT CAST(cz.subset AS BIGINT) AS subset,
       ROUND(COALESCE(f.f1, 0.0), 6) + 0.0 AS f1
FROM csz cz LEFT JOIN f1 f ON f.subset = cz.subset
ORDER BY subset"""


# ---- Maximal cliques (clique/MaximalCliques.cpp) ---------------------------

def sql_maximal_cliques() -> str:
    """All-cliques recursive enumeration in increasing-id order (each
    clique generated once), then an anti-extension maximality filter —
    structurally independent of the engine's per-ego Bron-Kerbosch."""
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
adjl AS MATERIALIZED (SELECT src AS id, list_sort(list(dst)) AS nbrs FROM uadj GROUP BY src),
cl(members, maxv) AS (
    SELECT [id], id FROM vertices
    UNION ALL
    SELECT list_append(c.members, e.dst), e.dst
    FROM cl c
    JOIN uadj e ON e.src = c.maxv AND e.dst > c.maxv
    JOIN adjl a ON a.id = e.dst
    WHERE list_has_all(a.nbrs, c.members)
),
mx AS (
    SELECT members FROM cl c
    WHERE NOT EXISTS (
        SELECT 1 FROM adjl a
        WHERE list_has_all(a.nbrs, c.members)
          AND NOT list_contains(c.members, a.id)
    )
)
SELECT array_to_string(members, ',') AS clique, CAST(len(members) AS BIGINT) AS size
FROM mx ORDER BY clique"""


def sql_kpath(k: int, num_walks: int, seed: int = 42) -> str:
    """Unrolled hash-derandomized k-path walks
    (KPathCentrality.cpp:34-105): per walk, md5 start/length draws, then
    k self-avoiding inverse-weight CDF steps with the same dst-ascending
    cumulative windows as the engine; score = k * n * visits / t."""
    from networkit_spark.functions.hashing import md5_long_sql

    unit = float(1 << 48)
    hs = md5_long_sql(f"('{seed}:kps:' || CAST(wid AS STRING))")
    hl = md5_long_sql(f"('{seed}:kpl:' || CAST(wid AS STRING))")
    ctes = [
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices)",
        "ue AS MATERIALIZED (SELECT src, dst, CAST(weight AS DOUBLE) AS w "
        "FROM edges WHERE src <> dst)",
        f"wids AS (SELECT CAST(unnest(range({num_walks})) AS BIGINT) AS wid)",
        f"""st0 AS (
    SELECT wid, cur, l, [cur] AS visited FROM (
        SELECT wid,
               CAST({hs} % (SELECT n FROM nn) AS BIGINT) AS cur,
               CAST({hl} % {k} + 1 AS BIGINT) AS l
        FROM wids
    )
)""",
    ]
    for j in range(1, k + 1):
        hp = md5_long_sql(f"('{seed}:kpp:{j}:' || CAST(wid AS STRING))")
        ctes.append(
            f"""cand{j} AS (
    SELECT s.wid, e.dst, 1.0 / e.w AS iw
    FROM st{j-1} s JOIN ue e ON e.src = s.cur
    WHERE s.l >= {j} AND NOT list_contains(s.visited, e.dst)
),
sc{j} AS (
    SELECT wid, dst,
           SUM(iw) OVER (PARTITION BY wid ORDER BY dst
                         ROWS UNBOUNDED PRECEDING) AS cum,
           ({hp} / {unit!r}) * SUM(iw) OVER (PARTITION BY wid) AS r
    FROM cand{j}
),
pk{j} AS (
    SELECT wid, nxt FROM (
        SELECT wid, dst AS nxt,
               ROW_NUMBER() OVER (PARTITION BY wid ORDER BY dst) AS rn
        FROM sc{j} WHERE cum > r
    ) WHERE rn = 1
),
st{j} AS MATERIALIZED (
    SELECT s.wid, COALESCE(p.nxt, s.cur) AS cur,
           CASE WHEN s.l >= {j} AND p.nxt IS NULL THEN 0 ELSE s.l END AS l,
           CASE WHEN p.nxt IS NOT NULL THEN list_append(s.visited, p.nxt)
                ELSE s.visited END AS visited
    FROM st{j-1} s LEFT JOIN pk{j} p ON p.wid = s.wid
)"""
        )
    body = (
        ", ".join(ctes)
        + f""",
vis AS (SELECT unnest(visited[2:]) AS id FROM st{k}),
cnts AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS cnt FROM vis GROUP BY id)
SELECT v.id,
       ROUND({float(k)!r} * (SELECT n FROM nn) * COALESCE(c.cnt, 0)
             / {float(num_walks)!r}, 6) + 0.0 AS score
FROM vertices v LEFT JOIN cnts c ON c.id = v.id ORDER BY v.id"""
    )
    return _with_graph(body)


def sql_map_equation(sweeps: int) -> str:
    """Unrolled synchronous map-equation local moving
    (LouvainMapEquation.cpp fitnessChange :322-365, move rule :285-296):
    per sweep every node scores staying vs each neighbor cluster against
    sweep-start cluster stats, moves when the best change is strictly
    below the stay change (ties to smallest cluster id), all moves apply
    at once — identical schedule to the engine's one-subround sweeps."""

    def plogp(x: str) -> str:
        return (
            f"CASE WHEN {x} > 0 THEN (({x}) / tvv) * LN(({x}) / tvv) "
            f"ELSE 0.0 END"
        )

    cdc = "2 * w2c - vol + lp * 2"
    stay_expr = (
        f"{plogp('tot')} + ({plogp('cut_cur + vol_cur')} - "
        f"{plogp(f'cut_cur + ({cdc}) + vol_cur - vol')}) - "
        f"2 * ({plogp('cut_cur')} - {plogp(f'cut_cur + ({cdc})')})"
    )
    cdt = "vol - 2 * w2t - lp * 2"
    move_expr = (
        f"{plogp(f'tot + ({cdc}) + ({cdt})')} + "
        f"({plogp(f'cut_t + ({cdt}) + vol_t + vol')} - {plogp('cut_t + vol_t')}) - "
        f"2 * ({plogp(f'cut_t + ({cdt})')} - {plogp('cut_t')})"
    )
    ctes = [
        "aw AS MATERIALIZED (SELECT src, dst, CAST(weight AS DOUBLE) AS w FROM edges)",
        "ns AS MATERIALIZED (SELECT src AS id, "
        "SUM(CASE WHEN src = dst THEN w * 2 ELSE w END) AS vol, "
        "COALESCE(SUM(CASE WHEN src = dst THEN w END), 0.0) AS lp "
        "FROM aw GROUP BY src)",
        "tvc AS (SELECT SUM(CASE WHEN src = dst THEN w * 2 ELSE w END) AS tvv FROM aw)",
        "lab0 AS (SELECT id, id AS label FROM ns)",
    ]
    for t in range(1, sweeps + 1):
        p = f"lab{t-1}"
        ctes.append(
            f"""rows{t} AS (
    SELECT e.src, e.dst, e.w, a.label AS lu, b.label AS lv
    FROM aw e JOIN {p} a ON a.id = e.src JOIN {p} b ON b.id = e.dst
),
cvol{t} AS (
    SELECT l.label, SUM(n.vol) AS cvol FROM {p} l JOIN ns n ON n.id = l.id
    GROUP BY l.label
),
ccut{t} AS (
    SELECT lu AS label, SUM(w) AS ccut FROM rows{t}
    WHERE src <> dst AND lu <> lv GROUP BY lu
),
cs{t} AS (
    SELECT c.label, c.cvol, COALESCE(u.ccut, 0.0) AS ccut
    FROM cvol{t} c LEFT JOIN ccut{t} u USING (label)
),
tot{t} AS (SELECT SUM(ccut) AS tot FROM cs{t}),
w2c{t} AS (
    SELECT src AS id, SUM(w) AS w2c FROM rows{t}
    WHERE src <> dst AND lu = lv GROUP BY src
),
w2tt{t} AS (
    SELECT src AS id, lv AS tgt, SUM(w) AS w2t FROM rows{t}
    WHERE src <> dst AND lu <> lv GROUP BY 1, 2
),
stay{t} AS (
    SELECT l.id, l.label, n.vol, n.lp, COALESCE(c.w2c, 0.0) AS w2c,
           s.cvol AS vol_cur, s.ccut AS cut_cur,
           (SELECT tot FROM tot{t}) AS tot, (SELECT tvv FROM tvc) AS tvv
    FROM {p} l JOIN ns n ON n.id = l.id
    LEFT JOIN w2c{t} c ON c.id = l.id
    JOIN cs{t} s ON s.label = l.label
),
cand{t} AS (
    SELECT b.id, w.tgt, w.w2t, b.vol, b.lp, b.w2c, b.tot, b.tvv,
           s2.cvol AS vol_t, s2.ccut AS cut_t,
           {stay_expr} AS stay_change
    FROM stay{t} b JOIN w2tt{t} w ON w.id = b.id
    JOIN cs{t} s2 ON s2.label = w.tgt
),
best{t} AS (
    SELECT id, tgt FROM (
        SELECT id, tgt, stay_change, {move_expr} AS change,
               ROW_NUMBER() OVER (
                   PARTITION BY id ORDER BY {move_expr}, tgt
               ) AS rn
        FROM cand{t}
    ) WHERE rn = 1 AND change < stay_change
),
lab{t} AS MATERIALIZED (
    SELECT l.id, COALESCE(b.tgt, l.label) AS label
    FROM {p} l LEFT JOIN best{t} b ON b.id = l.id
)"""
        )
    body = (
        ", ".join(ctes)
        + f" SELECT id, label FROM lab{sweeps} ORDER BY id"
    )
    return _with_graph(body)


def sql_gce(seeds: list[int], steps: int) -> str:
    """Unrolled Greedy Community Expansion, objective M (scd/GCE.cpp
    expandseedInternal<true>): per step, every seed admits its best
    shell node by dQ = (W_int+intDeg)/(cut-intDeg+extDeg) - W_int/cut
    when positive, ties to smallest id — same pinned step count and
    tie-break as the engine."""
    ctes, last = _gce_ctes(seeds, steps)
    body = ", ".join(ctes) + f" SELECT seed, node FROM {last} ORDER BY seed, node"
    return _with_graph(body)


def sql_gce_l(seeds: list[int], steps: int) -> str:
    """Unrolled GCE under objective L (GCE.cpp:56-68,82-86): boundary-
    normalized quality with the boundaryChange correction — same pinned
    step count and tie-break as the engine."""
    ctes, last = _gce_ctes(seeds, steps, objective="L")
    body = ", ".join(ctes) + f" SELECT seed, node FROM {last} ORDER BY seed, node"
    return _with_graph(body)


def _gce_ctes(
    seeds: list[int], steps: int, objective: str = "M"
) -> tuple[list[str], str]:
    seed_rows = ", ".join(f"({int(s)})" for s in seeds)
    ctes = [
        "wadj AS MATERIALIZED (SELECT src, dst, CAST(weight AS DOUBLE) AS w "
        "FROM edges WHERE src <> dst)",
        "gwd AS MATERIALIZED (SELECT src AS dst, SUM(w) AS wd FROM wadj GROUP BY src)",
        "gnc AS MATERIALIZED (SELECT src AS dst, CAST(COUNT(*) AS BIGINT) AS nc "
        "FROM wadj GROUP BY src)",
        f"mem0 AS (SELECT CAST(seed AS BIGINT) AS seed, CAST(seed AS BIGINT) AS node "
        f"FROM (VALUES {seed_rows}) s(seed))",
    ]
    for t in range(1, steps + 1):
        p = f"mem{t-1}"
        base = f"""rows{t} AS (
    SELECT m.seed, m.node AS src, e.dst, e.w, (mm.node IS NOT NULL) AS inm
    FROM {p} m JOIN wadj e ON e.src = m.node
    LEFT JOIN {p} mm ON mm.seed = m.seed AND mm.node = e.dst
),
agg{t} AS (
    SELECT seed,
           COALESCE(SUM(CASE WHEN inm THEN w END), 0.0) / 2.0 AS wint,
           COALESCE(SUM(CASE WHEN NOT inm THEN w END), 0.0) AS cut
    FROM rows{t} GROUP BY seed
),
cand{t} AS (
    SELECT seed, dst, SUM(w) AS intdeg, CAST(COUNT(*) AS BIGINT) AS ic
    FROM rows{t} WHERE NOT inm GROUP BY 1, 2
)"""
        if objective == "M":
            score = f"""sc{t} AS (
    SELECT c.seed, c.dst,
           (CASE WHEN a.cut - c.intdeg + (d.wd - c.intdeg) > 0
                 THEN (a.wint + c.intdeg) / (a.cut - c.intdeg + (d.wd - c.intdeg))
                 ELSE 1e308 END) - a.wint / a.cut AS dq
    FROM cand{t} c JOIN agg{t} a USING (seed) JOIN gwd d ON d.dst = c.dst
    WHERE a.cut > 0
)"""
        else:
            score = f"""extc{t} AS (
    SELECT seed, src, SUM(CASE WHEN NOT inm THEN 1 ELSE 0 END) AS xc
    FROM rows{t} GROUP BY 1, 2
),
bsz{t} AS (
    SELECT seed, CAST(COUNT(*) AS BIGINT) AS b FROM extc{t} WHERE xc > 0
    GROUP BY seed
),
szs{t} AS (SELECT seed, CAST(COUNT(*) AS BIGINT) AS sz FROM {p} GROUP BY seed),
lastc{t} AS (
    SELECT r.seed, r.dst, CAST(COUNT(*) AS BIGINT) AS lc
    FROM rows{t} r
    JOIN extc{t} x ON x.seed = r.seed AND x.src = r.src AND x.xc = 1
    WHERE NOT r.inm GROUP BY 1, 2
),
sc{t} AS (
    SELECT c.seed, c.dst,
           (CASE WHEN (s.sz + 1) * (a.cut - c.intdeg + (d.wd - c.intdeg)) > 0
                 THEN 2.0 * (a.wint + c.intdeg)
                      * (COALESCE(b.b, 0) + (CASE WHEN n.nc - c.ic > 0 THEN 1
                                                  ELSE 0 END - COALESCE(l.lc, 0)))
                      / ((s.sz + 1) * (a.cut - c.intdeg + (d.wd - c.intdeg)))
                 ELSE 1e308 END)
           - 2.0 * a.wint * COALESCE(b.b, 0) / (s.sz * a.cut) AS dq
    FROM cand{t} c
    JOIN agg{t} a USING (seed)
    JOIN gwd d ON d.dst = c.dst
    JOIN gnc n ON n.dst = c.dst
    JOIN szs{t} s USING (seed)
    LEFT JOIN bsz{t} b USING (seed)
    LEFT JOIN lastc{t} l ON l.seed = c.seed AND l.dst = c.dst
    WHERE a.cut > 0
)"""
        ctes.append(
            base + ",\n" + score + f""",
win{t} AS (
    SELECT seed, dst FROM (
        SELECT seed, dst,
               ROW_NUMBER() OVER (PARTITION BY seed ORDER BY dq DESC, dst) AS rn
        FROM sc{t} WHERE dq > 0
    ) WHERE rn = 1
),
mem{t} AS MATERIALIZED (
    SELECT seed, node FROM {p}
    UNION ALL
    SELECT seed, dst FROM win{t}
)"""
        )
    return ctes, f"mem{steps}"


def sql_scd_ground_truth(
    seeds: list[int], steps: int, lp_iters: int
) -> str:
    """SCDGroundTruthComparison.cpp:11-110 — per GCE seed community, the
    best Jaccard / F1 / precision / recall against the ground-truth
    subsets CONTAINING the seed (ignoreSeeds=false), each maximized
    independently; 0 when the seed community overlaps no allowed subset.
    Ground truth = the pinned lp{N} partition viewed as a cover."""
    gce_ctes, mem = _gce_ctes(seeds, steps)
    lp_inner, lp_last = _lp_inner(lp_iters)
    return f"""WITH {lp_inner},
{", ".join(gce_ctes)},
truth AS (SELECT id, label AS subset FROM {lp_last}),
fs AS (SELECT seed, CAST(COUNT(*) AS DOUBLE) AS fsz FROM {mem} GROUP BY seed),
ts AS (SELECT subset, CAST(COUNT(*) AS DOUBLE) AS tsz FROM truth GROUP BY subset),
allowed AS (SELECT m.seed, t.subset FROM (SELECT DISTINCT seed FROM {mem}) m
            JOIN truth t ON t.id = m.seed),
ov AS (
    SELECT m.seed, t.subset, CAST(COUNT(*) AS DOUBLE) AS ov
    FROM {mem} m JOIN truth t ON t.id = m.node
    JOIN allowed a ON a.seed = m.seed AND a.subset = t.subset
    GROUP BY m.seed, t.subset
),
metrics AS (
    SELECT o.seed,
           o.ov / (f.fsz + t.tsz - o.ov) AS j,
           o.ov / t.tsz AS recall,
           o.ov / f.fsz AS precision,
           CASE WHEN o.ov > 0
                THEN 2 * (o.ov / f.fsz) * (o.ov / t.tsz)
                     / ((o.ov / f.fsz) + (o.ov / t.tsz))
                ELSE 0.0 END AS f1
    FROM ov o JOIN fs f ON f.seed = o.seed JOIN ts t ON t.subset = o.subset
),
best AS (
    SELECT seed, MAX(j) AS j, MAX(f1) AS f1,
           MAX(precision) AS precision, MAX(recall) AS recall
    FROM metrics GROUP BY seed
)
SELECT f.seed,
       ROUND(COALESCE(b.j, 0.0), 6) + 0.0 AS jaccard,
       ROUND(COALESCE(b.f1, 0.0), 6) + 0.0 AS f1,
       ROUND(COALESCE(b.precision, 0.0), 6) + 0.0 AS precision,
       ROUND(COALESCE(b.recall, 0.0), 6) + 0.0 AS recall
FROM fs f LEFT JOIN best b ON b.seed = f.seed
ORDER BY f.seed"""


def sql_clique_detect() -> str:
    """Largest maximal clique per member vertex (scd/CliqueDetect.cpp
    expandOneCommunity; size ties to the lexicographically smallest member
    list) over the same all-cliques recursive enumeration as
    sql_maximal_cliques."""
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
adjl AS MATERIALIZED (SELECT src AS id, list_sort(list(dst)) AS nbrs FROM uadj GROUP BY src),
cl(members, maxv) AS (
    SELECT [id], id FROM vertices
    UNION ALL
    SELECT list_append(c.members, e.dst), e.dst
    FROM cl c
    JOIN uadj e ON e.src = c.maxv AND e.dst > c.maxv
    JOIN adjl a ON a.id = e.dst
    WHERE list_has_all(a.nbrs, c.members)
),
mx AS (
    SELECT members FROM cl c
    WHERE NOT EXISTS (
        SELECT 1 FROM adjl a
        WHERE list_has_all(a.nbrs, c.members)
          AND NOT list_contains(c.members, a.id)
    )
),
ex AS (SELECT unnest(members) AS seed, members FROM mx),
pick AS (
    SELECT seed, members,
           ROW_NUMBER() OVER (
               PARTITION BY seed ORDER BY len(members) DESC, members
           ) AS rn
    FROM ex
)
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(len(members) AS BIGINT) AS size,
       array_to_string(members, ',') AS clique
FROM pick WHERE rn = 1 ORDER BY seed"""


# ---- Algebraic distance (distance/AlgebraicDistance.cpp) -------------------

def sql_algebraic_distance(
    num_systems: int, num_iters: int, omega: float, norm: int, seed: int = 42
) -> str:
    """Unrolled Jacobi smoothing of hash-derandomized unit loads, per-system
    affine normalization, Lp per-edge distance — same fixed superstep count
    as the engine."""
    from networkit_spark.functions.hashing import md5_long_sql

    cols = [f"x{j}" for j in range(num_systems)]
    unit = float(1 << 48)
    init = ", ".join(
        f"{md5_long_sql(f_expr)} / {unit} AS {c}"
        for j, c in enumerate(cols)
        for f_expr in [f"('{seed}:ad:{j}:' || CAST(id AS STRING))"]
    )
    ctes = [f"l0 AS (SELECT id, {init} FROM vertices)"]
    for t in range(1, num_iters + 1):
        vals = ", ".join(
            f"SUM(e.weight * p.{c}) AS v_{c}" for c in cols
        )
        upd = ", ".join(
            f"CASE WHEN n.ws IS NOT NULL THEN (1 - {omega}) * l.{c} + {omega} * n.v_{c} / n.ws"
            f" ELSE l.{c} END AS {c}"
            for c in cols
        )
        ctes.append(
            f"""n{t} AS (
    SELECT e.src AS id, {vals}, SUM(e.weight) AS ws
    FROM edges e JOIN l{t-1} p ON p.id = e.dst GROUP BY e.src
),
l{t} AS MATERIALIZED (
    SELECT l.id, {upd} FROM l{t-1} l LEFT JOIN n{t} n ON n.id = l.id
)"""
        )
    last = f"l{num_iters}"
    mins = ", ".join(f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}" for c in cols)
    nrm = ", ".join(
        f"(m.mn_{c} - l.{c}) / (m.mn_{c} - m.mx_{c}) AS {c}" for c in cols
    )
    if norm == 0:
        dist = "greatest(" + ", ".join(f"ABS(a.{c} - b.{c})" for c in cols) + ")"
    else:
        s = " + ".join(f"POWER(ABS(a.{c} - b.{c}), {norm})" for c in cols)
        dist = f"POWER({s}, 1.0 / {norm})"
    body = ", ".join(ctes) + f""",
mm AS (SELECT {mins} FROM {last}),
nrm AS (SELECT l.id, {nrm} FROM {last} l, mm m),
fe AS (SELECT DISTINCT src, dst FROM edges WHERE src <= dst)
SELECT f.src, f.dst,
       ROUND(COALESCE(CASE WHEN isnan({dist}) THEN 0.0 ELSE {dist} END, 0.0), 6) + 0.0 AS ad
FROM fe f JOIN nrm a ON a.id = f.src JOIN nrm b ON b.id = f.dst
ORDER BY f.src, f.dst"""
    return _with_graph(body)


def _jl_jacobi_ctes(
    num_systems: int, num_iters: int, omega: float, seed: int = 42
) -> tuple[list, str, list]:
    """Shared CTE chain for the JL-sketch + damped-Jacobi solves backing
    spanning-edge centrality AND approx electrical closeness: per sketch
    j, each canonical edge draws sign +/-1/sqrt(k) from md5(seed, j, src,
    dst); rhs = signed incidence sums; fixed-superstep Jacobi solve.
    Returns (ctes, last_table, solution_cols)."""
    from networkit_spark.functions.hashing import md5_long_sql

    k = num_systems
    r = 1.0 / (k ** 0.5)
    cols = [f"x{j}" for j in range(k)]
    sgn = ", ".join(
        f"CASE WHEN {md5_long_sql(f_expr)} % 2 = 0 THEN {r!r} ELSE {-r!r} END AS s{j}"
        for j in range(k)
        for f_expr in [
            f"(CONCAT('{seed}:sec:{j}:', CAST(src AS STRING), ':', "
            f"CAST(dst AS STRING)))"
        ]
    )
    ctes = [
        "wadj AS MATERIALIZED (SELECT src, dst, weight AS w FROM edges WHERE src <> dst)",
        "dg AS MATERIALIZED (SELECT src AS id, SUM(w) AS d FROM wadj GROUP BY src)",
        f"signs AS MATERIALIZED (SELECT src, dst, {sgn} FROM wadj WHERE src < dst)",
        "ends AS ("
        + " UNION ALL ".join(
            [
                "SELECT src AS id, "
                + ", ".join(f"s{j}" for j in range(k))
                + " FROM signs",
                "SELECT dst AS id, "
                + ", ".join(f"-s{j} AS s{j}" for j in range(k))
                + " FROM signs",
            ]
        )
        + ")",
        "bv AS (SELECT id, "
        + ", ".join(f"SUM(s{j}) AS b{j}" for j in range(k))
        + " FROM ends GROUP BY id)",
        "l0 AS (SELECT v.id, "
        + ", ".join(f"COALESCE(bv.b{j}, 0.0) AS b{j}" for j in range(k))
        + ", "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS {c}" for c in cols)
        + ", dg.d FROM vertices v LEFT JOIN bv ON bv.id = v.id "
        "LEFT JOIN dg ON dg.id = v.id)",
    ]
    bs = ", ".join(f"l.b{j}" for j in range(k))
    for t in range(1, num_iters + 1):
        vals = ", ".join(f"SUM(e.w * p.{c}) AS v_{c}" for c in cols)
        upd = ", ".join(
            f"CASE WHEN l.d IS NOT NULL THEN (1 - {omega}) * l.{c} + {omega} * "
            f"(l.b{j} + COALESCE(n.v_{c}, 0)) / l.d ELSE l.{c} END AS {c}"
            for j, c in enumerate(cols)
        )
        ctes.append(
            f"""n{t} AS (
    SELECT e.src AS id, {vals}
    FROM wadj e JOIN l{t-1} p ON p.id = e.dst GROUP BY e.src
),
l{t} AS MATERIALIZED (
    SELECT l.id, {bs}, {upd}, l.d FROM l{t-1} l LEFT JOIN n{t} n ON n.id = l.id
)"""
        )
    return ctes, f"l{num_iters}", cols


def sql_spanning_edge(
    num_systems: int, num_iters: int, omega: float, seed: int = 42
) -> str:
    """Unrolled JL spanning-edge centrality (SpanningEdgeCentrality.cpp:
    68-104 runApproximation): sec = sum_j diff^2 over the shared sketch
    solves."""
    ctes, last, cols = _jl_jacobi_ctes(num_systems, num_iters, omega, seed)
    score = " + ".join(f"POWER(xu.{c} - xv.{c}, 2)" for c in cols)
    body = (
        ", ".join(ctes)
        + f""" SELECT s.src, s.dst, ROUND({score}, 6) + 0.0 AS sec
FROM signs s JOIN {last} xu ON xu.id = s.src JOIN {last} xv ON xv.id = s.dst
ORDER BY s.src, s.dst"""
    )
    return _with_graph(body)


def sql_electrical_closeness(
    num_systems: int, num_iters: int, omega: float, seed: int = 42
) -> str:
    """Approx electrical closeness over the same sketch solves
    (operators/electrical.py approx_electrical_closeness): the solution
    covariance estimates L+, so diag_v = sum_j x_j[v]^2 and
    score(v) = (n-1) / (n*diag_v + trace) — L+ has zero row sums, so the
    cross term of the farness identity vanishes."""
    ctes, last, cols = _jl_jacobi_ctes(num_systems, num_iters, omega, seed)
    diag = " + ".join(f"POWER(x.{c}, 2)" for c in cols)
    ctes.append(
        f"diagv AS (SELECT x.id, {diag} AS dg FROM {last} x)"
    )
    ctes.append(
        "tr AS (SELECT SUM(dg) AS trace, COUNT(*) AS n FROM diagv)"
    )
    body = (
        ", ".join(ctes)
        + """ SELECT d.id,
       ROUND((t.n - 1) / (t.n * d.dg + t.trace), 6) + 0.0 AS score
FROM diagv d CROSS JOIN tr t
ORDER BY d.id"""
    )
    return _with_graph(body)


# ---- All simple paths (reachability/AllSimplePaths.cpp) --------------------

def sql_all_simple_paths(source: int, target: int, cutoff: int) -> str:
    """Recursive simple-path enumeration with list-membership pruning —
    structurally independent of the engine's frontier-array extension with
    reverse-BFS pruning; identical path set."""
    return f"""WITH RECURSIVE {DIGRAPH_CTE.strip()},
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM dedges WHERE src <> dst),
paths(path, last, len) AS (
    SELECT [CAST({source} AS BIGINT)], CAST({source} AS BIGINT), 0
    UNION ALL
    SELECT list_append(p.path, e.dst), e.dst, p.len + 1
    FROM paths p JOIN de e ON e.src = p.last
    WHERE p.len < {cutoff} AND p.last <> {target}
      AND NOT list_contains(p.path, e.dst)
)
SELECT array_to_string(path, ',') AS path, CAST(len AS BIGINT) AS hops
FROM paths WHERE last = {target} ORDER BY path"""


# ---- Per-edge distance scores (distance/JaccardDistance.cpp,
# distance/AdamicAdarDistance.cpp) -------------------------------------------

def sql_edge_distances() -> str:
    """Jaccard distance 1 - t/(du+dv-t) and Adamic-Adar distance
    1/sum_{w in tri(u,v)} 1/ln(deg(w)) per canonical simple edge (NULL
    where triangle-free), simple-support degrees."""
    return _with_graph(f"""{TRI_CTE.strip()},
tri_edges AS (
    SELECT least(a, b) AS u, greatest(a, b) AS v, c AS w FROM tri
    UNION ALL SELECT least(a, c), greatest(a, c), b FROM tri
    UNION ALL SELECT least(b, c), greatest(b, c), a FROM tri
),
sdeg AS (SELECT a AS id, count(*) AS deg FROM und GROUP BY a),
aa AS (
    SELECT t.u, t.v, SUM(1.0 / ln(CAST(d.deg AS DOUBLE))) AS aa,
           COUNT(*) AS tri
    FROM tri_edges t JOIN sdeg d ON d.id = t.w
    GROUP BY t.u, t.v
)
SELECT s.u AS src, s.v AS dst,
       ROUND(1.0 - COALESCE(a.tri, 0) / (du.deg + dv.deg - COALESCE(a.tri, 0)), 6)
         + 0.0 AS jd,
       ROUND(CASE WHEN a.aa > 0 THEN 1.0 / a.aa END, 6) + 0.0 AS aa_dist
FROM simple s
JOIN sdeg du ON du.id = s.u
JOIN sdeg dv ON dv.id = s.v
LEFT JOIN aa a ON a.u = s.u AND a.v = s.v
ORDER BY src, dst""")


# ---- Group degree (centrality/GroupDegree.cpp) -----------------------------

def sql_group_degree(k: int) -> str:
    """Unrolled k-step greedy max-coverage over the closed neighborhood —
    same deterministic (gain DESC, id ASC) pick rule as the engine."""
    ctes = [
        "usim AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        """adjc AS MATERIALIZED (
    SELECT src AS u, dst AS v FROM usim
    UNION SELECT id, id FROM vertices
)""",
        "cov0 AS (SELECT id FROM vertices WHERE FALSE)",
        "grp0 AS (SELECT id, 0 AS rnk, CAST(0 AS BIGINT) AS gain FROM vertices WHERE FALSE)",
    ]
    for t in range(1, k + 1):
        ctes.append(
            f"""gain{t} AS (
    SELECT ver.id AS u, COALESCE(c.cnt, 0) AS gain
    FROM vertices ver
    LEFT JOIN (
        SELECT a.u, CAST(COUNT(*) AS BIGINT) AS cnt FROM adjc a
        WHERE NOT EXISTS (SELECT 1 FROM cov{t-1} c WHERE c.id = a.v)
        GROUP BY a.u
    ) c ON c.u = ver.id
    WHERE NOT EXISTS (SELECT 1 FROM grp{t-1} g WHERE g.id = ver.id)
),
pick{t} AS (SELECT u AS id, {t} AS rnk, gain FROM gain{t} ORDER BY gain DESC, u ASC LIMIT 1),
grp{t} AS (SELECT * FROM grp{t-1} UNION ALL SELECT * FROM pick{t}),
cov{t} AS MATERIALIZED (
    SELECT id FROM cov{t-1}
    UNION
    SELECT a.v FROM adjc a JOIN pick{t} p ON p.id = a.u
)"""
        )
    body = ", ".join(ctes) + f"""
SELECT CAST(rnk AS BIGINT) AS rank, id, gain FROM grp{k} ORDER BY rank"""
    return _with_graph(body)


def sql_maxflow(k: int, s: int, t: int) -> str:
    """Max s-t flow on the induced subgraph of dense ids < k, computed as
    the MIN CUT over all 2^k source-side subsets (max-flow/min-cut
    duality) — structurally independent of the engine's augmenting-path
    loop. With symmetric edge storage, summing stored arcs leaving the
    source side counts each crossing undirected edge exactly once.
    source_set_size is the popcount of the minimum-popcount min-cut mask:
    min cuts are closed under intersection, so that mask is unique and
    equals the residual-reachable source set EdmondsKarp reports
    (flow/EdmondsKarp.cpp:99-121)."""
    body = f"""sub AS MATERIALIZED (
    SELECT src, dst, SUM(weight) AS cap FROM edges
    WHERE src < {k} AND dst < {k} AND src <> dst GROUP BY 1, 2
),
cuts AS MATERIALIZED (
    SELECT m.mask, COALESCE(SUM(e.cap), 0) AS cut
    FROM (
        SELECT i AS mask FROM range({1 << k}) r(i)
        WHERE ((i >> {s}) & 1) = 1 AND ((i >> {t}) & 1) = 0
    ) m
    LEFT JOIN sub e
      ON ((m.mask >> e.src) & 1) = 1 AND ((m.mask >> e.dst) & 1) = 0
    GROUP BY m.mask
)
SELECT CAST(MIN(cut) AS DOUBLE) AS max_flow,
       CAST((SELECT MIN(bit_count(mask)) FROM cuts
             WHERE cut = (SELECT MIN(cut) FROM cuts)) AS BIGINT)
           AS source_set_size
FROM cuts"""
    return _with_graph(body)


def sql_graph_diff() -> str:
    """Edit script from the even-event_id snapshot to the full graph —
    a second pair derivation over the filtered events, mapped through the
    SAME dict (keys of the subset are a subset of the full key set), then
    a full join of the two canonical weighted edge sets
    (dynamics/GraphDifference.cpp:19-140 semantics; no node events since
    both snapshots share the vertex set)."""
    body = """ev1 AS (
    SELECT user_id, event_type, ts, event_id FROM events WHERE event_id % 2 = 0
),
pair_rows1 AS (
    SELECT 'user:' || CAST(user_id AS VARCHAR) AS a,
           'etype:' || event_type AS b
    FROM ev1
    UNION ALL
    SELECT 'etype:' || prev AS a, 'etype:' || event_type AS b
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM ev1
    ) WHERE prev IS NOT NULL
),
pairs1 AS (
    SELECT least(a, b) AS src_key, greatest(a, b) AS dst_key,
           CAST(count(*) AS DOUBLE) AS weight
    FROM pair_rows1 GROUP BY 1, 2
),
e1 AS (
    SELECT da.id AS src, db.id AS dst, p.weight AS w1
    FROM pairs1 p
    JOIN dict da ON da.key = p.src_key
    JOIN dict db ON db.key = p.dst_key
),
e2 AS (SELECT src, dst, weight AS w2 FROM half),
j AS (
    SELECT COALESCE(e1.src, e2.src) AS src, COALESCE(e1.dst, e2.dst) AS dst, w1, w2
    FROM e1 FULL JOIN e2 ON e1.src = e2.src AND e1.dst = e2.dst
)
SELECT 'EDGE_REMOVE' AS etype, src AS u, dst AS v, CAST(NULL AS DOUBLE) AS w
FROM j WHERE w2 IS NULL
UNION ALL
SELECT 'EDGE_ADD' AS etype, src AS u, dst AS v, w2 AS w FROM j WHERE w1 IS NULL
UNION ALL
SELECT 'EDGE_WEIGHT_UPDATE' AS etype, src AS u, dst AS v, w2 AS w
FROM j WHERE w1 IS NOT NULL AND w2 IS NOT NULL AND w1 <> w2"""
    return _with_graph(body)


def sql_degree_histogram() -> str:
    """Unweighted non-loop degree histogram of the ORIGINAL graph — the
    exact invariant edge switching preserves (EdgeSwitching.cpp swapEdge
    never touches degrees), so it doubles as that query's oracle."""
    body = """nd AS (
    SELECT src AS id, COUNT(*) AS deg FROM edges WHERE src <> dst GROUP BY src
)
SELECT CAST(deg AS BIGINT) AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM nd GROUP BY deg"""
    return _with_graph(body)


def sql_commute_time(
    pairs: list[tuple[int, int]], iters: int, omega: float
) -> str:
    """Unrolled damped-Jacobi Laplacian solve, one x-column per pair, then
    ctd = sqrt(|x_u - x_v| * vol) (CommuteTimeDistance.cpp:172-189) —
    the same fixed superstep count as the engine's electrical.py."""
    k = len(pairs)
    cols = [f"x{j}" for j in range(k)]
    binit = ", ".join(
        f"CASE WHEN v.id = {int(u)} THEN 1.0 WHEN v.id = {int(v)} THEN -1.0 "
        f"ELSE 0.0 END AS b{j}"
        for j, (u, v) in enumerate(pairs)
    )
    xinit = ", ".join(f"CAST(0.0 AS DOUBLE) AS {c}" for c in cols)
    ctes = [
        "wadj AS MATERIALIZED (SELECT src, dst, weight AS w FROM edges WHERE src <> dst)",
        "dg AS MATERIALIZED (SELECT src AS id, SUM(w) AS d FROM wadj GROUP BY src)",
        "vol AS (SELECT SUM(weight) + SUM(CASE WHEN src = dst THEN weight "
        "ELSE 0 END) AS v FROM edges)",
        f"l0 AS (SELECT v.id, {binit}, {xinit}, dg.d "
        "FROM vertices v LEFT JOIN dg ON dg.id = v.id)",
    ]
    bs = ", ".join(f"l.b{j}" for j in range(k))
    for t in range(1, iters + 1):
        vals = ", ".join(f"SUM(e.w * p.{c}) AS v_{c}" for c in cols)
        upd = ", ".join(
            f"CASE WHEN l.d IS NOT NULL THEN (1 - {omega}) * l.{c} + {omega} * "
            f"(l.b{j} + COALESCE(n.v_{c}, 0)) / l.d ELSE l.{c} END AS {c}"
            for j, c in enumerate(cols)
        )
        ctes.append(
            f"""n{t} AS (
    SELECT e.src AS id, {vals}
    FROM wadj e JOIN l{t-1} p ON p.id = e.dst GROUP BY e.src
),
l{t} AS MATERIALIZED (
    SELECT l.id, {bs}, {upd}, l.d FROM l{t-1} l LEFT JOIN n{t} n ON n.id = l.id
)"""
        )
    last = f"l{iters}"
    outs = " UNION ALL ".join(
        f"SELECT CAST({int(u)} AS BIGINT) AS u, CAST({int(v)} AS BIGINT) AS v, "
        f"ROUND(SQRT(ABS((SELECT {c} FROM {last} WHERE id = {int(u)}) - "
        f"(SELECT {c} FROM {last} WHERE id = {int(v)})) * "
        f"(SELECT v FROM vol)), 6) AS ctd"
        for (u, v), c in zip(pairs, cols)
    )
    return _with_graph(", ".join(ctes) + " " + outs)


def sql_ged_walk(k: int, alpha: float, levels: int, pool_size: int) -> str:
    """Unrolled greedy GedWalk (GedWalk.cpp semantics, pinned
    levels/pool): per round, per candidate slot, `levels` masked LONG
    matvec supersteps count walks avoiding S + slot; damped totals are
    fixed-order double sums of exact integers, so the greedy comparisons
    are bit-identical to the engine."""
    slots = list(range(1, pool_size + 1))
    aL = [repr(alpha ** lvl) for lvl in range(1, levels + 1)]

    def sid(j: int) -> str:
        return f"(SELECT id FROM pool WHERE rn = {j})"

    ctes = [
        "ue AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "dg AS (SELECT src AS id, COUNT(*) AS d FROM ue GROUP BY src)",
        "pool AS MATERIALIZED (SELECT id, ROW_NUMBER() OVER "
        "(ORDER BY d DESC, id) AS rn FROM dg)",
    ]
    out_rows = []
    wall = " + ".join(
        f"{aL[lvl-1]} * (SELECT wg FROM w1_{lvl})" for lvl in range(1, levels + 1)
    )
    for r in range(1, k + 1):
        picked = [f"(SELECT id FROM pick{p})" for p in range(1, r)]

        def mask(j: int) -> str:
            terms = [f"v.id = {sid(j)}"] + [f"v.id = {p}" for p in picked]
            return " OR ".join(terms)

        gcols = ", CAST(1 AS BIGINT) AS g" if r == 1 else ""
        init = ", ".join(
            f"CASE WHEN {mask(j)} THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) "
            f"END AS x{j}"
            for j in slots
        )
        ctes.append(f"st{r}_0 AS (SELECT v.id, {init}{gcols} FROM vertices v)")
        for lvl in range(1, levels + 1):
            vals = ", ".join(f"SUM(p.x{j}) AS v_x{j}" for j in slots)
            gval = ", SUM(p.g) AS v_g" if r == 1 else ""
            upd = ", ".join(
                f"CASE WHEN {mask(j)} THEN CAST(0 AS BIGINT) "
                f"ELSE COALESCE(n.v_x{j}, 0) END AS x{j}"
                for j in slots
            )
            gupd = ", COALESCE(n.v_g, 0) AS g" if r == 1 else ""
            gw = ", SUM(g) AS wg" if r == 1 else ""
            ctes.append(
                f"""n{r}_{lvl} AS (
    SELECT e.src AS id, {vals}{gval}
    FROM ue e JOIN st{r}_{lvl-1} p ON p.id = e.dst GROUP BY e.src
),
st{r}_{lvl} AS MATERIALIZED (
    SELECT v.id, {upd}{gupd}
    FROM vertices v LEFT JOIN n{r}_{lvl} n ON n.id = v.id
),
w{r}_{lvl} AS (SELECT {", ".join(f"SUM(x{j}) AS w{j}" for j in slots)}{gw} FROM st{r}_{lvl})"""
            )

        def total(j: int) -> str:
            return " + ".join(
                f"{aL[lvl-1]} * (SELECT w{j} FROM w{r}_{lvl})"
                for lvl in range(1, levels + 1)
            )

        branches = " UNION ALL ".join(
            f"SELECT {sid(j)} AS id, {total(j)} AS total" for j in slots
        )
        not_in = (
            " AND c.id NOT IN (" + ", ".join(picked) + ")" if picked else ""
        )
        ctes.append(
            f"""pick{r} AS MATERIALIZED (
    SELECT c.id, c.total FROM ({branches}) c
    WHERE c.id IS NOT NULL{not_in}
    ORDER BY c.total, c.id LIMIT 1
)"""
        )
        out_rows.append(
            f"SELECT CAST({r} AS BIGINT) AS rank, CAST(id AS BIGINT) AS id, "
            f"ROUND(({wall}) - total, 6) + 0.0 AS ged_score FROM pick{r}"
        )
    return _with_graph(", ".join(ctes) + " " + " UNION ALL ".join(out_rows))


def sql_group_swaps(k: int, rounds: int, seed: int = 42) -> str:
    """Unrolled deterministic grow-shrink local swaps
    (GroupClosenessGrowShrink.cpp / GroupClosenessLocalSwaps.cpp role):
    per round, the single best strictly-improving (out, in) swap over the
    recursive-ball APSP, ties (out, in) ascending — same md5-ranked
    initial group, top-2 removal trick and penalty-n convention as the
    engine."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(f"('{seed}:gsw:' || CAST(id AS STRING))")
    base = f"""sedges AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM edges WHERE src <> dst
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices),
ball(s, v, d) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM vertices
    UNION
    SELECT b.s, e.dst, b.d + 1 FROM ball b JOIN sedges e ON e.src = b.v
    WHERE b.d + 1 <= (SELECT n FROM nn)
),
apsp AS MATERIALIZED (SELECT s, v AS t, MIN(d) AS dist FROM ball GROUP BY s, v),
gmem0 AS (
    SELECT id AS s FROM (
        SELECT id, ROW_NUMBER() OVER (ORDER BY {h}, id) AS r FROM vertices
    ) WHERE r <= {k}
)"""
    ctes = [base]
    for r in range(1, rounds + 1):
        p = f"gmem{r-1}"
        ctes.append(
            f"""t2_{r} AS (
    SELECT t,
           MIN(CASE WHEN rn = 1 THEN dist END) AS gd1,
           MIN(CASE WHEN rn = 1 THEN s END) AS arg1,
           MIN(CASE WHEN rn = 2 THEN dist END) AS gd2
    FROM (
        SELECT d.t, d.s, d.dist,
               ROW_NUMBER() OVER (PARTITION BY d.t ORDER BY d.dist, d.s) AS rn
        FROM apsp d JOIN {p} m ON m.s = d.s
    ) WHERE rn <= 2 GROUP BY t
),
ex{r} AS (
    SELECT m.s AS x, v.id AS t,
           COALESCE(CASE WHEN w.arg1 = m.s THEN w.gd2 ELSE w.gd1 END,
                    (SELECT n FROM nn)) AS ex
    FROM {p} m CROSS JOIN vertices v
    LEFT JOIN t2_{r} w ON w.t = v.id
),
bs{r} AS (SELECT x, SUM(ex) AS base FROM ex{r} GROUP BY x),
cf{r} AS (
    SELECT SUM(COALESCE(w.gd1, (SELECT n FROM nn))) AS far
    FROM vertices v LEFT JOIN t2_{r} w ON w.t = v.id
),
dl{r} AS (
    SELECT e.x, d.s AS y, SUM(d.dist - e.ex) AS delta
    FROM apsp d JOIN ex{r} e ON e.t = d.t
    WHERE d.dist < e.ex AND d.s NOT IN (SELECT s FROM {p})
    GROUP BY e.x, d.s
),
pk{r} AS MATERIALIZED (
    SELECT x, y, nf FROM (
        SELECT l.x, l.y, b.base + l.delta AS nf
        FROM dl{r} l JOIN bs{r} b ON b.x = l.x
    ) WHERE nf < (SELECT far FROM cf{r})
    ORDER BY nf, x, y LIMIT 1
),
gmem{r} AS MATERIALIZED (
    SELECT s FROM {p}
    WHERE NOT EXISTS (SELECT 1 FROM pk{r} k WHERE k.x = {p}.s)
    UNION ALL
    SELECT y FROM pk{r}
)"""
        )
    outs = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, CAST(x AS BIGINT) AS out_id, "
        f"CAST(y AS BIGINT) AS in_id, CAST(nf AS BIGINT) AS farness FROM pk{r}"
        for r in range(1, rounds + 1)
    )
    return (
        f"WITH RECURSIVE {GRAPH_CTE.strip()}, "
        + ", ".join(ctes)
        + " "
        + outs
    )


def sql_group_harmonic(k: int) -> str:
    """Unrolled k-step greedy group-harmonic-closeness over the same
    recursive-ball APSP base as sql_group_closeness
    (GroupHarmonicCloseness.cpp greedy semantics: maximize the marginal
    gain of sum_{t not in S} 1/d(S,t), unreachable -> 0, gains quantized
    to 9 decimals before the argmax, ties to smallest id)."""
    base = """sedges AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM edges WHERE src <> dst
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices),
ball(s, v, d) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM vertices
    UNION
    SELECT b.s, e.dst, b.d + 1 FROM ball b JOIN sedges e ON e.src = b.v
    WHERE b.d + 1 <= (SELECT n FROM nn)
),
apsp AS MATERIALIZED (SELECT s, v AS t, MIN(d) AS dist FROM ball GROUP BY s, v),
ghd0 AS (SELECT id AS t, CAST(NULL AS DOUBLE) AS gd FROM vertices),
sc0 AS (SELECT CAST(0.0 AS DOUBLE) AS sc)"""
    ctes = [base]
    for t in range(1, k + 1):
        excl_t = (
            " AND d.t NOT IN ("
            + " UNION ALL ".join(f"SELECT id FROM pick{j}" for j in range(1, t))
            + ")"
            if t > 1
            else ""
        )
        excl_v = (
            " WHERE v.id NOT IN ("
            + " UNION ALL ".join(f"SELECT id FROM pick{j}" for j in range(1, t))
            + ")"
            if t > 1
            else ""
        )
        ctes.append(
            f"""del{t} AS (
    SELECT d.s AS id,
           SUM(1.0 / LEAST(COALESCE(g.gd, 1e18), CAST(d.dist AS DOUBLE))
               - CASE WHEN g.gd > 0 THEN 1.0 / g.gd ELSE 0.0 END) AS delta
    FROM apsp d JOIN ghd{t-1} g ON g.t = d.t
    WHERE d.dist > 0{excl_t}
    GROUP BY d.s
),
own{t} AS (SELECT t AS id, CASE WHEN gd > 0 THEN 1.0 / gd ELSE 0.0 END AS own FROM ghd{t-1}),
pick{t} AS MATERIALIZED (
    SELECT v.id, COALESCE(dl.delta, 0.0) - COALESCE(o.own, 0.0) AS gain
    FROM vertices v
    LEFT JOIN del{t} dl ON dl.id = v.id
    LEFT JOIN own{t} o ON o.id = v.id{excl_v}
    ORDER BY ROUND(COALESCE(dl.delta, 0.0) - COALESCE(o.own, 0.0), 9) DESC, v.id
    LIMIT 1
),
ghd{t} AS MATERIALIZED (
    SELECT g.t,
           COALESCE(LEAST(g.gd, d.dist), g.gd, d.dist) AS gd
    FROM ghd{t-1} g LEFT JOIN (
        SELECT t, CAST(dist AS DOUBLE) AS dist FROM apsp
        WHERE s = (SELECT id FROM pick{t})
    ) d ON d.t = g.t
),
sc{t} AS (SELECT (SELECT sc FROM sc{t-1}) + (SELECT gain FROM pick{t}) AS sc)"""
        )
    outs = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, CAST(id AS BIGINT) AS id, "
        f"ROUND((SELECT sc FROM sc{t}), 6) + 0.0 AS score FROM pick{t}"
        for t in range(1, k + 1)
    )
    return f"WITH RECURSIVE {GRAPH_CTE.strip()}, " + ", ".join(ctes) + " " + outs


def sql_group_closeness(k: int) -> str:
    """Unrolled k-step greedy farness minimization over a recursive-ball
    APSP, unreachable targets penalized at distance n — the same
    deterministic greedy (ties to smallest id) as operators/groups.py
    group_closeness (GroupCloseness.cpp:83-207 semantics)."""
    base = """sedges AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM edges WHERE src <> dst
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vertices),
ball(s, v, d) AS (
    SELECT id, id, CAST(0 AS BIGINT) FROM vertices
    UNION
    SELECT b.s, e.dst, b.d + 1 FROM ball b JOIN sedges e ON e.src = b.v
    WHERE b.d + 1 <= (SELECT n FROM nn)
),
apsp AS MATERIALIZED (SELECT s, v AS t, MIN(d) AS dist FROM ball GROUP BY s, v),
gd0 AS (SELECT id AS t, (SELECT n FROM nn) AS gd FROM vertices),
tot0 AS (SELECT (SELECT n FROM nn) * (SELECT n FROM nn) AS total)"""
    ctes = [base]
    for t in range(1, k + 1):
        excl = (
            " WHERE v.id NOT IN ("
            + " UNION ALL ".join(f"SELECT id FROM pick{j}" for j in range(1, t))
            + ")"
            if t > 1
            else ""
        )
        ctes.append(
            f"""cand{t} AS (
    SELECT d.s AS id, SUM(LEAST(d.dist, g.gd) - g.gd) AS delta
    FROM apsp d JOIN gd{t-1} g ON g.t = d.t GROUP BY d.s
),
pick{t} AS MATERIALIZED (
    SELECT v.id, (SELECT total FROM tot{t-1}) + COALESCE(c.delta, 0) AS farness
    FROM vertices v LEFT JOIN cand{t} c ON c.id = v.id{excl}
    ORDER BY farness, v.id LIMIT 1
),
gd{t} AS MATERIALIZED (
    SELECT g.t, LEAST(g.gd, COALESCE(d.dist, g.gd)) AS gd
    FROM gd{t-1} g LEFT JOIN (
        SELECT t, dist FROM apsp WHERE s = (SELECT id FROM pick{t})
    ) d ON d.t = g.t
),
tot{t} AS (SELECT farness AS total FROM pick{t})"""
        )
    outs = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, CAST(id AS BIGINT) AS id, "
        f"CAST(farness AS BIGINT) AS farness FROM pick{t}"
        for t in range(1, k + 1)
    )
    return f"WITH RECURSIVE {GRAPH_CTE.strip()}, " + ", ".join(ctes) + " " + outs


def sql_graph_structural_rand(lp_iters: int, lp_iters_b: int) -> str:
    """1 - (e11+e00)/m over canonical edges between the two pinned-LP
    partitions (GraphStructuralRandMeasure.cpp:13-38)."""
    assert lp_iters_b < lp_iters
    inner, last = _lp_inner(lp_iters)
    a, b = last, f"lp{lp_iters_b}"
    return f"""WITH {inner},
ce AS (SELECT src, dst FROM edges WHERE src <= dst)
SELECT ROUND(1.0 - SUM(CASE
        WHEN a1.label = a2.label AND b1.label = b2.label THEN 1
        WHEN a1.label <> a2.label AND b1.label <> b2.label THEN 1
        ELSE 0 END) * 1.0 / COUNT(*), 6) + 0.0 AS graph_structural_rand
FROM ce
JOIN {a} a1 ON a1.id = ce.src JOIN {a} a2 ON a2.id = ce.dst
JOIN {b} b1 ON b1.id = ce.src JOIN {b} b2 ON b2.id = ce.dst"""


def sql_cover_hub_dominance(lp_iters: int, cc_iters: int, offset: int) -> str:
    """Hub dominance per subset of the deterministic overlapping cover
    built from pinned-LP subsets plus component subsets shifted by
    ``offset`` (CoverHubDominance.cpp:9-75 semantics: internal degree
    counts neighbors sharing the subset)."""
    inner, lp_last = _lp_inner(lp_iters)
    body = f"""{inner},
{", ".join(_cc_ctes(cc_iters))},
cover AS MATERIALIZED (
    SELECT id, label AS subset FROM {lp_last}
    UNION ALL
    SELECT id, label + {offset} AS subset FROM cc{cc_iters}
),
internal AS (
    SELECT e.src AS id, ms.subset, COUNT(*) AS d
    FROM edges e
    JOIN cover ms ON ms.id = e.src
    WHERE EXISTS (
        SELECT 1 FROM cover md WHERE md.id = e.dst AND md.subset = ms.subset
    )
    GROUP BY e.src, ms.subset
),
per_member AS (
    SELECT c.subset, COALESCE(i.d, 0) AS d
    FROM cover c LEFT JOIN internal i ON i.id = c.id AND i.subset = c.subset
)
SELECT subset, CAST(COUNT(*) AS BIGINT) AS size,
       ROUND(CASE WHEN COUNT(*) > 1
                  THEN MAX(d) * 1.0 / (COUNT(*) - 1) ELSE 1.0 END, 6)
           AS hub_dominance
FROM per_member GROUP BY subset"""
    return f"WITH {body}"


def sql_partition_fragmentation(lp_iters: int, cc_iters: int) -> str:
    """Per-cluster fragmentation of the pinned-LP partition against global
    unrolled-CC components (PartitionFragmentation.cpp:7-62)."""
    inner, lp_last = _lp_inner(lp_iters)
    body = f"""{inner},
{", ".join(_cc_ctes(cc_iters))},
ints AS (
    SELECT l.label, c.label AS clabel, COUNT(*) AS isz
    FROM {lp_last} l JOIN cc{cc_iters} c ON c.id = l.id
    GROUP BY 1, 2
)
SELECT label, CAST(SUM(isz) AS BIGINT) AS size,
       ROUND(1.0 - MAX(isz) * 1.0 / SUM(isz), 6) AS fragmentation
FROM ints GROUP BY label"""
    return f"WITH {body}"


def sql_overlapping_nmi(cc_iters: int, offset: int) -> str:
    """MAX-normalized overlapping NMI distance
    (OverlappingNMIDistance.cpp:36-269) between cover X = LP(1) subsets +
    offset components and cover Y = LP(2) as a cover — the full
    adjusted-conditional-entropy formula in SQL, same MAX normalization
    and H(Xi) initialization as the engine."""
    inner, lp_last = _lp_inner(2)

    def H(e):
        return f"(CASE WHEN ({e}) > 0 THEN -(CAST({e} AS DOUBLE)) * log2(CAST({e} AS DOUBLE) / (SELECT n FROM nn)) ELSE 0.0 END)"

    def ENT(sz):
        return f"({H(sz)} + {H(f'(SELECT n FROM nn) - ({sz})')})"

    body = f"""{inner},
{", ".join(_cc_ctes(cc_iters))},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM vertices),
cx AS MATERIALIZED (
    SELECT id, label AS subset FROM lp1
    UNION ALL SELECT id, label + {offset} FROM cc{cc_iters}
),
cy AS MATERIALIZED (SELECT id, label AS subset FROM {lp_last}),
sx AS MATERIALIZED (SELECT subset AS i, COUNT(*) AS szx FROM cx GROUP BY 1),
sy AS MATERIALIZED (SELECT subset AS j, COUNT(*) AS szy FROM cy GROUP BY 1),
inter AS MATERIALIZED (
    SELECT x.subset AS i, y.subset AS j, COUNT(*) AS isz, sx.szx, sy.szy
    FROM cx x JOIN cy y ON y.id = x.id
    JOIN sx ON sx.i = x.subset JOIN sy ON sy.j = y.subset
    GROUP BY 1, 2, sx.szx, sy.szy
),
adj AS (
    SELECT i, j,
      CASE WHEN {H("(SELECT n FROM nn) + isz - szx - szy")} + {H("isz")}
             >= {H("szy - isz")} + {H("szx - isz")}
           THEN ({H("(SELECT n FROM nn) + isz - szx - szy")} + {H("szy - isz")}
               + {H("szx - isz")} + {H("isz")}) - {ENT("szy")}
           ELSE {ENT("szx")} END AS vx,
      CASE WHEN {H("(SELECT n FROM nn) + isz - szx - szy")} + {H("isz")}
             >= {H("szy - isz")} + {H("szx - isz")}
           THEN ({H("(SELECT n FROM nn) + isz - szx - szy")} + {H("szy - isz")}
               + {H("szx - isz")} + {H("isz")}) - {ENT("szx")}
           ELSE {ENT("szy")} END AS vy
    FROM inter
),
condx AS (
    SELECT SUM(v) AS v FROM (
        SELECT k, MIN(v) AS v FROM (
            SELECT i AS k, vx AS v FROM adj
            UNION ALL SELECT i AS k, {ENT("szx")} AS v FROM sx
        ) GROUP BY k
    )
),
condy AS (
    SELECT SUM(v) AS v FROM (
        SELECT k, MIN(v) AS v FROM (
            SELECT j AS k, vy AS v FROM adj
            UNION ALL SELECT j AS k, {ENT("szy")} AS v FROM sy
        ) GROUP BY k
    )
),
ents AS (
    SELECT (SELECT SUM({ENT("szx")}) FROM sx) AS ex,
           (SELECT SUM({ENT("szy")}) FROM sy) AS ey
),
mi AS (
    SELECT 0.5 * (e.ex - cx2.v + e.ey - cy2.v) AS m, e.ex, e.ey
    FROM ents e, condx cx2, condy cy2
)
SELECT ROUND(1.0 - LEAST(1.0, GREATEST(0.0,
         m / GREATEST(ex, ey))), 6) + 0.0 AS onmi_distance
FROM mi"""
    return f"WITH {body}"


def sql_hash_overlap(lp_iters: int, cc_iters: int) -> str:
    """Hashed overlap of the LP and CC partitions — the k == 2 path of
    overlap/HashingOverlapper.cpp:45-64: key = ((lp ^ 0xffff) << 16) |
    (cc ^ 0xffff) in the fork's uint32 count type, label = djb2 over the
    key's little-endian bytes stopping at the first ZERO byte (lines
    19-27), cells canonicalized to min member id (the reference
    compact()s, so only cell structure is observable). Keys are < 2^32
    (dense ids mirror the fork's uint32 node type), so at most 4 bytes are
    live and the running hash peaks below 2^40 — plain BIGINT arithmetic,
    no wraparound needed."""
    h = "5381"
    alive: list[str] = []
    for i in range(4):
        b = f"((key // {256 ** i}) % 256)"
        alive.append(f"{b} <> 0")
        cond = " AND ".join(alive)
        h = f"(CASE WHEN {cond} THEN ({h}) * 33 + {b} ELSE ({h}) END)"
    body = f"""{', '.join(_lp_ctes(lp_iters))},
{', '.join(_cc_ctes(cc_iters))},
keys AS MATERIALIZED (
    SELECT l.id,
           ((xor(l.label, 65535) % 65536) * 65536 | xor(c.label, 65535)) AS key
    FROM lp{lp_iters} l JOIN cc{cc_iters} c ON c.id = l.id
),
hashed AS MATERIALIZED (SELECT id, {h} AS h FROM keys)
SELECT o.id, r.label
FROM hashed o
JOIN (SELECT h, MIN(id) AS label FROM hashed GROUP BY h) r USING (h)
ORDER BY o.id"""
    return _with_graph(body)


def sql_spectral_bisection(iters: int, seed: int = 42) -> str:
    """Unrolled deflated power iteration on M = cI - L (c = Anderson-
    Morley edge bound), sign-canonicalized, rounded to 6, then the
    balanced split at the floor(n/2)-th smallest (f, id) value — the
    exact replay of operators/spectral.py."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(f"('{seed}:fv:' || CAST(id AS STRING))")
    ctes = [
        """se AS MATERIALIZED (
    SELECT src, dst, CAST(weight AS DOUBLE) AS w FROM edges WHERE src <> dst
)""",
        """wd AS MATERIALIZED (
    SELECT v.id, COALESCE(s.wd, 0.0) AS wd
    FROM vertices v LEFT JOIN (
        SELECT dst AS id, SUM(w) AS wd FROM se GROUP BY dst
    ) s ON s.id = v.id
)""",
        """cb AS (
    SELECT COALESCE(MAX(a.wd + b.wd), 1.0) AS c
    FROM se e JOIN wd a ON a.id = e.src JOIN wd b ON b.id = e.dst
)""",
        f"fx0 AS (SELECT id, ({h} / 281474976710656.0 - 0.5) AS x FROM vertices)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""fy{k} AS MATERIALIZED (
    SELECT x.id, ((SELECT c FROM cb) - w.wd) * x.x + COALESCE(m.mass, 0.0) AS y
    FROM fx{k-1} x JOIN wd w ON w.id = x.id
    LEFT JOIN (
        SELECT e.dst AS id, SUM(p.x * e.w) AS mass
        FROM se e JOIN fx{k-1} p ON p.id = e.src GROUP BY e.dst
    ) m ON m.id = x.id
),
fs{k} AS (
    SELECT AVG(y) AS mu,
           COALESCE(NULLIF(sqrt(GREATEST(SUM(y*y) - count(*) * AVG(y) * AVG(y),
                                         0.0)), 0.0), 1.0) AS nrm
    FROM fy{k}
),
fx{k} AS MATERIALIZED (
    SELECT id, (y - (SELECT mu FROM fs{k})) / (SELECT nrm FROM fs{k}) AS x
    FROM fy{k}
)"""
        )
    tail = f""",
sgn AS (
    SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
    FROM fx{iters} WHERE abs(x) > 1e-12 ORDER BY id LIMIT 1
),
fv AS MATERIALIZED (
    SELECT id, ROUND(x * COALESCE((SELECT s FROM sgn), 1.0), 6) + 0.0 AS f
    FROM fx{iters}
),
spl AS (
    SELECT f AS split FROM (
        SELECT f, row_number() OVER (ORDER BY f, id) AS rn FROM fv
    ) WHERE rn = (SELECT count(*) // 2 + 1 FROM fv)
)
SELECT id, f,
       CAST(CASE WHEN f < (SELECT split FROM spl) THEN 0 ELSE 1 END AS BIGINT)
           AS label
FROM fv ORDER BY id"""
    return _with_graph(", ".join(ctes) + tail)


def sql_bfs_sample(iters: int, k: int, source: int = 0) -> str:
    """Induced edges of the k (dist, id)-closest nodes to ``source``."""
    inner = ", ".join(_bfs_ctes(iters, source))
    return _with_graph(f"""{inner},
sel AS MATERIALIZED (
    SELECT id FROM (
        SELECT id, row_number() OVER (ORDER BY dist, id) AS rn FROM b{iters}
    ) WHERE rn <= {k}
)
SELECT e.src, e.dst, CAST(e.weight AS DOUBLE) AS weight
FROM edges e
JOIN sel a ON a.id = e.src
JOIN sel b ON b.id = e.dst
ORDER BY e.src, e.dst""")


def sql_degree_gini() -> str:
    """Gini of degree / weighted degree: G = 2*sum(i*x_(i))/(n*S)-(n+1)/n."""
    return _with_graph(f"""{DEG_CTE.strip()},
rk AS (
    SELECT CAST(degree AS DOUBLE) AS d, CAST(wdeg AS DOUBLE) AS w,
           row_number() OVER (ORDER BY degree) AS i,
           row_number() OVER (ORDER BY wdeg) AS j
    FROM degrees
)
SELECT ROUND(2.0 * SUM(i * d) / (count(*) * SUM(d))
             - (count(*) + 1.0) / count(*), 9) + 0.0 AS degree_gini,
       ROUND(2.0 * SUM(j * w) / (count(*) * SUM(w))
             - (count(*) + 1.0) / count(*), 9) + 0.0 AS wdeg_gini
FROM rk""")


def sql_sparsify_ratio(ratio: float, seed: int = 42) -> str:
    """Top-ceil(ratio*m) canonical edges under (derandomized random score
    DESC, md5 tiebreak, u, v) — sparsify_to_ratio's exact selection."""
    from networkit_spark.functions.hashing import md5_long_sql

    rand = md5_long_sql(
        f"('{seed}:re:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
    )
    tb = md5_long_sql(
        f"('{seed}:ratio:' || CAST(u AS STRING) || ':' || CAST(v AS STRING))"
    )
    return _with_graph(f"""
canon AS (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v, MAX(weight) AS w
    FROM edges WHERE src <> dst GROUP BY 1, 2
),
scored AS (
    SELECT u, v, w, ROUND({rand} / 281474976710656.0, 9) AS score, {tb} AS tb
    FROM canon
),
mm AS (SELECT CAST(CEIL({ratio} * count(*)) AS BIGINT) AS k FROM scored),
rk AS (
    SELECT u, v, w, row_number() OVER (ORDER BY score DESC, tb, u, v) AS rn
    FROM scored
)
SELECT u AS src, v AS dst, ROUND(CAST(w AS DOUBLE), 6) AS weight
FROM rk CROSS JOIN mm WHERE rn <= mm.k
ORDER BY src, dst""")


def sql_clustering_tools(lp_iters: int, cc_iters: int) -> str:
    """GraphClusteringTools.cpp:10-116 over the LP partition: compacted
    communication graph (dense cids ascending by label, Partition::compact
    order) cross-joined with the scalar utilities — imbalance
    (max size / ceil(n/k)), proper/one/singleton predicates, and
    edge-level equality vs the CC partition."""
    lp, cc = f"lp{lp_iters}", f"cc{cc_iters}"
    body = f"""{', '.join(_lp_ctes(lp_iters))},
{', '.join(_cc_ctes(cc_iters))},
cdict AS MATERIALIZED (
    SELECT label, CAST(row_number() OVER (ORDER BY label) - 1 AS BIGINT) AS cid
    FROM (SELECT DISTINCT label FROM {lp})
),
comm AS (
    SELECT least(ca.cid, cb.cid) AS src, greatest(ca.cid, cb.cid) AS dst,
           SUM(e.weight) AS weight
    FROM edges e
    JOIN {lp} la ON la.id = e.src
    JOIN {lp} lb ON lb.id = e.dst
    JOIN cdict ca ON ca.label = la.label
    JOIN cdict cb ON cb.label = lb.label
    WHERE e.src < e.dst AND la.label <> lb.label
    GROUP BY 1, 2
),
scal AS (
    SELECT
        ROUND(
            (SELECT CAST(MAX(sz) AS DOUBLE) FROM
                (SELECT count(*) AS sz FROM {lp} GROUP BY label))
            / (SELECT CEIL(CAST(count(*) AS DOUBLE)
                           / (SELECT count(DISTINCT label) FROM {lp}))
               FROM {lp}), 6) + 0.0 AS imbalance,
        (SELECT count(*) FROM vertices v JOIN {lp} l ON l.id = v.id
         WHERE l.label IS NOT NULL)
            = (SELECT count(*) FROM vertices) AS is_proper,
        (SELECT count(DISTINCT label) FROM {lp}) = 1 AS is_one,
        (SELECT count(DISTINCT label) FROM {lp})
            = (SELECT count(*) FROM vertices) AS is_singleton,
        (SELECT count(*) FROM edges e
         JOIN {lp} a ON a.id = e.src JOIN {lp} b ON b.id = e.dst
         JOIN {cc} x ON x.id = e.src JOIN {cc} y ON y.id = e.dst
         WHERE (a.label = b.label) <> (x.label = y.label)) = 0 AS equals_cc
)
SELECT c.src, c.dst, ROUND(CAST(c.weight AS DOUBLE), 6) AS weight,
       s.imbalance, s.is_proper, s.is_one, s.is_singleton, s.equals_cc
FROM comm c CROSS JOIN scal s
ORDER BY c.src, c.dst"""
    return _with_graph(body)


def sql_umsf() -> str:
    """Union of all maximum spanning forests
    (graph/UnionMaximumSpanningForest.cpp:46-80): edge (u, v, w) is in the
    UMSF iff u and v are disconnected in the strictly-heavier subgraph —
    the deferred-merge descending Kruskal's cut rule, schedule-free. Per
    weight level, a recursive closure over edges with weight > level gives
    min-reachable-id component labels."""
    return f"""WITH RECURSIVE {GRAPH_CTE.strip()},
canon AS MATERIALIZED (
    SELECT least(src, dst) AS u, greatest(src, dst) AS v, MAX(weight) AS w
    FROM edges WHERE src <> dst GROUP BY 1, 2
),
lv AS (SELECT DISTINCT w AS lvl FROM canon),
sym AS MATERIALIZED (
    SELECT u AS a, v AS b, w FROM canon UNION ALL SELECT v, u, w FROM canon
),
reach(lvl, s, t) AS (
    SELECT l.lvl, x.id, x.id FROM lv l CROSS JOIN vertices x
    UNION
    SELECT r.lvl, r.s, e.b FROM reach r JOIN sym e ON e.a = r.t AND e.w > r.lvl
),
comp AS MATERIALIZED (
    SELECT lvl, s AS id, MIN(t) AS comp FROM reach GROUP BY lvl, s
)
SELECT e.u, e.v, CAST(e.w AS DOUBLE) AS weight,
       (ca.comp <> cb.comp) AS in_umsf
FROM canon e
JOIN comp ca ON ca.lvl = e.w AND ca.id = e.u
JOIN comp cb ON cb.lvl = e.w AND cb.id = e.v
ORDER BY e.u, e.v"""


# ---- training-data pipeline: stratified sampling + composed quality filter


STRAT_RATES = {"en": 0.35, "zh": 0.9, "es": 0.9, "de": 0.9, "fr": 0.9}
STRAT_DEFAULT_RATE = 1.0
STRAT_SEED = 42


def sql_stratified_sample() -> str:
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(
        f"('strat{STRAT_SEED}:' || CAST(lang AS STRING) || ':' "
        f"|| CAST(doc_id AS STRING))"
    )
    cases = " ".join(
        f"WHEN '{s}' THEN {r!r}" for s, r in sorted(STRAT_RATES.items())
    )
    return f"""WITH sel AS (
    SELECT doc_id, lang,
           ({h} % 1048576) AS b,
           CASE lang {cases} ELSE {STRAT_DEFAULT_RATE!r} END AS r
    FROM documents
)
SELECT doc_id, lang FROM sel WHERE b < r * 1048576 ORDER BY doc_id"""


def sql_quality_filter(
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
) -> str:
    return f"""WITH {DOCS_CTE},
m AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           {_sql_grams_expr(rep_n)} AS grams,
           CAST(len(list_distinct(toks)) AS DOUBLE)
               / greatest(len(toks), 1) AS distinct_ratio
    FROM docs_tok
),
d AS (
    SELECT doc_id, n_tokens, distinct_ratio,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                     / len(grams) END AS dup
    FROM m
)
SELECT doc_id, n_tokens,
       ROUND(dup, 6) AS dup_fraction,
       ROUND(distinct_ratio, 6) AS distinct_ratio,
       (n_tokens >= {min_tokens} AND dup <= {max_dup_fraction}
        AND distinct_ratio >= {min_distinct_ratio}) AS keep
FROM d ORDER BY doc_id"""


def sql_source_profile(
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
) -> str:
    return f"""WITH {DOCS_CTE},
m AS (
    SELECT t.doc_id, d.source, d.lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           {_sql_grams_expr(rep_n)} AS grams,
           CAST(len(list_distinct(toks)) AS DOUBLE)
               / greatest(len(toks), 1) AS distinct_ratio
    FROM docs_tok t JOIN documents d ON t.doc_id = d.doc_id
),
x AS (
    SELECT source, lang, n_tokens, distinct_ratio,
           CASE WHEN len(grams) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                     / len(grams) END AS dup
    FROM m
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       ROUND(AVG(dup), 6) AS mean_dup_fraction,
       ROUND(AVG(CASE WHEN n_tokens >= {min_tokens}
                       AND dup <= {max_dup_fraction}
                       AND distinct_ratio >= {min_distinct_ratio}
                      THEN 1.0 ELSE 0.0 END), 6) AS keep_fraction
FROM x GROUP BY source ORDER BY source"""


PIPE_BENCH_MOD = 23


def sql_pretrain_corpus(
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
    cc_rounds: int = 4,
    bench_mod: int = PIPE_BENCH_MOD,
) -> str:
    """The full pipeline_pretrain_corpus replay: quality filter -> exact
    dedup -> minhash-LSH canonical election -> decontamination -> stratified
    sample, as one CTE chain over the same stage SQL the individual gate
    queries use (sql_quality_filter / sql_dedup_exact / sql_dedup_canonical
    / sql_decontaminate / sql_stratified_sample)."""
    from networkit_spark.functions.hashing import md5_long_sql

    grams_rep = _sql_grams_expr(rep_n)
    grams_sh = _sql_grams_expr(shingle_n)
    rows = num_hashes // bands
    mins = ",\n           ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(num_hashes)
    )
    band_parts = []
    for b in range(bands):
        sig = ", ".join(f"h{b * rows + j}" for j in range(rows))
        band_parts.append(
            f"SELECT id, CAST({b} AS INT) AS band, "
            f"md5(concat_ws('|', {sig})) AS bucket FROM mins"
        )
    label_ctes = []
    for r in range(1, cc_rounds + 1):
        label_ctes.append(
            f"""nm{r} AS (
    SELECT s.u AS id, MIN(l.canonical) AS nmin
    FROM sym s JOIN l{r-1} l ON l.id = s.v GROUP BY s.u
),
l{r} AS (
    SELECT l.id, LEAST(l.canonical, COALESCE(n.nmin, l.canonical)) AS canonical
    FROM l{r-1} l LEFT JOIN nm{r} n ON n.id = l.id
)"""
        )
    h = md5_long_sql(
        f"('strat{STRAT_SEED}:' || CAST(d.lang AS STRING) || ':' "
        f"|| CAST(d.doc_id AS STRING))"
    )
    rate_cases = " ".join(
        f"WHEN '{s}' THEN {r!r}" for s, r in sorted(STRAT_RATES.items())
    )
    return f"""WITH {DOCS_CTE},
qf AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
    FROM (
        SELECT doc_id, toks, {grams_rep} AS grams,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / greatest(len(toks), 1) AS dr
        FROM docs_tok WHERE doc_id % {bench_mod} <> 0
    )
    WHERE len(toks) >= {min_tokens}
      AND (CASE WHEN len(grams) = 0 THEN 0.0
           ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
           END) <= {max_dup_fraction}
      AND dr >= {min_distinct_ratio}
),
reps AS (
    SELECT MIN(d.doc_id) AS doc_id
    FROM documents d JOIN qf ON d.doc_id = qf.doc_id
    GROUP BY md5(d.text)
),
sh AS MATERIALIZED (
    SELECT t.doc_id AS id, unnest(list_distinct({grams_sh})) AS shingle
    FROM docs_tok t JOIN reps r ON t.doc_id = r.doc_id
),
mins AS (SELECT id, {mins} FROM sh GROUP BY id),
bandrows AS ({' UNION ALL '.join(band_parts)}),
sized AS (SELECT id, band, bucket,
          COUNT(*) OVER (PARTITION BY band, bucket) AS sz FROM bandrows),
keptb AS (SELECT id, band, bucket FROM sized WHERE sz <= {max_bucket}),
prs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM keptb a
        JOIN keptb b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
sym AS (SELECT id_a AS u, id_b AS v FROM prs
        UNION ALL SELECT id_b, id_a FROM prs),
l0 AS (SELECT DISTINCT u AS id, u AS canonical FROM sym),
{','.join(label_ctes)},
k3 AS (
    SELECT r.doc_id FROM reps r
    WHERE r.doc_id NOT IN (
        SELECT id FROM l{cc_rounds} WHERE id <> canonical
    )
),
bench_sh AS (
    SELECT DISTINCT unnest(list_distinct({grams_sh})) AS shingle
    FROM docs_tok WHERE doc_id % {bench_mod} = 0
),
doc_sh AS (
    SELECT t.doc_id, unnest(list_distinct({grams_sh})) AS shingle
    FROM docs_tok t JOIN k3 k ON t.doc_id = k.doc_id
),
contaminated AS (
    SELECT DISTINCT s.doc_id FROM doc_sh s JOIN bench_sh b ON s.shingle = b.shingle
),
k4 AS (
    SELECT doc_id FROM k3
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT d.doc_id, d.lang, d.source, qf.n_tokens
FROM documents d
JOIN k4 ON d.doc_id = k4.doc_id
JOIN qf ON d.doc_id = qf.doc_id
WHERE ({h} % 1048576)
      < (CASE lang {rate_cases} ELSE {STRAT_DEFAULT_RATE!r} END) * 1048576
ORDER BY d.doc_id"""


def sql_pii_redact() -> str:
    """Replay of q_pii_redact: identical deterministic PII injection, then
    the same email -> IPv4 -> phone redaction order. The patterns live in
    functions/textstats.py and are restricted to syntax with identical
    semantics in Java regex and RE2."""
    from networkit_spark.functions.textstats import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )

    return f"""WITH aug AS (
    SELECT doc_id,
           text || ' contact doc' || CAST(doc_id AS VARCHAR)
                || '@example.com ping 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555-01'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
    FROM documents
),
r0 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
           regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM aug
),
r AS (
    SELECT doc_id, n_emails,
           -- count on the SAME intermediate the replacement runs on: an
           -- IP inside an email match is neither counted nor replaced
           CAST(len(regexp_extract_all(t1, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
           regexp_replace(t1, '{PII_IP_RE}', '<IP>', 'g') AS t2
    FROM r0
)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM r ORDER BY doc_id"""


def sql_span_dedup(n: int = 3, threshold: float = 0.3) -> str:
    """Mirror of dedup.span_dedup: distinct per-doc word n-grams, cross-
    document frequency, per-doc duplicated-span fraction. The keep compare
    uses the ROUNDED 6dp fraction on both sides — the same value emitted
    as dup_fraction, so the reported number can never contradict the flag
    at the threshold boundary (repo-wide rounded-decision convention, as
    in semdedup/spectral_bisection)."""
    return f"""WITH {DOCS_CTE},
shd AS (
    SELECT doc_id AS id, unnest(list_distinct({_sql_grams_expr(n)})) AS shingle
    FROM docs_tok
),
freq AS (SELECT shingle, COUNT(*) AS df FROM shd GROUP BY shingle),
per_doc AS (
    SELECT s.id,
           COUNT(*) AS n_sh,
           SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_dup
    FROM shd s JOIN freq f ON f.shingle = s.shingle
    GROUP BY s.id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_sh, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_shingles,
       ROUND(CASE WHEN COALESCE(p.n_sh, 0) = 0 THEN 0.0
                  ELSE CAST(p.n_dup AS DOUBLE) / p.n_sh END, 6) AS dup_fraction,
       ROUND(CASE WHEN COALESCE(p.n_sh, 0) = 0 THEN 0.0
                  ELSE CAST(p.n_dup AS DOUBLE) / p.n_sh END, 6) < {threshold} AS keep
FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
ORDER BY d.doc_id"""


def sql_semdedup(n_cells: int = 8, eps: float = 0.95, max_cell: int = 200) -> str:
    """Mirror of similarity.semdedup: sampled-vector centroids (first
    n_cells vectors by id rank), nearest-cell assignment with the rounded
    csim kept as the scan-order key, within-cell precedes-join (csim ASC:
    the farthest-from-centroid duplicate survives, per the paper) at the
    rounded-6dp eps compare, un-deduplicated wide cells (sz > max_cell)
    kept whole."""
    adot = _DOT.format(a="n.e", b="c.cv")
    pdot = _DOT.format(a="na.e", b="nb.e")
    return f"""WITH {EMB_CTE},
cells AS MATERIALIZED (
    SELECT vec_id AS cell, e AS cv, nrm AS cnrm FROM norms
    ORDER BY vec_id LIMIT {n_cells}
),
asim AS MATERIALIZED (
    SELECT n.vec_id, c.cell,
           ROUND({adot} / (n.nrm * c.cnrm), 6) AS csim
    FROM norms n CROSS JOIN cells c
),
assign AS MATERIALIZED (
    SELECT vec_id, cell, csim FROM (
        SELECT vec_id, cell, csim,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
        FROM asim
    ) WHERE rn = 1
),
width AS (SELECT cell, COUNT(*) AS sz FROM assign GROUP BY cell),
ded AS (
    SELECT a.vec_id, a.cell, a.csim
    FROM assign a JOIN width w ON w.cell = a.cell AND w.sz <= {max_cell}
),
dropped AS (
    SELECT DISTINCT b.vec_id
    FROM ded a JOIN ded b ON a.cell = b.cell
    JOIN norms na ON na.vec_id = a.vec_id
    JOIN norms nb ON nb.vec_id = b.vec_id
    WHERE (a.csim < b.csim OR (a.csim = b.csim AND a.vec_id < b.vec_id))
      AND ROUND({pdot} / (na.nrm * nb.nrm), 6) >= {eps}
)
SELECT s.vec_id, s.cell, s.csim,
       (d.vec_id IS NULL) AS kept
FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id
ORDER BY s.vec_id"""


def sql_cluster_sample(n_cells: int = 8, cap: int = 10, seed: int = 42) -> str:
    """Mirror of similarity.cluster_balanced_sample: sampled-vector
    centroids (first n_cells vectors by id rank), nearest-cell assignment
    at the rounded-6dp cosine (ties to the lower cell id), then at most
    ``cap`` members kept per cell in md5("cbs{seed}:" || id) order (ties
    by id) — the same derandomized permutation the Spark side computes."""
    from networkit_spark.functions.hashing import md5_long_sql

    adot = _DOT.format(a="n.e", b="c.cv")
    h = md5_long_sql(f"('cbs{seed}:' || CAST(vec_id AS STRING))")
    return f"""WITH {EMB_CTE},
cells AS MATERIALIZED (
    SELECT vec_id AS cell, e AS cv, nrm AS cnrm FROM norms
    ORDER BY vec_id LIMIT {n_cells}
),
asim AS MATERIALIZED (
    SELECT n.vec_id, c.cell,
           ROUND({adot} / (n.nrm * c.cnrm), 6) AS csim
    FROM norms n CROSS JOIN cells c
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
        FROM asim
    ) WHERE rn = 1
),
ranked AS (
    SELECT vec_id, cell,
           CAST(row_number() OVER (
               PARTITION BY cell ORDER BY {h} ASC, vec_id ASC
           ) AS BIGINT) AS rnk
    FROM assign
)
SELECT vec_id, cell, rnk, rnk <= {cap} AS kept
FROM ranked ORDER BY vec_id"""


def sql_profile_distributions(cc_iters: int) -> str:
    """Mirror of operators.profile.profile_distributions: degree
    distribution over the self-loop-aware degree table, component-size
    distribution over the unrolled hash-min CC labels, and mean local
    clustering coefficient per degree (raw LCC averaged, 6dp round —
    matching the Spark side's round(avg(lcc), 6))."""
    cc = ", ".join(_cc_ctes(cc_iters))
    body = f"""{DEG_CTE.strip()},
{cc},
{TRI_CTE.strip()},
corners AS (
    SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
pernode AS (
    SELECT v.id, COALESCE(t.cnt, 0) AS triangles
    FROM vertices v
    LEFT JOIN (SELECT id, count(*) AS cnt FROM corners GROUP BY id) t ON t.id = v.id
),
sdeg AS (SELECT a AS id, count(*) AS degree FROM und GROUP BY a),
lccv AS (
    SELECT p.id,
           CASE WHEN COALESCE(s.degree, 0) >= 2
                THEN 2.0 * p.triangles / (s.degree * (s.degree - 1))
                ELSE 0.0 END AS lcc
    FROM pernode p LEFT JOIN sdeg s ON s.id = p.id
)
SELECT 'degree_dist' AS kind, CAST(degree AS BIGINT) AS x,
       CAST(count(*) AS DOUBLE) AS y
FROM degrees GROUP BY degree
UNION ALL
SELECT 'component_size_dist', CAST(sz AS BIGINT), CAST(count(*) AS DOUBLE)
FROM (SELECT label, count(*) AS sz FROM cc{cc_iters} GROUP BY label)
GROUP BY sz
UNION ALL
SELECT 'lcc_by_degree', CAST(d.degree AS BIGINT),
       ROUND(AVG(l.lcc), 6)
FROM lccv l JOIN degrees d ON d.id = l.id
GROUP BY d.degree
ORDER BY kind, x"""
    return _with_graph(body)


def sql_hashed_features(dim: int = 64, seed: int = 42) -> str:
    """Mirror of textstats.hashed_doc_features: signed feature hashing —
    bucket md5("fhb{seed}:" || tok) % dim, sign from the independent
    "fhs" hash's parity, integer signed counts per (doc, bucket)."""
    from networkit_spark.functions.hashing import md5_long_sql

    hb = md5_long_sql(f"('fhb{seed}:' || tok)")
    hs = md5_long_sql(f"('fhs{seed}:' || tok)")
    return f"""WITH {DOCS_CTE},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs_tok),
feat AS (
    SELECT doc_id,
           CAST({hb} % {dim} AS INT) AS bucket,
           CAST({hs} % 2 * 2 - 1 AS BIGINT) AS sign
    FROM tok
)
SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
FROM feat GROUP BY doc_id, bucket ORDER BY doc_id, bucket"""


def sql_quality_classifier(
    positives: tuple[str, ...],
    dim: int = 64,
    lr: float = 4.0,
    epochs: int = 3,
    seed: int = 42,
    pareto_alpha: float = 9.0,
) -> str:
    """Mirror of textstats.quality_classifier: unrolled full-batch
    mean-gradient logistic regression on signed hashed features under the
    SGNS dyadic-grid protocol (coefficients snapped to 2^-24 after the
    sigmoid, gradient contributions to 2^-30 before the SUM), then the
    GPT-3 Pareto keep rule with a 2^-24-snapped derandomized draw."""
    from networkit_spark.functions.hashing import md5_long_sql

    Q24, Q30 = float(1 << 24), float(1 << 30)
    P48 = float(1 << 48)
    hb = md5_long_sql(f"('fhb{seed}:' || tok)")
    hs = md5_long_sql(f"('fhs{seed}:' || tok)")
    udraw = md5_long_sql(f"('qcls{seed}:' || CAST(doc_id AS STRING))")
    pos_list = ", ".join(f"'{p}'" for p in positives)
    ctes = [
        f"""tokq AS (SELECT doc_id, unnest(toks) AS tok FROM docs_tok)""",
        f"""featq AS MATERIALIZED (
    SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS weight
    FROM (
        SELECT doc_id,
               CAST({hb} % {dim} AS INT) AS bucket,
               CAST({hs} % 2 * 2 - 1 AS BIGINT) AS sign
        FROM tokq
    ) GROUP BY doc_id, bucket
)""",
        f"""lab AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN source IN ({pos_list}) THEN 1.0 ELSE 0.0 END AS y
    FROM documents
)""",
        "ndq AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM lab)",
        f"""w0 AS (SELECT CAST(i AS INT) AS bucket, 0.0 AS w
    FROM generate_series(-1, {dim - 1}) t(i))""",
    ]
    for e in range(epochs):
        ctes.append(
            f"""dpq{e} AS (
    SELECT f.doc_id, SUM(w.w * f.weight) AS dp
    FROM featq f JOIN w{e} w ON w.bucket = f.bucket
    GROUP BY f.doc_id
)"""
        )
        ctes.append(
            f"""scq{e} AS MATERIALIZED (
    SELECT l.doc_id,
           FLOOR({lr} * (l.y - 1.0 / (1.0 + EXP(-(b.w + COALESCE(d.dp, 0.0)))))
                 / n.c * {Q24} + 0.5) / {Q24} AS g
    FROM lab l
    LEFT JOIN dpq{e} d ON d.doc_id = l.doc_id
    CROSS JOIN ndq n
    CROSS JOIN (SELECT w FROM w{e} WHERE bucket = -1) b
)"""
        )
        ctes.append(
            f"""gwq{e} AS (
    SELECT f.bucket, SUM(FLOOR(s.g * f.weight * {Q30} + 0.5) / {Q30}) AS dv
    FROM featq f JOIN scq{e} s ON s.doc_id = f.doc_id
    GROUP BY f.bucket
    UNION ALL
    SELECT CAST(-1 AS INT), SUM(FLOOR(s.g * {Q30} + 0.5) / {Q30}) FROM scq{e} s
)"""
        )
        ctes.append(
            f"""w{e + 1} AS MATERIALIZED (
    SELECT w.bucket, w.w + COALESCE(d.dv, 0.0) AS w
    FROM w{e} w
    LEFT JOIN gwq{e} d ON d.bucket = w.bucket
)"""
        )
    ctes.append(
        f"""finq AS (
    SELECT l.doc_id, l.y,
           ROUND(1.0 / (1.0 + EXP(-(b.w + COALESCE(d.dp, 0.0)))), 6) AS score
    FROM lab l
    LEFT JOIN (
        SELECT f.doc_id, SUM(w.w * f.weight) AS dp
        FROM featq f JOIN w{epochs} w ON w.bucket = f.bucket
        GROUP BY f.doc_id
    ) d ON d.doc_id = l.doc_id
    CROSS JOIN (SELECT w FROM w{epochs} WHERE bucket = -1) b
)"""
    )
    return f"""WITH {DOCS_CTE},
{", ".join(ctes)}
SELECT doc_id, y AS label, score + 0.0 AS score,
       FLOOR((POW(1.0 - ({udraw}) / {P48}, {-1.0 / pareto_alpha}) - 1.0)
             * {Q24} + 0.5) / {Q24} > 1.0 - score AS keep
FROM finq ORDER BY doc_id"""


def sql_source_mixing(target: int, seed: int = 42) -> str:
    """Mirror of textstats.source_mixing: sqrt-temperature mixture weights
    (sqrt is IEEE-correctly-rounded in both engines, unlike pow), 6dp-
    rounded take rate used for BOTH the md5-bucket Bernoulli filter and
    the emitted column, per-source sampled counts."""
    from networkit_spark.functions.hashing import md5_long_sql

    h = md5_long_sql(
        f"('mix{seed}:' || CAST(d.source AS STRING) || ':' "
        f"|| CAST(d.doc_id AS STRING))"
    )
    return f"""WITH per AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
),
z AS (SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z FROM per),
rated AS (
    SELECT p.source, p.n_docs,
           sqrt(CAST(p.n_docs AS DOUBLE)) / z.z AS w,
           ROUND(LEAST(1.0, {float(target)} * (sqrt(CAST(p.n_docs AS DOUBLE)) / z.z)
                             / p.n_docs), 6) AS rate
    FROM per p CROSS JOIN z
),
kept AS (
    SELECT d.source AS ksrc, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents d JOIN rated r ON r.source = d.source
    WHERE ({h} % 1048576) < r.rate * 1048576
    GROUP BY d.source
)
SELECT r.source, r.n_docs, ROUND(r.w, 6) AS weight, r.rate,
       CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled
FROM rated r LEFT JOIN kept k ON k.ksrc = r.source
ORDER BY r.source"""


def sql_neighborhood_heuristic(iters: int, n_samples: int) -> str:
    """Mirror of anf.neighborhood_function_heuristic (SPLIT strategy):
    degree-asc/id-asc rank picks every (n // nSamples)-th node, sampled
    unrolled BFS, interior increments FLOOR(count*n/s + 0.5) accumulated
    cumulatively, exact endpoints N(1)=2m and N(dia)=n(n-1)."""
    ctes = [
        "uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        """nd AS (
    SELECT v.id, CAST(COUNT(e.dst) AS BIGINT) AS degree
    FROM vertices v LEFT JOIN edges e ON e.src = v.id GROUP BY v.id
)""",
        """consts AS (
    SELECT CAST((SELECT COUNT(*) FROM vertices) AS BIGINT) AS n,
           CAST((SELECT COUNT(*) FROM (
               SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
               FROM edges)) AS BIGINT) AS m
)""",
        """ranked AS (
    SELECT id, row_number() OVER (ORDER BY degree ASC, id ASC) - 1 AS rk
    FROM nd
)""",
        f"""sp AS MATERIALIZED (
    SELECT r.id FROM ranked r CROSS JOIN consts c
    WHERE r.rk % (c.n // {n_samples}) = 0
      AND r.rk < {n_samples} * (c.n // {n_samples})
)""",
        "b0 AS (SELECT id AS s, id AS v, CAST(0 AS BIGINT) AS dist FROM sp)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""bn{k} AS (
    SELECT p.s, e.dst AS v, CAST({k} AS BIGINT) AS dist
    FROM b{k-1} p JOIN uadj e ON e.src = p.v
    WHERE p.dist = {k-1}
    GROUP BY p.s, e.dst
),
b{k} AS MATERIALIZED (
    SELECT s, v, dist FROM b{k-1}
    UNION ALL
    SELECT x.s, x.v, x.dist FROM bn{k} x
    WHERE NOT EXISTS (SELECT 1 FROM b{k-1} o WHERE o.s = x.s AND o.v = x.v)
)"""
        )
    body = ", ".join(ctes + _apsp_ctes(iters)[1:]) + f""",
dia AS (SELECT CAST(MAX(dist) AS BIGINT) AS d FROM ap{iters}),
grid AS (
    SELECT UNNEST(range(2, (SELECT d FROM dia))) AS dist
),
nfc AS (
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS c FROM b{iters}
    WHERE dist >= 2 AND dist <= (SELECT d FROM dia) - 1
    GROUP BY dist
),
inc AS (
    SELECT g.dist,
           CAST(FLOOR(COALESCE(f.c, 0) * (CAST(cs.n AS DOUBLE) / {n_samples})
                      + 0.5) AS BIGINT) AS ic
    FROM grid g LEFT JOIN nfc f ON f.dist = g.dist CROSS JOIN consts cs
),
interior AS (
    SELECT dist,
           SUM(ic) OVER (ORDER BY dist
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           + (SELECT 2 * m FROM consts) AS nf
    FROM inc
)
SELECT CAST(1 AS BIGINT) AS dist, CAST(2 * m AS BIGINT) AS nf FROM consts
WHERE (SELECT d FROM dia) > 1
UNION ALL
SELECT CAST(dist AS BIGINT), CAST(nf AS BIGINT) FROM interior
UNION ALL
SELECT (SELECT d FROM dia), CAST(n * (n - 1) AS BIGINT) FROM consts
ORDER BY dist"""
    return _with_graph(body)


def sql_pivot_mds(
    iters: int, k: int, dim: int, pm_iters: int, seed: int = 42
) -> str:
    """Full replay of operators/layout.py pivot_mds in pinned mode
    (viz/PivotMDS.cpp semantics): md5-rank pivots, frontier-unrolled
    multi-pivot BFS, double centering over PRESENT pairs only, dense k×k
    Gram, ``pm_iters`` unrolled power steps per dimension with rank-1
    deflation between dimensions, canonical sign, coordinates C·v
    rounded to 6dp."""
    from networkit_spark.functions.hashing import md5_long_sql

    rk = md5_long_sql(f"('{seed}:pmds:' || CAST(id AS STRING))")
    ctes = [
        f"""pv AS MATERIALIZED (
    SELECT id AS s, CAST(rn - 1 AS INT) AS j FROM (
        SELECT id, row_number() OVER (ORDER BY {rk}, id) AS rn FROM vertices
    ) WHERE rn <= {k}
)""",
        "uadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)",
        "pb0 AS (SELECT s, s AS v, CAST(0 AS BIGINT) AS dist FROM pv)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pbn{t} AS (
    SELECT p.s, e.dst AS v, CAST({t} AS BIGINT) AS dist
    FROM pb{t-1} p JOIN uadj e ON e.src = p.v
    WHERE p.dist = {t-1}
    GROUP BY p.s, e.dst
),
pb{t} AS MATERIALIZED (
    SELECT s, v, dist FROM pb{t-1}
    UNION ALL
    SELECT n.s, n.v, n.dist FROM pbn{t} n
    WHERE NOT EXISTS (SELECT 1 FROM pb{t-1} o WHERE o.s = n.s AND o.v = n.v)
)"""
        )
    ctes += [
        f"""dmat AS MATERIALIZED (
    SELECT b.v AS id, p.j, CAST(b.dist AS DOUBLE) AS d
    FROM pb{iters} b JOIN pv p ON p.s = b.s
)""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices)",
        f"""rm AS MATERIALIZED (
    SELECT v.id, COALESCE(SUM(m.d), 0.0) / {k} AS rm
    FROM vertices v LEFT JOIN dmat m ON m.id = v.id GROUP BY v.id
)""",
        "cmn AS MATERIALIZED (SELECT j, SUM(d) / (SELECT n FROM nn) AS cm FROM dmat GROUP BY j)",
        f"gm AS (SELECT COALESCE(SUM(d), 0.0) / ((SELECT n FROM nn) * {k}) AS g FROM dmat)",
        """cmat AS MATERIALIZED (
    SELECT m.id, m.j, m.d - r.rm - c.cm + (SELECT g FROM gm) AS c
    FROM dmat m JOIN rm r ON r.id = m.id JOIN cmn c ON c.j = m.j
)""",
        """ccagg AS (
    SELECT a.j AS j1, b.j AS j2, SUM(a.c * b.c) AS val
    FROM cmat a JOIN cmat b ON a.id = b.id GROUP BY a.j, b.j
)""",
        """cc0 AS MATERIALIZED (
    SELECT p1.j AS j1, p2.j AS j2, COALESCE(g.val, 0.0) AS val
    FROM pv p1 CROSS JOIN pv p2
    LEFT JOIN ccagg g ON g.j1 = p1.j AND g.j2 = p2.j
)""",
    ]
    for d in range(dim):
        hj = md5_long_sql(f"('{seed}:pmds:d{d}:' || CAST(j AS STRING))")
        ctes.append(
            f"v{d}i0 AS (SELECT j, ({hj} / 281474976710656.0 - 0.5) AS x FROM pv)"
        )
        for t in range(1, pm_iters + 1):
            ctes.append(
                f"""v{d}y{t} AS (
    SELECT c.j1 AS j, SUM(c.val * p.x) AS y
    FROM cc{d} c JOIN v{d}i{t-1} p ON p.j = c.j2 GROUP BY c.j1
),
v{d}i{t} AS MATERIALIZED (
    SELECT j, y / (SELECT COALESCE(NULLIF(sqrt(SUM(y*y)), 0.0), 1.0)
                   FROM v{d}y{t}) AS x
    FROM v{d}y{t}
)"""
            )
        fin = f"v{d}i{pm_iters}"
        ctes += [
            f"v{d}sq AS (SELECT COALESCE(NULLIF(SUM(x*x), 0.0), 1.0) AS sq FROM {fin})",
            f"""v{d}lam AS (
    SELECT (SELECT SUM(c.val * a.x * b.x)
            FROM cc{d} c JOIN {fin} a ON a.j = c.j1 JOIN {fin} b ON b.j = c.j2)
           / (SELECT sq FROM v{d}sq) AS lam
)""",
            f"""cc{d+1} AS MATERIALIZED (
    SELECT c.j1, c.j2,
           c.val - (SELECT lam FROM v{d}lam) / (SELECT sq FROM v{d}sq)
                   * a.x * b.x AS val
    FROM cc{d} c JOIN {fin} a ON a.j = c.j1 JOIN {fin} b ON b.j = c.j2
)""",
            f"""v{d}sg AS (
    SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
    FROM {fin} WHERE abs(x) > 1e-12 ORDER BY j LIMIT 1
)""",
            f"""v{d}c AS MATERIALIZED (
    SELECT j, x * COALESCE((SELECT s FROM v{d}sg), 1.0) AS x FROM {fin}
)""",
            f"""xc{d} AS MATERIALIZED (
    SELECT m.id, SUM(m.c * v.x) AS val
    FROM cmat m JOIN v{d}c v ON v.j = m.j GROUP BY m.id
)""",
        ]
    sel = ", ".join(
        f"ROUND(COALESCE(xc{d}.val, 0.0), 6) + 0.0 AS x{d}" for d in range(dim)
    )
    joins = " ".join(f"LEFT JOIN xc{d} ON xc{d}.id = v.id" for d in range(dim))
    tail = f" SELECT v.id, {sel} FROM vertices v {joins} ORDER BY v.id"
    return _with_graph(", ".join(ctes) + tail)


def sql_dsir_resample(
    k: int, buckets: int = 512, add_k: float = 0.5, seed: int = 42
) -> str:
    """Replay of functions/textstats.py dsir_resample with target =
    (lang = 'en'): hashed unigram+bigram bucket multinomials, add-k
    log-ratio weights, derandomized Gumbel top-k over the non-target
    pool."""
    from networkit_spark.functions.hashing import md5_long_sql

    hb = md5_long_sql(f"('{seed}:dsir:' || feat)")
    hg = md5_long_sql(f"('{seed}:dsir:g:' || CAST(doc_id AS STRING))")
    a = float(add_k)
    return f"""WITH {DOCS_CTE},
base AS (SELECT doc_id, (lang = 'en') AS is_t FROM documents),
dgrams AS (
    SELECT doc_id, list_concat(toks, {_sql_grams_expr(2)}) AS fs FROM docs_tok
),
feats AS MATERIALIZED (
    SELECT g.doc_id, b2.is_t, {hb} % {buckets} AS b
    FROM (SELECT doc_id, UNNEST(fs) AS feat FROM dgrams) g
    JOIN base b2 USING (doc_id)
),
cnt AS (
    SELECT b,
           CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
           CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
    FROM feats GROUP BY b
),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM cnt),
lrm AS (
    SELECT b, ln((ct + {a}) / (tt + {a} * {buckets}))
              - ln((cr + {a}) / (tr + {a} * {buckets})) AS lr
    FROM cnt CROSS JOIN tot
),
w AS (
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           ROUND(SUM(l.lr), 6) AS logw
    FROM feats f JOIN lrm l USING (b) WHERE NOT f.is_t GROUP BY f.doc_id
)
SELECT doc_id, n_feats, logw,
       logw + ROUND(-ln(-ln(({hg} + 1.0) / 281474976710657.0)), 6) AS key
FROM w
ORDER BY key DESC, doc_id LIMIT {int(k)}"""


def sql_spanning_forest_invariants(iters: int) -> str:
    """Invariant oracle for the UST samplers (Wilson/Aldous-Broder): a
    uniform spanning forest of ANY seed has exactly n - #components
    edges, every edge drawn from the graph, and the same component count
    as the graph — all computable in SQL without replaying the walk."""
    body = ", ".join(_cc_ctes(iters)) + f""",
st AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT label) AS BIGINT) AS ncomp
    FROM cc{iters}
)
SELECT n - ncomp AS n_edges, CAST(0 AS BIGINT) AS bad_edges,
       ncomp AS n_components
FROM st"""
    return _with_graph(body)
