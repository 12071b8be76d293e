"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the sign-LSH bucketed
variant is the scale path (bucket-join instead of cross-join). Dot products
are built-in JVM expressions (zip_with + aggregate fold — a sequential,
deterministic summation identical to DuckDB's list_reduce fold, so the
correctness gate can compare values bit-for-bit before rounding).

At 100 TB scale the brute-force path is only for re-ranking candidates:
queries broadcast, corpus streams, per-partition top-k via partial
aggregation before the global ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — exact top-k cosine neighbors for each
    query id, self excluded; ties broken by neighbor_id asc on the ROUNDED
    similarity so the ordering is engine-portable."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def hyperplanes(
    dim: int, nbits: int, n_tables: int, seed: int = 42
) -> list[list[list[float]]]:
    """[table][bit][dim] seeded Gaussian random-projection hyperplanes,
    rounded to 6 decimals so the SAME decimal literals embed into both the
    Spark expressions and the DuckDB oracle SQL (decimal text parses to the
    identical nearest double in both engines)."""
    import numpy as np

    rs = np.random.RandomState(seed)
    h = rs.standard_normal((n_tables, nbits, dim))
    return [[[round(float(x), 6) for x in bit] for bit in tbl] for tbl in h]


def sign_lsh_buckets(
    emb: DataFrame,
    dim: int,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, tbl, bucket) — one signature per hash table: bucket =
    Σ_i 2^i·[⟨v, h_ti⟩ > 0] over seeded Gaussian hyperplanes. Multi-table
    OR-amplification is the standard recall lever (candidates = union of
    per-table bucket matches); all JVM fold expressions, no Python."""
    planes = hyperplanes(dim, nbits, n_tables, seed)
    per_table = []
    for t, tbl in enumerate(planes):
        bucket = None
        for i, plane in enumerate(tbl):
            dot = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
            bit = F.when(dot > 0, F.lit(2 ** i)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        per_table.append(
            emb.select(
                F.col(id_col).alias("vec_id"),
                F.lit(t).alias("tbl"),
                bucket.cast("bigint").alias("bucket"),
            )
        )
    out = per_table[0]
    for p in per_table[1:]:
        out = out.unionByName(p)
    return out


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — approximate top-k: candidates =
    union over hash tables of same-(tbl, bucket) vectors (equi-join per
    table, never a cross join), deduplicated, then exact cosine re-rank."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).limit(1).first()
        dim = int(first["d"]) if first else 0
    b = sign_lsh_buckets(emb, dim, nbits, n_tables, seed, id_col, vec_col)
    b = b.withColumnRenamed("vec_id", "nid")
    qb = b.filter(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), "tbl", "bucket"
    )
    # OR-amplification: a pair matching in ANY table is a candidate (once)
    cand_ids = (
        F.broadcast(qb)
        .join(b, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("nid"))
        .select("query_id", "nid")
        .distinct()
    )
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    qv = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cand = cand_ids.join(F.broadcast(qv), "query_id").join(vecs, "nid")
    sims = cand.select(
        "query_id",
        F.col("nid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


# -- embedding near-duplicate detection --------------------------------------

def embed_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    nbits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim) with a < b — embedding-cosine near-duplicate pairs: the
    candidate set is the union over sign-LSH tables of same-bucket pairs
    (equi-join per table, never all-pairs), then the exact cosine filters at
    ``threshold``. This is the embedding analogue of the MinHash band join in
    functions/dedup.py — the scale path for near-dup mining over 10^10
    documents, where brute force is O(n^2) and the banded join is
    O(sum bucket^2) with bucket width controlled by nbits."""
    if dim is None:
        first = emb.select(F.size(vec_col).alias("d")).limit(1).first()
        dim = int(first["d"]) if first else 0
    b = sign_lsh_buckets(emb, dim, nbits, n_tables, seed, id_col, vec_col)
    lhs = b.select(F.col("vec_id").alias("a"), "tbl", "bucket")
    rhs = b.select(F.col("vec_id").alias("b"), "tbl", "bucket")
    cand = (
        lhs.join(rhs, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("av"))
    vb = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("bv"))
    sims = (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            F.round(
                _dot(F.col("av"), F.col("bv"))
                / (_norm(F.col("av")) * _norm(F.col("bv"))),
                6,
            ).alias("sim"),
        )
    )
    return sims.filter(F.col("sim") >= threshold)


# -- IVF (inverted-file) approximate nearest neighbours ----------------------

def ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, cv) — sampled-vector coarse quantizer: the first ``n_cells``
    vectors by id serve as cell centroids. Sampling training points as
    centroids is the standard cheap quantizer init (k-means training is a
    separate offline step — see lloyd_refine); sampled centroids keep the
    whole index a pure function of the data, which the correctness oracle
    reproduces exactly.  Selection is rank-based (ORDER BY id LIMIT n),
    not ``id < n_cells``, so sparse or offset id spaces still yield
    exactly ``n_cells`` centroids."""
    return (
        emb.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        .orderBy("cell")
        .limit(n_cells)
    )


def _nearest_cells(vecs: DataFrame, cent: DataFrame, n_take: int, key: str) -> DataFrame:
    """Per input vector, the ``n_take`` nearest centroids by rounded cosine
    (ties to the lower cell id). Centroid table is tiny -> broadcast."""
    sims = F.broadcast(cent).crossJoin(vecs).select(
        key,
        "cell",
        F.round(
            _dot(F.col("iv"), F.col("cv")) / (_norm(F.col("iv")) * _norm(F.col("cv"))),
            6,
        ).alias("csim"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_take)
        .select(key, "cell")
    )


def ivf_assign(
    emb: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell) — the inverted lists: every vector assigned to its
    nearest centroid. One broadcast-join + one per-vector argmax; at 100 TB
    this is the single full scan that builds the index."""
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("iv"))
    return _nearest_cells(vecs, cent, 1, "nid").withColumnRenamed("nid", "vec_id")


def lloyd_refine(
    emb: DataFrame,
    cent: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-or-more Lloyd (k-means) refinement steps over the coarse
    quantizer: re-assign, then recompute each centroid as the coordinate-wise
    mean of its members (posexplode -> groupBy(cell, pos) avg -> re-collect).
    Distributed training path for the IVF index; NOT used by the correctness
    gate (float summation order makes cross-engine bit-equality of means
    unreliable) — pytest checks it against a numpy k-means step instead."""
    for _ in range(iterations):
        assign = ivf_assign(emb, cent, id_col, vec_col)
        member = assign.join(
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("mv")),
            "vec_id",
        )
        coords = member.select("cell", F.posexplode("mv").alias("pos", "val"))
        means = coords.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
        cent = (
            means.groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell",
                F.transform(F.col("pm"), lambda s: s["m"].cast("float")).alias("cv"),
            )
        )
    return cent


def ivf_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, sim) — IVF-Flat search: each query probes its
    ``nprobe`` nearest cells and exact-reranks only those cells' members.
    Cost per query is (n/n_cells)*nprobe candidate dot products instead of n;
    the candidate fetch is an equi-join on cell (co-partitioned with the
    inverted lists), never a cross join against the corpus."""
    cent = ivf_centroids(emb, n_cells, id_col, vec_col)
    lists = ivf_assign(emb, cent, id_col, vec_col).withColumnRenamed("vec_id", "nid")
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("iv")
    )
    probes = _nearest_cells(q, cent, nprobe, "query_id")
    cand = (
        F.broadcast(probes)
        .join(lists, "cell")
        .filter(F.col("query_id") != F.col("nid"))
        .select("query_id", "nid")
        .distinct()
    )
    qv = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    sims = cand.join(F.broadcast(qv), "query_id").join(vecs, "nid").select(
        "query_id",
        F.col("nid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv"))),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def semdedup(
    emb: DataFrame,
    n_cells: int = 8,
    eps: float = 0.95,
    max_cell: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, csim, kept) — SemDeDup semantic deduplication (Abbas
    et al. 2023, arXiv:2303.09540): cluster the embedding space, then
    within each cluster drop every vector whose cosine similarity to a
    PRECEDING cluster member reaches ``eps``. Following the paper's
    keep-low-centroid-similarity choice (§3.1: of any duplicate group the
    member FARTHEST from the centroid survives — "edge" examples are the
    ones worth keeping), cluster members are scanned by similarity to
    their centroid ASCENDING (ties by id ascending) and an item is
    dropped when the max pairwise similarity against items before it in
    that order reaches eps. Clustering reuses the IVF sampled-vector quantizer
    (ivf_centroids + nearest-cell assignment; lloyd_refine is the offline
    trainer, exactly as for ivf_ann_topk) which keeps the whole pass a
    pure deterministic function of the data for the DuckDB oracle.

    Shape at 100 TB: centroid assignment is one broadcast join + per-row
    argmax (k centroids, k ~ sqrt(N) in the paper -> expected cell width
    ~ sqrt(N)); the within-cell pairwise stage is an equi-join ON CELL, so
    its cost is sum_c |c|^2, bounded by ``max_cell``: cells wider than the
    cap are left un-deduplicated (kept whole, conservative — same contract
    as the minhash stop-bucket cap) rather than exploding one skewed cell
    into an n^2 product. cos(a,b) is rounded to 6dp before the eps compare
    and the ordering key csim is the same rounded value, so Spark and
    DuckDB make identical keep/drop decisions.
    """
    cent = ivf_centroids(emb, n_cells, id_col, vec_col)
    vecs = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("iv"))
    sims = F.broadcast(cent).crossJoin(vecs).select(
        "nid",
        "cell",
        F.round(
            _dot(F.col("iv"), F.col("cv")) / (_norm(F.col("iv")) * _norm(F.col("cv"))),
            6,
        ).alias("csim"),
    )
    w = Window.partitionBy("nid").orderBy(F.desc("csim"), F.asc("cell"))
    assign = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("nid").alias("vec_id"), "cell", "csim")
    )
    width = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("sz"))
    dedupable = assign.join(
        width.filter(F.col("sz") <= max_cell).select("cell"), "cell", "semi"
    )
    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    a = dedupable.join(v, "vec_id").select(
        "cell",
        F.col("vec_id").alias("ida"),
        F.col("csim").alias("csa"),
        F.col("v").alias("va"),
    )
    b = dedupable.join(v, "vec_id").select(
        "cell",
        F.col("vec_id").alias("idb"),
        F.col("csim").alias("csb"),
        F.col("v").alias("vb"),
    )
    # a precedes b in the paper's scan order: csim ASC (farthest from the
    # centroid first, so it survives and the closer duplicate is dropped),
    # then id asc
    precedes = (F.col("csa") < F.col("csb")) | (
        (F.col("csa") == F.col("csb")) & (F.col("ida") < F.col("idb"))
    )
    dropped = (
        a.join(b, "cell")
        .filter(precedes)
        .filter(
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            )
            >= eps
        )
        .select(F.col("idb").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return assign.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell",
        "csim",
        F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
    )


def cluster_balanced_sample(
    emb: DataFrame,
    n_cells: int = 8,
    cap: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell, rnk, kept) — cluster-balanced subset selection over
    the embedding space: assign every vector to its nearest sampled
    centroid (the IVF coarse quantizer shared with ivf_ann_topk /
    semdedup), then keep at most ``cap`` members per cluster in
    derandomized-uniform order. Curation role: caps the dominant modes of
    the embedding space so a sampled training subset preserves cluster
    diversity instead of mirroring the corpus's mode imbalance — the
    cluster-budget step of diversity-aware selection pipelines (D4,
    Tirumala et al. 2023, arXiv:2308.12284, applies exactly this budgeted
    per-cluster draw after SemDeDup's prune; both stages share this
    module's quantizer).

    Determinism / oracle: the per-cluster order is the 48-bit md5 hash of
    "cbs{seed}:" || id (ties by id ascending) — a fixed random permutation
    both engines compute identically, so the uniform
    sample-without-replacement is derandomized the same way as the
    md5-Bernoulli samplers in textstats (stratified_sample /
    source_mixing).

    Shape at 100 TB: centroid assignment is one broadcast join + per-row
    argmax; the per-cluster rank is ONE shuffle on the cell key. Cells are
    ~N/k wide at k ~ sqrt(N) centroids (the SemDeDup/D4 regime); if a
    degenerate quantizer leaves a cell orders of magnitude wider, raise
    ``n_cells`` — the quantizer is the knob that bounds cell width (same
    contract as semdedup's max_cell note).
    """
    from networkit_spark.functions.hashing import md5_long_sql

    cent = ivf_centroids(emb, n_cells, id_col, vec_col)
    assign = ivf_assign(emb, cent, id_col, vec_col)
    h = F.expr(md5_long_sql(f"('cbs{seed}:' || CAST(vec_id AS STRING))"))
    w = Window.partitionBy("cell").orderBy(F.asc("h"), F.asc("vec_id"))
    return (
        assign.withColumn("h", h)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .select(
            "vec_id",
            "cell",
            "rnk",
            (F.col("rnk") <= cap).alias("kept"),
        )
    )
