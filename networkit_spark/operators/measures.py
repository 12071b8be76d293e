"""Partition dissimilarity measures: NMI, node-structural Rand, Jaccard.

References:
- community/NMIDistance.cpp:18-125 — MI = Σ_O |O|/n · log2(|O|·n/(|C|·|D|)),
  H(ζ) = -Σ P(C)·log2 P(C); NMID = 1 - 2·MI/(Hζ+Hη) (0 when H sum is 0,
  DynamicNMIDistance.cpp:137-144).
- community/NodeStructuralRandMeasure.cpp:14-58 —
  rand = 1 - 2A/(n(n-1)), A = n(n-1)/2 + 2·ΣC(|O|,2) - ΣC(|C|,2) - ΣC(|D|,2).
- community/JaccardMeasure.cpp:14-70 — jaccard = 1 - 2·s11/(n(n-1) - 2·s00)
  with s11 = ΣC(|O|,2), s00 = n(n-1)/2 + s11 - ΣC(|C|,2) - ΣC(|D|,2).

All three reduce to label-count-sized aggregations (cluster sizes + the
pairwise-overlap contingency table) — pure groupBy/join/agg, no Python in
the distributed part; the final scalar combine is a driver-side constant
number of floats. At 10^9 vertices the contingency table is bounded by
|ζ|·|η| REALIZED pairs (each vertex contributes one), so it shuffles at
most n rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(col):
    return F.sum(F.col(col) * (F.col(col) - 1) / 2.0)


def partition_measures(zeta: DataFrame, eta: DataFrame) -> dict[str, float]:
    """{'nmi_distance', 'rand_distance', 'jaccard_distance'} between two
    (id, label) partitions over the same vertex set."""
    joined = (
        zeta.select("id", F.col("label").alias("la"))
        .join(eta.select("id", F.col("label").alias("lb")), "id")
        .persist()
    )
    n = joined.count()
    if n == 0:
        return {"nmi_distance": 0.0, "rand_distance": 0.0, "jaccard_distance": 0.0}

    sz = joined.groupBy("la").agg(F.count(F.lit(1)).alias("s"))
    se = joined.groupBy("lb").agg(F.count(F.lit(1)).alias("s"))
    ov = joined.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("s"))

    sum_z = sz.agg(_pairs("s")).first()[0] or 0.0
    sum_e = se.agg(_pairs("s")).first()[0] or 0.0
    sum_i = ov.agg(_pairs("s")).first()[0] or 0.0

    mi = (
        ov.join(sz.withColumnRenamed("s", "sc"), "la")
        .join(se.withColumnRenamed("s", "sd"), "lb")
        .agg(
            F.sum(
                (F.col("s") / n)
                * F.log2(F.col("s") * F.lit(float(n)) / (F.col("sc") * F.col("sd")))
            )
        )
        .first()[0]
        or 0.0
    )
    h_z = sz.agg(F.sum(-(F.col("s") / n) * F.log2(F.col("s") / n))).first()[0] or 0.0
    h_e = se.agg(F.sum(-(F.col("s") / n) * F.log2(F.col("s") / n))).first()[0] or 0.0
    joined.unpersist()

    h_sum = h_z + h_e
    nmid = 0.0 if math.isclose(h_sum, 0.0, abs_tol=1e-12) else 1.0 - (2.0 * mi) / h_sum

    a = n * (n - 1) / 2.0 + 2.0 * sum_i - (sum_z + sum_e)
    rand = 1.0 - (2.0 * a) / (n * (n - 1)) if n > 1 else 0.0

    s00 = n * (n - 1) / 2.0 + sum_i - (sum_z + sum_e)
    divisor = n * (n - 1) - 2.0 * s00
    jaccard = 1.0 - (2.0 * sum_i) / divisor if divisor > 0 else 0.0

    return {
        "nmi_distance": float(nmid),
        "rand_distance": float(rand),
        "jaccard_distance": float(jaccard),
    }


def adjusted_rand_distance(zeta: DataFrame, eta: DataFrame) -> float:
    """Chance-corrected Rand dissimilarity
    (community/AdjustedRandMeasure.cpp:7-56): with pair sums over cluster
    sizes of zeta, eta, and their intersection,
    ARD = 1 - (sum_i - E)/(M - E), E = sum_z*sum_e / C(n,2),
    M = (sum_z + sum_e)/2; 0 for the two degenerate cases (both
    singleton partitions, both one-cluster partitions)."""
    joined = (
        zeta.select("id", F.col("label").alias("la"))
        .join(eta.select("id", F.col("label").alias("lb")), "id")
        .persist()
    )
    n = joined.count()
    if n < 2:
        joined.unpersist()
        return 0.0
    sum_z = joined.groupBy("la").agg(F.count(F.lit(1)).alias("s")).agg(_pairs("s")).first()[0] or 0.0
    sum_e = joined.groupBy("lb").agg(F.count(F.lit(1)).alias("s")).agg(_pairs("s")).first()[0] or 0.0
    sum_i = joined.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("s")).agg(_pairs("s")).first()[0] or 0.0
    joined.unpersist()

    max_index = 0.5 * (sum_z + sum_e)
    expected = sum_z * sum_e / (n * (n - 1) / 2.0)
    if math.isclose(max_index, 0.0, abs_tol=1e-12) or math.isclose(
        max_index, expected, abs_tol=1e-12
    ):
        return 0.0
    return float(1.0 - (sum_i - expected) / (max_index - expected))


def graph_structural_rand(graph, zeta: DataFrame, eta: DataFrame) -> float:
    """Graph-structural Rand dissimilarity
    (community/GraphStructuralRandMeasure.cpp:13-38): over the m edges
    (each undirected edge once, self-loops included like forEdges),
    1 - (e11 + e00)/m where e11 = edges whose endpoints agree in BOTH
    partitions and e00 = edges whose endpoints disagree in both. One
    4-way label join over the canonical edge table."""
    ce = graph.edges.filter(F.col("src") <= F.col("dst")).select("src", "dst")
    za = zeta.select(F.col("id").alias("src"), F.col("label").alias("a1"))
    zb = zeta.select(F.col("id").alias("dst"), F.col("label").alias("a2"))
    ea = eta.select(F.col("id").alias("src"), F.col("label").alias("b1"))
    eb = eta.select(F.col("id").alias("dst"), F.col("label").alias("b2"))
    row = (
        ce.join(za, "src").join(zb, "dst").join(ea, "src").join(eb, "dst")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(
                (
                    ((F.col("a1") == F.col("a2")) & (F.col("b1") == F.col("b2")))
                    | ((F.col("a1") != F.col("a2")) & (F.col("b1") != F.col("b2")))
                ).cast("long")
            ).alias("e"),
        )
        .first()
    )
    if not row["m"]:
        raise ValueError("graph-structural rand needs at least one edge")
    return 1.0 - float(row["e"]) / float(row["m"])


def overlapping_nmi_distance(
    cover_x: DataFrame, cover_y: DataFrame, n: int, normalization: str = "max"
) -> float:
    """LFK/McDaid overlapping NMI dissimilarity between two covers
    (community/OverlappingNMIDistance.cpp:36-269, default MAX
    normalization): per cluster pair the adjusted conditional entropy
    H*(Xi|Yj) = H(Xi,Yj) - H(Yj) when h(a)+h(d) >= h(b)+h(c) else the
    unconditional H(Xi) fallback; H(Xi|Y) = min over intersecting Yj
    (initialized at H(Xi), exactly the reference's init); MI = mean of the
    two directions' information gains; distance = 1 - MI/norm.

    Everything is joins + aggregations over (subset-size, intersection)
    tables — per-pair work only for INTERSECTING cluster pairs, so the
    shuffle is bounded by co-membership, not |X| x |Y|. Covers are
    (id, subset) DataFrames."""
    import math as _m

    def h(w):
        return F.when(w > 0, -w.cast("double") * F.log2(w.cast("double") / F.lit(float(n)))).otherwise(F.lit(0.0))

    sx = cover_x.groupBy(F.col("subset").alias("i")).agg(F.count(F.lit(1)).alias("szx"))
    sy = cover_y.groupBy(F.col("subset").alias("j")).agg(F.count(F.lit(1)).alias("szy"))
    inter = (
        cover_x.select("id", F.col("subset").alias("i"))
        .join(cover_y.select("id", F.col("subset").alias("j")), "id")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("isz"))
        .join(sx, "i")
        .join(sy, "j")
        .persist()
    )

    def ent(size_col):
        return h(size_col) + h(F.lit(n) - size_col)

    a = F.lit(n) + F.col("isz") - F.col("szx") - F.col("szy")
    b = F.col("szy") - F.col("isz")
    c = F.col("szx") - F.col("isz")
    d = F.col("isz")
    joint = h(a) + h(b) + h(c) + h(d)
    adj_x_given_y = F.when(
        h(a) + h(d) >= h(b) + h(c), joint - ent(F.col("szy"))
    ).otherwise(ent(F.col("szx")))
    adj_y_given_x = F.when(
        h(a) + h(d) >= h(b) + h(c), joint - ent(F.col("szx"))
    ).otherwise(ent(F.col("szy")))

    def cond_sum(sizes, key, adj_col):
        per = (
            inter.select(F.col(key).alias("k"), adj_col.alias("v"))
            .unionByName(
                sizes.select(
                    F.col(sizes.columns[0]).alias("k"),
                    ent(F.col(sizes.columns[1])).alias("v"),
                )
            )
            .groupBy("k")
            .agg(F.min("v").alias("v"))
            .agg(F.sum("v"))
            .first()[0]
        )
        return float(per or 0.0)

    cond_x = cond_sum(sx, "i", adj_x_given_y)
    cond_y = cond_sum(sy, "j", adj_y_given_x)
    ex = float(sx.agg(F.sum(ent(F.col("szx")))).first()[0] or 0.0)
    ey = float(sy.agg(F.sum(ent(F.col("szy")))).first()[0] or 0.0)
    inter.unpersist()

    mi = 0.5 * (ex - cond_x + ey - cond_y)
    ex, ey = max(ex, 0.0), max(ey, 0.0)
    if ex == 0.0 and ey == 0.0:
        return 0.0  # equal trivial covers -> nmi 1 -> distance 0
    if (ex == 0.0 or ey == 0.0) and normalization in ("min", "geometric"):
        return 1.0
    denom = {
        "max": max(ex, ey),
        "min": min(ex, ey),
        "geometric": _m.sqrt(ex * ey),
        "arithmetic": 0.5 * (ex + ey) * 2 / 2,
        "joint": ex + ey - mi,
    }[normalization]
    if normalization == "arithmetic":
        nmi = 2 * mi / (ex + ey)
    else:
        nmi = mi / denom
    if _m.isnan(nmi):
        nmi = 0.0
    nmi = min(max(nmi, 0.0), 1.0)
    return 1.0 - nmi


def _hash_rank(df: DataFrame, id_cols: list[str], salt: str):
    """Deterministic GLOBAL rank by the cross-engine md5 hash of the id
    columns — the hash-derandomized stand-in for the reference's RNG
    sampling — computed distributed: range-partition on (hash, ids), rank
    within each partition, then add per-partition offsets (collected as P
    tiny rows). Rank values are a pure function of the (hash, ids) total
    order, so they are identical to a single global sort at any
    parallelism — but no task ever sorts more than its own range (no
    `WindowExec: No Partition Defined` single-task sort)."""
    from pyspark.sql import Window

    from networkit_spark.functions.hashing import md5_long_sql

    concat = " || ':' || ".join(f"CAST({c} AS STRING)" for c in id_cols)
    h = F.expr(md5_long_sql(f"('{salt}:' || {concat})"))
    ids = [F.col(c) for c in id_cols]
    # localCheckpoint pins the partition-id assignment across the two
    # actions below (offset collect + downstream use)
    ranged = (
        df.withColumn("_h", h)
        .repartitionByRange(F.col("_h"), *ids)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    off, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        off.append((int(row["_pid"]), acc))
        acc += int(row["_c"])
    off_df = df.sparkSession.createDataFrame(off, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(F.col("_h"), *ids)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn("r", F.row_number().over(w) - 1 + F.col("_off"))
        .drop("_h", "_pid", "_off")
    )


def sampled_node_rand_distance(
    graph, zeta: DataFrame, eta: DataFrame, max_samples: int, seed: int = 42
) -> float:
    """Sampled node-structural Rand dissimilarity
    (community/SampledNodeStructuralRandMeasure.cpp:18-48):
    1 - (n11 + n00)/samples over sampled distinct node pairs. The
    reference draws pairs from its RNG; here the pair set is
    hash-derandomized — vertices ranked by md5(seed, id), rank r paired
    with rank r + floor(n/2) — so both engines (and the DuckDB oracle)
    see the identical sample."""
    ranked = _hash_rank(graph.vertices.select("id"), ["id"], f"{seed}:snr")
    n = ranked.count()
    half = n // 2
    s = min(max_samples, half)
    a = ranked.filter(F.col("r") < s).select(
        F.col("r").alias("k"), F.col("id").alias("u")
    )
    b = ranked.filter(
        (F.col("r") >= half) & (F.col("r") < half + s)
    ).select((F.col("r") - half).alias("k"), F.col("id").alias("v"))
    pairs = a.join(b, "k")
    za = zeta.select(F.col("id").alias("u"), F.col("label").alias("a1"))
    zb = zeta.select(F.col("id").alias("v"), F.col("label").alias("a2"))
    ea = eta.select(F.col("id").alias("u"), F.col("label").alias("b1"))
    eb = eta.select(F.col("id").alias("v"), F.col("label").alias("b2"))
    row = (
        pairs.join(za, "u").join(zb, "v").join(ea, "u").join(eb, "v")
        .agg(
            F.count(F.lit(1)).alias("s"),
            F.sum(
                (
                    ((F.col("a1") == F.col("a2")) & (F.col("b1") == F.col("b2")))
                    | ((F.col("a1") != F.col("a2")) & (F.col("b1") != F.col("b2")))
                ).cast("long")
            ).alias("agree"),
        )
        .first()
    )
    if not row["s"]:
        raise ValueError("sampled node rand needs at least one pair")
    return 1.0 - float(row["agree"]) / float(row["s"])


def sampled_graph_rand_distance(
    graph, zeta: DataFrame, eta: DataFrame, max_samples: int, seed: int = 42
) -> float:
    """Sampled graph-structural Rand dissimilarity
    (community/SampledGraphStructuralRandMeasure.cpp:18-50): the agreement
    fraction over a sample of edges; edges ranked by md5(seed, src, dst)
    and the first max_samples taken, hash-derandomized as above."""
    ce = (
        graph.edges.filter(F.col("src") <= F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    sample = (
        _hash_rank(ce, ["src", "dst"], f"{seed}:sgr")
        .filter(F.col("r") < max_samples)
        .select("src", "dst")
    )
    za = zeta.select(F.col("id").alias("src"), F.col("label").alias("a1"))
    zb = zeta.select(F.col("id").alias("dst"), F.col("label").alias("a2"))
    ea = eta.select(F.col("id").alias("src"), F.col("label").alias("b1"))
    eb = eta.select(F.col("id").alias("dst"), F.col("label").alias("b2"))
    row = (
        sample.join(za, "src").join(zb, "dst").join(ea, "src").join(eb, "dst")
        .agg(
            F.count(F.lit(1)).alias("s"),
            F.sum(
                (
                    ((F.col("a1") == F.col("a2")) & (F.col("b1") == F.col("b2")))
                    | ((F.col("a1") != F.col("a2")) & (F.col("b1") != F.col("b2")))
                ).cast("long")
            ).alias("agree"),
        )
        .first()
    )
    if not row["s"]:
        raise ValueError("sampled graph rand needs at least one edge")
    return 1.0 - float(row["agree"]) / float(row["s"])


def dynamic_nmi_distance(
    graph, old_labels: DataFrame, new_labels: DataFrame
) -> float:
    """1 − 2·MI/(H(ζ)+H(η)) over the nodes of ``graph`` clustered in BOTH
    partitions — community/DynamicNMIDistance.cpp:29-133 (getDissimilarity;
    isInBoth membership rule at :18-23). The inner join on id IS the
    isInBoth restriction, after which the entropy/MI arithmetic is the
    static NMI distance — so this wrapper restricts both label tables to
    the graph's vertex set and delegates (the subsumption SURVEY §2.14
    documented, now exposed under the reference's own name)."""
    ids = graph.vertices.select("id")
    return partition_measures(
        old_labels.join(ids, "id"), new_labels.join(ids, "id")
    )["nmi_distance"]
