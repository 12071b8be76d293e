"""Deduplication operators for corpus-scale pipelines.

exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, and n-gram Jaccard — each expressible in DuckDB SQL for the
correctness gate, each shaped so the expensive stage is a shuffle on a
bounded key (band bucket / shingle), never an O(n^2) cross join.

Scale notes (100 TB corpus):
- exact dedup is one groupBy on a 48-bit digest — pure shuffle, salt-free
  (digests are uniform).
- MinHash-LSH candidate generation joins on (band, bucket); bucket sizes are
  the skew risk, so callers cap bucket width (``max_bucket``) exactly like
  production LSH pipelines drop degenerate buckets.
- n-gram Jaccard joins on shared shingles; the same cap applies to
  stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.functions.textstats import tokens


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(text_hash, dup_count, rep_id) — one row per distinct text; rep_id is
    the smallest member id (the canonical survivor)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dup_count"),
            F.min(id_col).alias("rep_id"),
        )
    )


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-grams built per row with staged array
    expressions, then exploded.

    Scale note: an earlier version built grams with lead() over
    Window.partitionBy(id), which shuffles the EXPLODED token table (~10x
    the corpus row count) by doc id — at 100 TB that was the single largest
    exchange in every shingle consumer. The per-row array build
    (staged_tokens_and_grams) produces identical values with zero shuffle;
    the only exchange left in the consumers is their own groupBy/join.
    The DuckDB oracle keeps its lead()-window formulation (values are
    identical; the oracle runs at gate scale only).

    explode_outer (not explode) is load-bearing: InferFiltersFromGenerate
    only fires on non-outer Generate, and the size(__g)>0 filter it infers
    gets predicate-pushed below BOTH staged projections, inlining the whole
    tokenize+gram CASE into a Filter at the file scan — the chain then runs
    twice per row, once inside the (often single-task) scan stage. Measured
    25.5s -> 3.8s at sf0.1/local[32]; the null rows outer-explode adds for
    <n-token docs are dropped right above the Generate."""
    from networkit_spark.functions.textstats import staged_tokens_and_grams

    staged = staged_tokens_and_grams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        ["id"],
        text_col,
        n,
    )
    return (
        staged.select("id", F.explode_outer("__g").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .distinct()
    )


def minhash_bands(
    sh: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(id, band, bucket) — per doc, ``num_hashes`` min-hashes (lexicographic
    min of md5(seed || shingle) — a uniform permutation proxy identical in
    any engine with md5), grouped into ``bands`` buckets of
    num_hashes/bands rows each; bucket = md5 of the concatenated band
    signature.  ``bands`` must divide ``num_hashes`` — a remainder would
    silently discard the trailing hashes and change the collision
    probability the caller asked for."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows = num_hashes // bands
    mins = sh.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    out = None
    for b in range(bands):
        sig = F.concat_ws("|", *[F.col(f"h{b * rows + j}") for j in range(rows)])
        part = mins.select(
            "id", F.lit(b).cast("int").alias("band"), F.md5(sig).alias("bucket")
        )
        out = part if out is None else out.unionByName(part)
    return out


def minhash_candidate_pairs(
    band_df: DataFrame, max_bucket: int = 50
) -> DataFrame:
    """(id_a, id_b) distinct candidate pairs sharing any band bucket;
    degenerate buckets wider than ``max_bucket`` are dropped (stop-bucket
    cap — the LSH skew guard)."""
    sized = band_df.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("sz") <= max_bucket)
    a = sized.select("band", "bucket", F.col("id").alias("id_a"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, simhash) — sign-sum over distinct-token 48-bit hashes, packed
    into a ``bits``-wide BIGINT."""
    # Stage the token array, then explode_outer: a plain explode of
    # tokens(text) makes InferFiltersFromGenerate push a size(tokens(text))>0
    # filter to the scan, re-running the tokenizer per row there (see
    # shingles()). Empty-token docs produce a null row, dropped below.
    tok = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__t"))
        .select("id", F.explode_outer("__t").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .distinct()
        .withColumn("hv", F.expr(md5_long_sql("tok")))
    )
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(hv >> {j}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    packed = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("bigint")
        packed = term if packed is None else packed + term
    return bit_sums.select("id", packed.alias("simhash"))


def jaccard_pairs(
    sh: DataFrame, threshold: float = 0.5, max_shingle_freq: int = 100
) -> DataFrame:
    """(id_a, id_b, jaccard) over distinct-shingle sets, via the shared-
    shingle join (never all-pairs). Shingles occurring in more than
    ``max_shingle_freq`` docs are dropped (stop-shingle cap)."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(
        freq.filter(F.col("df") <= max_shingle_freq).select("shingle"),
        "shingle",
        "semi",
    )
    sizes = kept.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = kept.select("shingle", F.col("id").alias("id_a"))
    b = kept.select("shingle", F.col("id").alias("id_b"))
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sa") + F.col("sb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def canonical_docs(pairs: DataFrame, rounds: int = 4) -> DataFrame:
    """(id, canonical) — elect one canonical document per near-duplicate
    CLUSTER: connected components over the candidate-pair graph with the
    lexicographically smallest member id as the representative (the
    "cluster duplicates, keep one" step a dedup pipeline runs after LSH).

    Min-label propagation with a PINNED round count: each round every
    paired doc takes the min of its own label and its neighbors' labels —
    converged once ``rounds`` reaches the cluster diameter.  Near-dup
    clusters are short chains of band-bucket collisions (the stop-bucket
    cap bounds their size), so a handful of rounds is exact; a production
    run would iterate to fixpoint with the same superstep.  Pinned rounds
    keep the DuckDB oracle an exact replay.  Only docs appearing in some
    pair are returned (everything else is trivially its own canonical).
    """
    sym = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionByName(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    )
    lab = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("canonical"))
    )
    for _ in range(rounds):
        nbr_min = (
            sym.join(lab.select(F.col("id").alias("v"), "canonical"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("canonical").alias("nmin"))
        )
        lab = lab.join(nbr_min, "id", "left").select(
            "id", F.least("canonical", F.coalesce("nmin", "canonical")).alias("canonical")
        )
    return lab


def ngram_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(doc_id, total_ngrams, distinct_ngrams, dup_fraction) — WITHIN-document
    n-gram repetition (the MassiveText/Gopher-style repetition filter tier:
    high dup_fraction flags boilerplate/looping text). Entirely per-row array
    expressions — zero shuffle, linear scan at any corpus size. The token
    and gram arrays are staged (computed once, referenced as attributes):
    inlining them re-runs the tokenize chain per reference and per lambda
    element on the interpreted HOF path, measured 20-40x slower."""
    from networkit_spark.functions.textstats import staged_tokens_and_grams

    staged = staged_tokens_and_grams(df, [id_col], text_col, n)
    grams = F.col("__g")
    return staged.select(
        F.col(id_col),
        F.size(grams).cast("bigint").alias("total_ngrams"),
        F.size(F.array_distinct(grams)).cast("bigint").alias("distinct_ngrams"),
        F.round(
            F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(grams)) / F.size(grams)
            ),
            6,
        ).alias("dup_fraction"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every doc in ``docs``: n_hits =
    distinct word n-grams shared with ``benchmark`` (the eval-set
    decontamination pass every training-data pipeline runs before
    training). Shape at 100 TB: the benchmark shingle set is eval-corpus
    sized (small) — AQE broadcasts it — while the 100 TB doc side streams
    through one shingle join + per-doc agg; use a large n (13-grams in
    production) so benchmark shingles stay selective."""
    doc_sh = shingles(docs, id_col, text_col, n)
    bench_sh = shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    hits = (
        doc_sh.join(bench_sh, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def span_dedup(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_dup_shingles, dup_fraction, keep) — CROSS-
    document duplicated-span filter (the RefinedWeb / C4 "repeated span"
    tier): for every document, the fraction of its distinct word n-grams
    that also occur in at least one OTHER document; documents whose
    duplicated-span fraction reaches ``threshold`` are flagged keep=false.

    Complements the existing dedup family: exact/minhash/simhash judge
    WHOLE documents, ngram_repetition is WITHIN-document — this is the
    between-document partial-overlap tier (boilerplate headers, quoted
    spans, templated pages) that C4 handles with its three-sentence-span
    rule (Raffel et al., JMLR 2020 §2.2; here sentences -> word n-grams
    because the corpus has no sentence boundaries).

    Shape at 100 TB: shingles() is a zero-shuffle per-row array build +
    explode; document frequency is ONE groupBy on uniform shingle keys
    (partial-agg absorbs hot shingles map-side); the join back to per-doc
    rows re-shuffles on the same shingle key (no new key, AQE reuses the
    layout), and the final per-doc agg shuffles doc-sized rows. No stage
    holds a per-document all-pairs product, so corpus size only scales the
    shuffle linearly. Documents with fewer than n tokens have no shingles
    and are reported with n_shingles=0, keep=true (same contract as
    decontaminate's left join).
    """
    sh = shingles(docs, id_col, text_col, n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    per_doc = (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_shingles"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_dup_shingles", F.lit(0))
            .cast("bigint")
            .alias("n_dup_shingles"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(0.0)
                ).otherwise(
                    F.coalesce("n_dup_shingles", F.lit(0))
                    / F.coalesce("n_shingles", F.lit(1))
                ),
                6,
            ).alias("dup_fraction"),
            # keep decides on the SAME rounded 6dp value emitted as
            # dup_fraction, so the reported number can never contradict
            # the flag at the threshold boundary (rounded-decision
            # convention, as in semdedup)
            (
                F.round(
                    F.when(
                        F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(0.0)
                    ).otherwise(
                        F.coalesce("n_dup_shingles", F.lit(0))
                        / F.coalesce("n_shingles", F.lit(1))
                    ),
                    6,
                )
                < threshold
            ).alias("keep"),
        )
    )
