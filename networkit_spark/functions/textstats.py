"""Text analysis for training-data pipelines: tokenization, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-side (built-in pyspark.sql.functions — no Python in the plan);
every op has a DuckDB-expressible twin in entrylib for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql

STOPWORDS = {
    "en": ["the", "a", "of", "in", "to", "is", "and"],
    "es": ["el", "la", "de", "en", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def norm_text(col: Column) -> Column:
    """lowercase, strip non-alphanumerics, collapse spaces, trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " "
        )
    )


def tokens(col: Column) -> Column:
    return F.filter(F.split(norm_text(col), " "), lambda t: t != "")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars_norm, avg_token_len) — BPE-ish proxy counts.

    Staged projections: the token array is aliased ONCE and downstream
    expressions reference the attribute. Inlining the tokens() subtree at
    every use re-runs the regexp chain per reference (and per array element
    inside higher-order lambdas — the interpreted HOF path re-evaluates
    lambda-captured subtrees), measured 20-40x slower at corpus scale."""
    staged = df.select(
        F.col(id_col), norm_text(F.col(text_col)).alias("__norm")
    ).select(
        F.col(id_col),
        "__norm",
        F.filter(F.split(F.col("__norm"), " "), lambda x: x != "").alias("__t"),
    )
    t = F.col("__t")
    return staged.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.length("__norm").cast("bigint").alias("n_chars_norm"),
        F.round(
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(t), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, stopword_ratio, distinct_ratio, quality) — the standard cheap
    quality heuristics (length/stopword/diversity ratios)."""
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    )
    t = F.col("__t")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n = F.greatest(F.size(t), F.lit(1)).cast("double")
    stop_ratio = F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / n
    distinct_ratio = F.size(F.array_distinct(t)) / n
    quality = 0.5 * distinct_ratio + 0.3 * (1.0 - stop_ratio) + 0.2 * F.least(
        n / 100.0, F.lit(1.0)
    )
    return staged.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_guess) — n-gram/stopword-membership heuristic: per language,
    count token hits in its stopword list; argmax, ties by language code asc,
    'unk' when no hits."""
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
    t = F.col("__t")

    def _membership(words):
        arr = F.array(*[F.lit(w) for w in words])
        # factory keeps the lambda single-arg (Spark inspects the signature)
        return lambda x: F.array_contains(arr, x)

    hits = {
        lang: F.size(F.filter(t, _membership(words))).cast("bigint")
        for lang, words in sorted(STOPWORDS.items())
    }
    # ascending scan with strict > implements (count desc, lang asc): on a
    # tie the earlier language keeps the crown
    best = F.lit("unk")
    best_n = F.lit(0).cast("bigint")
    for lang in sorted(hits):
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    return staged.select(F.col(id_col), best.alias("lang_guess"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp) — 48-bit content fingerprint of the normalized text."""
    normed = df.select(
        F.col(id_col), norm_text(F.col(text_col)).alias("__norm")
    )
    return normed.select(
        F.col(id_col), F.expr(md5_long_sql("__norm")).alias("fp")
    )


def token_topk(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Global top-k tokens by (count desc, token asc)."""
    # explode_outer + null drop: keeps InferFiltersFromGenerate from pushing
    # a size(tokens(text))>0 filter to the scan, where the tokenizer would
    # run a second time per row (see dedup.shingles for the measured cost).
    t = (
        df.select(tokens(F.col(text_col)).alias("__t"))
        .select(F.explode_outer("__t").alias("token"))
        .filter(F.col("token").isNotNull())
    )
    return (
        t.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(id, strata) rows KEPT by per-stratum Bernoulli sampling — the
    language-rebalancing step of a pretraining-data pipeline (down-weight
    over-represented languages/sources to target mixture rates).

    Derandomized: keep iff md5(seed:strata:id) mod 2^20 < rate * 2^20, so
    the decision is a stateless per-row filter — no shuffle, no RNG state,
    any parallelism yields the identical sample, and the DuckDB oracle can
    replay it bit-exactly. At 100 TB this is a scan with a pushed filter.
    """
    h = md5_long_sql(
        f"('strat{seed}:' || CAST({strata_col} AS STRING) || ':' "
        f"|| CAST({id_col} AS STRING))"
    )
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    bucket = F.expr(h) % (1 << 20)
    return (
        df.select(F.col(id_col), F.col(strata_col), bucket.alias("__b"), rate.alias("__r"))
        .filter(F.col("__b") < F.col("__r") * (1 << 20))
        .select(id_col, strata_col)
    )


def staged_tokens_and_grams(
    df: DataFrame, keep_cols: list[str], text_col: str, rep_n: int
) -> DataFrame:
    """keep_cols + ``__t`` (token array) + ``__g`` (word rep_n-grams), each
    materialized ONCE per row via staged projections. Inlining these
    subtrees at every reference re-runs the regexp/tokenize chain per use
    — and per ELEMENT inside higher-order lambdas, because the interpreted
    HOF path re-evaluates lambda-captured subtrees — measured 20-40x slower
    at corpus scale. Downstream references are attribute lookups."""
    staged = df.select(*keep_cols, tokens(F.col(text_col)).alias("__t"))
    return staged.select(
        *keep_cols,
        "__t",
        F.when(
            F.size("__t") >= rep_n,
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - rep_n),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("__t"), i + 1, rep_n)
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__g"),
    )


def _doc_quality_cols(
    min_tokens: int,
    max_dup_fraction: float,
    min_distinct_ratio: float,
) -> tuple[Column, Column, Column, Column]:
    """(n_tokens, dup_fraction, distinct_ratio, keep) expressions over the
    ``__t``/``__g`` attributes of staged_tokens_and_grams — shared by
    quality_filter and source_profile."""
    t, grams = F.col("__t"), F.col("__g")
    n = F.size(t).cast("bigint")
    dup = F.when(F.size(grams) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(grams)) / F.size(grams)
    )
    distinct_ratio = F.size(F.array_distinct(t)) / F.greatest(
        F.size(t), F.lit(1)
    ).cast("double")
    keep = (
        (n >= min_tokens)
        & (dup <= max_dup_fraction)
        & (distinct_ratio >= min_distinct_ratio)
    )
    return n, dup, distinct_ratio, keep


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
) -> DataFrame:
    """(id, n_tokens, dup_fraction, distinct_ratio, keep) — the composed
    C4/Gopher-style document filter: length floor + within-doc n-gram
    repetition ceiling + token-diversity floor, all per-row array exprs
    (zero shuffle; each heuristic is individually oracle-checked by
    text_token_stats / text_ngram_repetition / text_quality)."""
    staged = staged_tokens_and_grams(df, [id_col], text_col, rep_n)
    n, dup, distinct_ratio, keep = _doc_quality_cols(
        min_tokens, max_dup_fraction, min_distinct_ratio
    )
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(dup, 6).alias("dup_fraction"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        keep.cast("boolean").alias("keep"),
    )


def source_profile(
    df: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
) -> DataFrame:
    """(source, n_docs, n_tokens, n_langs, mean_dup_fraction, keep_fraction)
    — the source-level corpus profile behind source filtering / mixture
    decisions (which crawls/feeds to keep, and at what weight). One
    partial-aggregated groupBy over per-row exprs: map-side combine does
    the heavy lifting, the shuffle carries |sources| rows."""
    staged = staged_tokens_and_grams(
        df.select(
            F.col(source_col).alias("source"), F.col(lang_col).alias("lang"),
            F.col(text_col),
        ),
        ["source", "lang"],
        text_col,
        rep_n,
    )
    n, dup, _, keep = _doc_quality_cols(
        min_tokens, max_dup_fraction, min_distinct_ratio
    )
    per_doc = staged.select(
        "source",
        "lang",
        n.alias("__n"),
        dup.alias("__dup"),
        keep.cast("int").alias("__keep"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__n").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.round(F.avg("__dup"), 6).alias("mean_dup_fraction"),
        F.round(F.avg("__keep"), 6).alias("keep_fraction"),
    )


# PII scrub patterns — kept to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround, ASCII \b.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_emails, n_ips, n_phones, redacted_fp) — the PII scrub pass a
    training-data pipeline runs before anything leaves the raw store:
    emails, IPv4 literals, then phone-like digit runs are replaced with
    typed placeholders, in that order (emails and IPs contain digit runs a
    phone pattern would otherwise bite into). Pure per-row JVM regex
    expressions — zero shuffle, scan-speed at 100 TB. The fingerprint
    column is md5 of the fully redacted text so an oracle checks the
    REPLACEMENT bit-exactly without shipping the text back."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IP_RE, "<IP>")
    redacted = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    # every count runs on the SAME intermediate its replacement ran on
    # (n_ips on the email-redacted text, n_phones on the email+IP-redacted
    # text) so the counts describe exactly what the fingerprinted output
    # replaced — an IP swallowed by an email match is neither counted nor
    # replaced
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IP_RE))
        .cast("bigint")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE_RE))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(id, n_tokens, bin, bin_offset) — contiguous-fill sequence packing
    for pretraining batch construction (a training-data op beyond the
    reference): documents are laid out in a deterministic md5-hash order
    (a seeded shuffle that is a pure function of the ids — identical at
    any parallelism), token counts accumulate along that order with the
    distributed range-partition cumsum, and a document is assigned to the
    training bin where it STARTS: bin = floor((cumsum - n_tokens) /
    capacity). Bins average ``capacity`` tokens and overflow by at most
    one document's tail — the standard contiguous greedy fill, with no
    sequential packer in the loop. ``bin_offset`` is the document's token
    offset inside its bin."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.functions.ordering import global_cumsum

    h = F.expr(
        md5_long_sql(f"('{seed}:pack:' || CAST({id_col} AS STRING))")
    )
    base = (
        token_stats(df, id_col=id_col, text_col=text_col)
        .select(id_col, "n_tokens")
        .withColumn("_h", h)
        .withColumn("_one", F.lit(1))
    )
    ranked = global_cumsum(base, ["_h", id_col], ["n_tokens"])
    start = F.col("cum_n_tokens") - F.col("n_tokens")
    return ranked.select(
        id_col,
        "n_tokens",
        F.floor(start / F.lit(float(capacity))).cast("bigint").alias("bin"),
        (start % F.lit(capacity)).cast("bigint").alias("bin_offset"),
    )


def lm_quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    add_k: float = 0.5,
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — unigram-LM quality proxy: train
    token counts over the corpus itself, smooth add-k over the
    top-``vocab_size`` vocabulary plus one OOV bucket, score each document
    by its mean ln p(token). The CCNet-style perplexity filter (Wenzek et
    al., LREC 2020) with the KenLM 5-gram replaced by a corpus-trained
    unigram model — the filtering signal (low mean logprob = gibberish /
    boilerplate / wrong-language text) survives the order reduction, and
    everything stays engine-neutral for the DuckDB oracle.

    Model: vocab = top ``vocab_size`` tokens by (count DESC, token ASC);
    every other token collapses into one <unk> event with the residual
    count, so probabilities sum to 1 over V+1 events:
    p(x) = (cnt_x + k) / (N + k * (V + 1)).

    100 TB shape: one groupBy(token) for counts (uniform keys), a
    TakeOrderedAndProject for the bounded top-V (per-partition top-V, no
    global sort), a broadcast join of the <=vocab_size vocab onto the
    token stream, and one partial-agg groupBy(doc). The model "scalars"
    (N, V, sum of vocab counts) travel as a broadcast 1-row DataFrame —
    no driver-side collect. Zero-token documents produce no token rows
    and are absent from the output (same contract as shingles()).
    """
    staged = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    )
    # explode_outer + null drop: see dedup.shingles — keeps the tokenizer
    # out of an inferred size()>0 filter at the scan
    tok = staged.select("doc_id", F.explode_outer("__t").alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    vocab = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(vocab_size)
    stats = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n_total")).crossJoin(
        vocab.agg(
            F.sum("cnt").cast("bigint").alias("sv"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
    )
    k = float(add_k)
    scored = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "lp",
            F.log(
                (F.coalesce(F.col("cnt"), F.col("n_total") - F.col("sv")) + F.lit(k))
                / (F.col("n_total") + F.lit(k) * (F.col("v") + 1))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def source_mixing(
    df: DataFrame,
    target: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """(source, n_docs, weight, rate, n_sampled) — temperature-weighted
    source mixing (the GPT-3/Pile-style corpus-mixture step: up-weight
    small high-quality sources, down-weight the dominant crawl): source s
    gets mixture weight W_s = sqrt(n_s) / sum_t sqrt(n_t) (temperature
    alpha = 0.5 via an explicit sqrt — IEEE requires sqrt correctly
    rounded, unlike pow, so both engines compute the identical double),
    a per-doc take rate min(1, target * W_s / n_s) rounded to 6dp, and a
    derandomized md5-bucket Bernoulli (same rule as stratified_sample) so
    any parallelism draws the identical sample.

    Shape at 100 TB: one partial-agg groupBy(source) whose shuffle carries
    |sources| rows, a 1-row total, a rate join back onto the corpus that
    AQE broadcasts (rate table is |sources| rows), and a stateless per-row
    hash filter — no global shuffle of the corpus.
    """
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    z = per.agg(F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"))
    rated = per.crossJoin(z).select(
        "source",
        "n_docs",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("z")).alias("__w"),
    )
    rated = rated.select(
        "source",
        "n_docs",
        "__w",
        F.round(
            F.least(F.lit(1.0), F.lit(float(target)) * F.col("__w") / F.col("n_docs")),
            6,
        ).alias("rate"),
    )
    h = md5_long_sql(
        f"('mix{seed}:' || CAST({source_col} AS STRING) || ':' "
        f"|| CAST({id_col} AS STRING))"
    )
    kept = (
        # hash BEFORE aliasing: h's SQL text references the raw source_col
        # name, which no longer resolves after the alias-to-"source" select
        df.select(F.col(source_col), F.col(id_col))
        .withColumn("__b", F.expr(h) % (1 << 20))
        .select(
            F.col(source_col).alias("source"), F.col(id_col), F.col("__b")
        )
        .join(rated.select("source", "rate"), "source")
        .filter(F.col("__b") < F.col("rate") * (1 << 20))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"))
    )
    return (
        rated.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.round("__w", 6).alias("weight"),
            "rate",
            F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
        )
    )


def dsir_resample(
    df: DataFrame,
    target_expr: Column,
    k: int,
    buckets: int = 512,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(doc_id, n_feats, logw, key) — the ``k`` candidate documents chosen
    by DSIR-style importance resampling (Xie et al., NeurIPS 2023, "Data
    Selection for Language Models via Importance Resampling"): hashed
    bag-of-n-gram features (unigrams + word bigrams → ``buckets`` md5
    buckets), add-k-smoothed bucket multinomials p_target (rows where
    ``target_expr``) and p_raw (the remaining candidate pool), per-doc
    importance weight logw = Σ_feats ln p_t(b) − ln p_r(b), then Gumbel
    top-k over the candidate pool: key = round(logw,6) + round(g,6) with
    g = −ln(−ln(u)) and u the doc's md5-unit draw — sampling without
    replacement ∝ exp(logw), fully derandomized.

    100 TB shape: one groupBy(bucket) with conditional partial aggs for
    both models (≤``buckets`` rows, broadcast back), one explode + the
    broadcast join + one partial-agg groupBy(doc) for the weights, and a
    TakeOrderedAndProject for the bounded top-k — no global sort, no
    driver-side model. Docs with zero features produce no rows (same
    contract as shingles()/lm_quality_score). Both addends of ``key``
    are pre-rounded to 6dp so the selection order is engine-exact for
    the DuckDB oracle.
    """
    staged = staged_tokens_and_grams(
        df.select(
            F.col(id_col).alias("doc_id"), target_expr.alias("__is_t"), text_col
        ),
        ["doc_id", "__is_t"],
        text_col,
        2,
    )
    feats = (
        staged.select(
            "doc_id",
            "__is_t",
            F.explode_outer(F.concat("__t", "__g")).alias("feat"),
        )
        .filter(F.col("feat").isNotNull())
        .select(
            "doc_id",
            "__is_t",
            F.expr(
                md5_long_sql(f"('{seed}:dsir:' || feat)") + f" % {int(buckets)}"
            ).alias("b"),
        )
    )
    cnt = feats.groupBy("b").agg(
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).cast("bigint").alias("ct"),
        F.sum(F.when(F.col("__is_t"), 0).otherwise(1)).cast("bigint").alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("bigint").alias("tt"), F.sum("cr").cast("bigint").alias("tr")
    )
    a = float(add_k)
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + a) / (F.col("tt") + a * buckets))
            - F.log((F.col("cr") + a) / (F.col("tr") + a * buckets))
        ).alias("lr"),
    )
    pool = feats.filter(~F.col("__is_t"))
    w = pool.join(F.broadcast(lr), "b").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        F.round(F.sum("lr"), 6).alias("logw"),
    )
    # Gumbel draw: u in (0,1) from the 48-bit md5 integer, both engines
    # compute the identical double ((h+1) / (2^48+1) is exact-input math)
    u = (
        F.expr(md5_long_sql(f"('{seed}:dsir:g:' || CAST(doc_id AS STRING))"))
        + F.lit(1.0)
    ) / F.lit(2.0**48 + 1.0)
    scored = w.select(
        "doc_id",
        "n_feats",
        "logw",
        (F.col("logw") + F.round(-F.log(-F.log(u)), 6)).alias("key"),
    )
    return scored.orderBy(F.desc("key"), F.asc("doc_id")).limit(int(k))


def hashed_doc_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, bucket, weight) — signed feature hashing (the hashing
    trick, Weinberger et al. ICML 2009): every token lands in bucket
    md5("fhb{seed}:" || tok) % dim and contributes sign +1/-1 from an
    independent hash's parity; the per-(doc, bucket) signed count is the
    sparse feature weight. Curation role: a deterministic, model-free
    document embedding that feeds this repo's embedding-space operators
    (cosine/ANN top-k, SemDeDup, cluster-balanced sampling) when no
    learned encoder is available — the unbiased-inner-product guarantee
    of signed hashing is exactly what the downstream cosine comparisons
    need. Weights are integer sums, so cross-engine equality is exact
    (no float order sensitivity); (doc, bucket) groups whose signs cancel
    to 0 are kept (a real group, and the dense builder reads missing and
    zero identically).

    100 TB shape: tokenizer stays out of the scan filter (explode_outer —
    see dedup.shingles), then ONE partial-agg groupBy on (doc_id, bucket)
    with uniform md5 keys. Zero-token documents produce no rows (same
    contract as lm_quality_score / shingles)."""
    from networkit_spark.functions.hashing import md5_long_sql

    staged = df.select(
        F.col(id_col).cast("long").alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    )
    tok = staged.select("doc_id", F.explode_outer("__t").alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    hb = F.expr(md5_long_sql(f"('fhb{seed}:' || tok)"))
    hs = F.expr(md5_long_sql(f"('fhs{seed}:' || tok)"))
    return (
        tok.select(
            "doc_id",
            (hb % dim).cast("int").alias("bucket"),
            (hs % 2 * 2 - 1).cast("long").alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").cast("bigint").alias("weight"))
    )


def hashed_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
    l2_normalize: bool = True,
) -> DataFrame:
    """(doc_id, embedding: array<float>) — dense form of
    hashed_doc_features, schema-compatible with the embeddings table so
    the ANN / SemDeDup / cluster-sampling operators run on raw documents
    directly. The L2 norm is computed from the integer weights in the
    SAME aggregation (exact), then the dense array is built with a single
    map lookup lambda — deliberately not a second HOF over a lambda-built
    array (see the cross-projection lambda-capture note in
    streaming.transcripts_stream.banded_minhash_per_row)."""
    feats = hashed_doc_features(df, id_col, text_col, dim, seed)
    agg = feats.groupBy("doc_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("bucket", "weight")))
        ).alias("bw"),
        F.sqrt(F.sum(F.col("weight") * F.col("weight")).cast("double")).alias("nrm"),
    )
    denom = F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(F.lit(1.0)) if (
        l2_normalize
    ) else F.lit(1.0)
    return agg.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.coalesce(F.col("bw")[i.cast("int")], F.lit(0)).cast("double")
                / denom
            ).cast("float"),
        ).alias("embedding"),
    )


def quality_classifier(
    df: DataFrame,
    positive_sources: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    dim: int = 64,
    lr: float = 4.0,
    epochs: int = 3,
    seed: int = 42,
    pareto_alpha: float = 9.0,
) -> DataFrame:
    """(doc_id, label, score, keep) — the GPT-3 WebText-quality-classifier
    curation step (Brown et al. 2020, app. A; the same role as fastText
    quality filters in LLaMA/RedPajama): train a logistic-regression
    classifier on signed hashed features with weak source labels
    (documents from ``positive_sources`` are the high-quality class), then
    score every document and keep it when a derandomized Pareto draw
    exceeds 1 - score (GPT-3's ``np.random.pareto(alpha) > 1 - score``
    with alpha = 9).

    Training is synchronous full-batch mean-gradient descent under the
    SGNS dyadic-grid protocol (operators/sgns.py module docstring): the
    per-doc coefficient lr*(y - sigmoid(w.x))/n_docs snaps to the 2^-24
    grid after the sigmoid (absorbing cross-libm EXP ULPs), every
    per-bucket gradient contribution snaps to the 2^-30 grid before the
    SUM, and weights start at exactly 0 — so sums are order-exact, the
    run is deterministic at any parallelism, and the DuckDB oracle is
    bit-identical. The feature dot products w.x are themselves exact (w
    stays on the 2^-30 grid, x is an integer signed count) while |w.x|
    stays under 2^23 — far above anything ``epochs * lr`` can reach here.
    The Pareto draw (1-u)^(-1/alpha) - 1 uses libm pow, so it too is
    snapped to 2^-24 and compared against 1 - ROUND(score, 6).

    100 TB shape: per epoch, one bucket-keyed equi-join (dim+1 weight rows,
    broadcastable) + one doc-keyed groupBy for the dots, one doc-keyed
    equi-join + one bucket-keyed partial-agg groupBy for the gradient —
    the sgns epoch shape; nothing driver-side but the doc count."""
    from networkit_spark.functions.hashing import md5_long_sql
    from networkit_spark.plans.checkpoint import IterationState, materialize

    spark = df.sparkSession
    Q24, Q30 = float(1 << 24), float(1 << 30)

    def snap(col, grid):
        return F.floor(col * F.lit(grid) + F.lit(0.5)) / F.lit(grid)

    feats = materialize(
        hashed_doc_features(df, id_col, text_col, dim=dim, seed=seed)
    )
    pos = [str(s) for s in positive_sources]
    labels = materialize(
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.when(F.col(source_col).isin(pos), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("y"),
        )
    )
    n_docs = labels.count()
    if n_docs == 0:
        return spark.createDataFrame(
            [], "doc_id long, label double, score double, keep boolean"
        )
    if lr / n_docs < 1.0 / Q24:
        raise ValueError(
            f"lr/n_docs = {lr}/{n_docs} is below the 2^-24 coefficient grid: "
            "every snapped gradient would be 0; raise lr proportionally"
        )

    # weights: buckets 0..dim-1 plus the bias at bucket -1, all exactly 0
    w = spark.createDataFrame(
        [(b, 0.0) for b in range(-1, dim)], "bucket int, w double"
    ).localCheckpoint(eager=True)
    it = IterationState(None, "quality_classifier")

    def dots(weights):
        dp = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("weight")).alias("dp"))
        )
        bias = weights.filter(F.col("bucket") == -1).select(
            F.col("w").alias("bias")
        )
        return (
            labels.join(dp, "doc_id", "left")
            .crossJoin(F.broadcast(bias))
            .select(
                "doc_id",
                "y",
                (F.col("bias") + F.coalesce(F.col("dp"), F.lit(0.0))).alias("z"),
            )
        )

    for e in range(epochs):
        scored = dots(w).select(
            "doc_id",
            snap(
                F.lit(lr)
                * (F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))))
                / F.lit(float(n_docs)),
                Q24,
            ).alias("g"),
        )
        gw = (
            feats.join(scored, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(snap(F.col("g") * F.col("weight"), Q30)).alias("dv"))
        )
        gb = scored.agg(F.sum(snap(F.col("g"), Q30)).alias("dv")).select(
            F.lit(-1).cast("int").alias("bucket"), "dv"
        )
        w = it.advance(
            e + 1,
            w.join(gw.unionByName(gb), "bucket", "left").select(
                "bucket",
                (F.col("w") + F.coalesce(F.col("dv"), F.lit(0.0))).alias("w"),
            ),
        )

    u = F.expr(md5_long_sql(f"('qcls{seed}:' || CAST(doc_id AS STRING))")) / F.lit(
        float(1 << 48)
    )
    draw = snap(
        F.pow(F.lit(1.0) - u, F.lit(-1.0 / pareto_alpha)) - F.lit(1.0), Q24
    )
    out = dots(w).select(
        "doc_id",
        F.col("y").alias("label"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("score"),
        (draw > (F.lit(1.0) - F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6
        ))).alias("keep"),
    )
    out = out.localCheckpoint(eager=True)
    it.close()
    return out
