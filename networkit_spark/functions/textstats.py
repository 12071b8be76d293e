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
    """(id, n_tokens, n_chars_norm, avg_token_len) — BPE-ish proxy counts."""
    t = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(t).cast("bigint").alias("n_tokens"),
        F.length(norm_text(F.col(text_col))).cast("bigint").alias("n_chars_norm"),
        F.round(
            F.aggregate(t, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(t), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, stopword_ratio, distinct_ratio, quality) — the standard cheap
    quality heuristics (length/stopword/diversity ratios)."""
    t = tokens(F.col(text_col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n = F.greatest(F.size(t), F.lit(1)).cast("double")
    stop_ratio = F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / n
    distinct_ratio = F.size(F.array_distinct(t)) / n
    quality = 0.5 * distinct_ratio + 0.3 * (1.0 - stop_ratio) + 0.2 * F.least(
        n / 100.0, F.lit(1.0)
    )
    return df.select(
        F.col(id_col),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_guess) — n-gram/stopword-membership heuristic: per language,
    count token hits in its stopword list; argmax, ties by language code asc,
    'unk' when no hits."""
    t = tokens(F.col(text_col))

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
    return df.select(F.col(id_col), best.alias("lang_guess"))


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
    t = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    return (
        t.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )
