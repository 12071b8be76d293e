"""End-to-end pretraining-corpus construction pipeline.

Composes the individually oracle-checked training-data operators into the
pipeline a user actually runs over a raw crawl before training: document
quality filtering -> exact dedup -> near-dup canonical election (MinHash
LSH) -> eval-set decontamination -> language-rebalanced stratified
sampling. No reference counterpart (NetworKit is a graph library); this is
the "operations a large-scale training-data pipeline needs" tier, composed
so the whole flow is one value-exact gate query.

Every stage keeps the shape already audited for 100 TB in its home module:

* quality filter — per-row array exprs, zero shuffle (textstats.py);
* exact dedup — one groupBy on a uniform md5 digest (dedup.py);
* near-dup — banded LSH equi-join with stop-bucket cap, then pinned
  min-label components; never all-pairs (dedup.py);
* decontamination — benchmark shingle side is eval-corpus sized (AQE
  broadcasts it), corpus side streams (dedup.py);
* stratified sample — stateless per-row hash filter, no shuffle, no RNG
  state (textstats.py).

The composition itself adds only doc_id-keyed semi/anti joins between
stages — plain hash equi-joins on the corpus key, each pruned to the id
column on the filter side. Determinism end-to-end (every stage is
hash-derandomized) is what lets the DuckDB oracle replay the whole
pipeline bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.dedup import (
    canonical_docs,
    decontaminate,
    exact_duplicates,
    minhash_bands,
    minhash_candidate_pairs,
    shingles,
)
from networkit_spark.functions.textstats import quality_filter, stratified_sample
from networkit_spark.plans.checkpoint import materialize


def pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    min_tokens: int = 5,
    max_dup_fraction: float = 0.3,
    min_distinct_ratio: float = 0.3,
    rep_n: int = 2,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
    cc_rounds: int = 4,
    strat_rates: dict[str, float] | None = None,
    strat_default_rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, lang, source, n_tokens) — the documents that survive the
    full pipeline, with their token counts.

    Stage order is the conventional one: cheap per-row filters first
    (quality), then exact dedup (cheapest shuffle), then near-dup LSH over
    the already-shrunk corpus, then decontamination, then sampling last so
    mixture rates apply to the CLEAN corpus. ``benchmark`` rows are the
    held-out eval set; pass None to skip decontamination. ``strat_rates``
    of None skips sampling."""
    # Stage boundaries are lineage cuts (plans/checkpoint.py): each stage's
    # survivor set is referenced 2-3x downstream (shingle pass + semi join +
    # final projection), and without truncation the composed logical plan
    # re-inlines the whole upstream pipeline at every reference — the
    # engine's documented Spark-native failure mode for chained stages.
    qf = materialize(
        quality_filter(
            docs, id_col, text_col, min_tokens, max_dup_fraction,
            min_distinct_ratio, rep_n,
        )
    )
    survivors = docs.join(
        qf.filter("keep").select(id_col), id_col, "semi"
    )

    reps = exact_duplicates(survivors, id_col, text_col).select(
        F.col("rep_id").alias(id_col)
    )
    survivors = materialize(survivors.join(reps, id_col, "semi"))

    sh = shingles(survivors, id_col, text_col, shingle_n)
    pairs = minhash_candidate_pairs(
        minhash_bands(sh, num_hashes, bands), max_bucket
    )
    non_canonical = (
        canonical_docs(pairs, cc_rounds)
        .filter(F.col("id") != F.col("canonical"))
        .select(F.col("id").alias(id_col))
    )
    survivors = materialize(survivors.join(non_canonical, id_col, "anti"))

    if benchmark is not None:
        dec = decontaminate(survivors, benchmark, shingle_n, id_col, text_col)
        survivors = survivors.join(
            dec.filter(~F.col("contaminated")).select(id_col), id_col, "semi"
        )

    if strat_rates is not None:
        sampled = stratified_sample(
            survivors, strat_rates, lang_col, id_col, strat_default_rate, seed
        )
        survivors = survivors.join(sampled.select(id_col), id_col, "semi")

    return survivors.join(qf.select(id_col, "n_tokens"), id_col).select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        F.col("n_tokens"),
    )
