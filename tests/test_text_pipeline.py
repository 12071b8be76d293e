"""ngram_repetition / decontaminate unit fixtures (the rest of the text
pipeline is value-checked by the driver gate; these two get hand oracles)."""

from networkit_spark.functions.dedup import decontaminate, ngram_repetition


def test_ngram_repetition_hand_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b a b a"),      # 2-grams: ab ba ab ba -> 4 total, 2 distinct
            (1, "x y z"),          # xy yz -> 2 total, 2 distinct
            (2, "w"),              # shorter than n -> 0
            (3, ""),               # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_repetition(docs, n=2).collect()}
    assert (got[0]["total_ngrams"], got[0]["distinct_ngrams"]) == (4, 2)
    assert abs(got[0]["dup_fraction"] - 0.5) < 1e-9
    assert (got[1]["total_ngrams"], got[1]["dup_fraction"]) == (2, 0.0)
    assert got[2]["total_ngrams"] == 0 and got[2]["dup_fraction"] == 0.0
    assert got[3]["total_ngrams"] == 0


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "a totally different sentence here"),
            (2, "brown fox jumps over things"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert len(got) == 3  # every target doc present, hit or not
    # doc 0 shares "quick brown fox" + "brown fox jumps"
    assert got[0]["n_hits"] == 2 and got[0]["contaminated"]
    assert got[1]["n_hits"] == 0 and not got[1]["contaminated"]
    assert got[2]["n_hits"] == 1 and got[2]["contaminated"]
