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


def test_stratified_sample_rates_and_determinism(spark):
    from networkit_spark.functions.textstats import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(3000)],
        "doc_id long, lang string",
    )
    rates = {"en": 0.25, "fr": 1.0}
    kept = stratified_sample(docs, rates=rates, seed=7)
    rows = kept.collect()
    # every fr row survives (rate 1.0); en lands near 25%
    n_fr = sum(1 for r in rows if r["lang"] == "fr")
    n_en = sum(1 for r in rows if r["lang"] == "en")
    assert n_fr == 1000
    assert 0.18 * 2000 < n_en < 0.32 * 2000
    # derandomized: identical sample on re-run and at other parallelism
    again = {(r["doc_id"], r["lang"]) for r in stratified_sample(
        docs.repartition(13), rates=rates, seed=7).collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} == again
    # different seed -> different sample (overwhelmingly)
    other = {(r["doc_id"], r["lang"]) for r in stratified_sample(
        docs, rates=rates, seed=8).collect()}
    assert {(r["doc_id"], r["lang"]) for r in rows} != other


def test_quality_filter_hand_fixture(spark):
    from networkit_spark.functions.textstats import quality_filter

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),  # keep
            (1, "spam spam spam spam spam spam spam spam"),  # repetitive
            (2, "too short"),                                # length floor
            (3, ""),                                         # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_filter(docs, min_tokens=5).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False and got[1]["dup_fraction"] > 0.3
    assert got[2]["keep"] is False and got[2]["n_tokens"] == 2
    assert got[3]["keep"] is False and got[3]["n_tokens"] == 0


def test_source_profile_hand_fixture(spark):
    from networkit_spark.functions.textstats import source_profile

    docs = spark.createDataFrame(
        [
            (0, "good long document with many distinct interesting words", "en", "a"),
            (1, "spam spam spam spam spam spam spam spam", "en", "a"),
            (2, "otra frase distinta con palabras variadas aqui mismo", "es", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in source_profile(docs).collect()}
    assert got["a"]["n_docs"] == 2 and got["a"]["n_langs"] == 1
    assert got["a"]["keep_fraction"] == 0.5  # spam doc filtered
    assert got["b"]["n_docs"] == 1 and got["b"]["keep_fraction"] == 1.0
    assert got["b"]["mean_dup_fraction"] == 0.0
    assert got["a"]["n_tokens"] == 8 + 8


def test_pretrain_corpus_stage_composition(spark):
    """One doc per elimination reason, plus survivors: the composed pipeline
    must drop exactly the right ids at the right stage."""
    from networkit_spark.functions.pipeline import pretrain_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base + " one two three", "xx", "sA"),      # survivor
            (2, "tiny", "xx", "sA"),                        # quality: too short
            (3, base + " one two three", "xx", "sB"),      # exact dup of 1
            (4, "unrelated words entirely fresh content here okay", "xx", "sB"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "unrelated words entirely fresh content")],
        "doc_id long, text string",
    )
    # no sampling: rates None keeps everything that survives filters
    got = {
        r["doc_id"]: r
        for r in pretrain_corpus(docs, bench, min_tokens=5).collect()
    }
    # 2 fails quality; 3 is an exact duplicate of 1 (higher id loses);
    # 4 shares 3-grams with the benchmark -> decontaminated away
    assert sorted(got) == [1]
    assert got[1]["lang"] == "xx" and got[1]["source"] == "sA"
    assert got[1]["n_tokens"] == 11
    # without a benchmark, doc 4 survives
    got2 = {r["doc_id"] for r in pretrain_corpus(docs, None, min_tokens=5).collect()}
    assert got2 == {1, 4}


def test_pretrain_corpus_near_dup_election(spark):
    """Two near-identical long docs must collapse to the smaller id via the
    LSH canonical election (no exact-dup hash match between them)."""
    from networkit_spark.functions.pipeline import pretrain_corpus

    words = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (10, words + " tail one", "xx", "s"),
            (11, words + " tail two", "xx", "s"),   # near-dup of 10
            (12, " ".join(f"q{i}" for i in range(30)), "xx", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["doc_id"] for r in pretrain_corpus(docs, None).collect()}
    assert got == {10, 12}


def test_pii_redact_hand_fixture(spark):
    import hashlib

    from networkit_spark.functions.textstats import pii_redact

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith@corp.example.org now"),
            (1, "server at 192.168.1.77 port open"),
            (2, "call +1 (555) 010-4242 or 555 123 4567 today"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert (got[0]["n_emails"], got[0]["n_ips"], got[0]["n_phones"]) == (1, 0, 0)
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (0, 1, 0)
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 0, 2)
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (0, 0, 0)
    exp = {
        0: "mail <EMAIL> now",
        1: "server at <IP> port open",
        2: "call <PHONE> or <PHONE> today",
        3: "nothing sensitive here",
    }
    for i, s in exp.items():
        assert got[i]["redacted_fp"] == hashlib.md5(s.encode()).hexdigest(), i


def test_pack_sequences_referee(spark):
    import hashlib

    from networkit_spark.functions.textstats import pack_sequences

    docs = [(i, " ".join(f"tok{j}" for j in range(3 + (i * 7) % 11)))
            for i in range(25)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cap = 20
    got = {r["doc_id"]: (r["n_tokens"], r["bin"], r["bin_offset"])
           for r in pack_sequences(df, capacity=cap).collect()}

    def h(i):
        return int(hashlib.md5(f"42:pack:{i}".encode()).hexdigest()[:12], 16)

    order = sorted(docs, key=lambda d: (h(d[0]), d[0]))
    cum = 0
    for doc_id, text in order:
        n = len(text.split())
        start = cum
        cum += n
        assert got[doc_id] == (n, start // cap, start % cap), doc_id
    # bins are contiguous 0..max with every bin preceding the last full-ish:
    bins = sorted({b for _, b, _ in got.values()})
    assert bins == list(range(bins[-1] + 1))


def test_pack_sequences_parallelism_invariant(spark):
    from networkit_spark.functions.textstats import pack_sequences

    docs = [(i, "w " * (5 + i % 9)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {tuple(r) for r in pack_sequences(df, capacity=16).collect()}
    b = {tuple(r) for r in pack_sequences(df.repartition(13), capacity=16).collect()}
    assert a == b


def test_lm_quality_score_referee(spark):
    """Hand-computed unigram model on a tiny corpus: vocab smaller than the
    distinct-token count so the <unk> bucket is exercised, plus a
    vocab-boundary tie broken by (count DESC, token ASC)."""
    import math

    from networkit_spark.functions.textstats import lm_quality_score

    rows = [
        (1, "aa aa aa bb bb cc"),
        (2, "bb cc dd"),
        (3, "aa zz"),
        (4, ""),  # zero tokens -> absent from the output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in lm_quality_score(df, vocab_size=2, add_k=0.5).collect()
    }
    # corpus counts: aa=4 bb=3 cc=2 dd=1 zz=1 -> vocab={aa,bb}, N=11, V=2,
    # sv=7, unk count=4; denom = 11 + 0.5*3 = 12.5
    def p(cnt):
        return (cnt + 0.5) / 12.5

    lp = {"aa": math.log(p(4)), "bb": math.log(p(3)), "unk": math.log(p(4))}
    exp1 = (3 * lp["aa"] + 2 * lp["bb"] + lp["unk"]) / 6
    exp2 = (lp["bb"] + 2 * lp["unk"]) / 3
    exp3 = (lp["aa"] + lp["unk"]) / 2
    assert set(out) == {1, 2, 3}
    assert out[1]["n_tokens"] == 6 and abs(out[1]["avg_logprob"] - exp1) < 1e-6
    assert out[2]["n_tokens"] == 3 and abs(out[2]["avg_logprob"] - exp2) < 1e-6
    assert out[3]["n_tokens"] == 2 and abs(out[3]["avg_logprob"] - exp3) < 1e-6


def test_lm_quality_score_vocab_tiebreak(spark):
    """cc and dd tie on count at the vocab boundary; (count DESC, token ASC)
    must pick cc in both engines."""
    from networkit_spark.functions.textstats import lm_quality_score

    df = spark.createDataFrame(
        [(1, "cc dd"), (2, "dd cc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm_quality_score(df, vocab_size=1, add_k=0.5).collect()
    }
    # vocab={cc}: both docs have one vocab token (p=(2+.5)/5) and one unk
    # (p=(2+.5)/5) -> identical scores; determinism is the assertion
    assert abs(out[1] - out[2]) < 1e-12


def test_span_dedup_hand_fixture(spark):
    from networkit_spark.functions.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),   # trigrams: tqb qbf bfj
            (1, "the quick brown cat sleeps"),  # shares "the quick brown" with 0
            (2, "nothing in common here at all"),
            (3, "xy"),                          # < n tokens -> no shingles
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_dedup(docs, n=3, threshold=0.34).collect()}
    # doc 0: 3 shingles, 1 shared ("the quick brown") -> 1/3 < 0.34 is False?
    # 1/3 = 0.3333 < 0.34 -> keep
    assert got[0]["n_shingles"] == 3 and got[0]["n_dup_shingles"] == 1
    assert abs(got[0]["dup_fraction"] - 1 / 3) < 1e-6 and got[0]["keep"]
    assert got[1]["n_shingles"] == 3 and got[1]["n_dup_shingles"] == 1
    assert got[2]["n_dup_shingles"] == 0 and got[2]["keep"]
    assert got[3]["n_shingles"] == 0 and got[3]["keep"]
    # tighter threshold drops both sharers
    strict = {r["doc_id"]: r for r in span_dedup(docs, n=3, threshold=0.3).collect()}
    assert not strict[0]["keep"] and not strict[1]["keep"] and strict[2]["keep"]


def test_source_mixing_sqrt_temperature(spark):
    from networkit_spark.functions.textstats import source_mixing

    # 100 crawl docs vs 4 curated docs: sqrt weights 10/12 vs 2/12, so with
    # target=24 the crawl is sampled at 24*(10/12)/100 = 0.2 while the small
    # source saturates at rate 1.0 (up-weighting small sources is the point
    # of temperature mixing)
    rows = [(i, "crawl") for i in range(100)] + [
        (100 + i, "curated") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r for r in source_mixing(docs, target=24).collect()}
    assert got["crawl"]["n_docs"] == 100 and got["curated"]["n_docs"] == 4
    assert abs(got["crawl"]["weight"] - 10 / 12) < 1e-6
    assert abs(got["curated"]["weight"] - 2 / 12) < 1e-6
    assert abs(got["crawl"]["rate"] - 0.2) < 1e-9
    assert got["curated"]["rate"] == 1.0
    # saturated rate keeps every doc; the hash Bernoulli keeps ~20 of 100
    assert got["curated"]["n_sampled"] == 4
    assert 5 <= got["crawl"]["n_sampled"] <= 40
    # derandomized: identical at different parallelism
    again = {
        r["source"]: r["n_sampled"]
        for r in source_mixing(docs.repartition(7), target=24).collect()
    }
    assert again == {s: got[s]["n_sampled"] for s in got}


def test_dsir_resample_referee(spark):
    """Python replica of dsir_resample on a tiny corpus: same md5 buckets,
    same add-k log-ratio model, same Gumbel keys — selection and weights
    must match exactly (6dp)."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from networkit_spark.functions.textstats import dsir_resample

    rows = [
        (1, "alpha beta alpha", True),
        (2, "alpha beta gamma", True),
        (3, "alpha beta beta", False),     # target-like candidate
        (4, "delta epsilon zeta", False),  # off-target candidate
        (5, "alpha alpha beta", False),
        (6, "", False),                    # zero features -> absent
    ]
    B, a, seed = 16, 0.5, 42

    def md5l(t):
        return int.from_bytes(hashlib.md5(t.encode()).digest()[:6], "big")

    def feats(text):
        toks = [t for t in text.split() if t]
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        return [md5l(f"{seed}:dsir:{f}") % B for f in toks + grams]

    ct, cr = [0] * B, [0] * B
    for _, text, is_t in rows:
        for b in feats(text):
            (ct if is_t else cr)[b] += 1
    tt, tr = sum(ct), sum(cr)
    lr = [
        math.log((ct[b] + a) / (tt + a * B)) - math.log((cr[b] + a) / (tr + a * B))
        for b in range(B)
    ]
    want = {}
    for doc_id, text, is_t in rows:
        fs = feats(text)
        if is_t or not fs:
            continue
        logw = round(sum(lr[b] for b in fs), 6)
        u = (md5l(f"{seed}:dsir:g:{doc_id}") + 1.0) / (2.0**48 + 1.0)
        key = logw + round(-math.log(-math.log(u)), 6)
        want[doc_id] = (len(fs), logw, key)

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    tgt = F.col("doc_id").isin([i for i, _, is_t in rows if is_t])
    got = {
        r["doc_id"]: (r["n_feats"], r["logw"], r["key"])
        for r in dsir_resample(df, tgt, k=2, buckets=B, add_k=a).collect()
    }
    top2 = sorted(want, key=lambda d: (-want[d][2], d))[:2]
    assert set(got) == set(top2)
    for d in got:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9
        assert abs(got[d][2] - want[d][2]) < 1e-9
    # the target-like candidate must outrank the off-target one on raw logw
    assert want[3][1] > want[4][1]


def test_source_mixing_custom_source_column(spark):
    # regression: the md5 hash expression used the raw source_col name
    # after it had been aliased to "source" -> AnalysisException for any
    # non-default source_col; counts must also match the default-named run
    from networkit_spark.functions.textstats import source_mixing

    rows = [(i, "crawl") for i in range(100)] + [
        (100 + i, "curated") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    renamed = docs.withColumnRenamed("source", "origin")
    a = {r["source"]: r["n_sampled"]
         for r in source_mixing(docs, target=24).collect()}
    b = {r["source"]: r["n_sampled"]
         for r in source_mixing(renamed, target=24, source_col="origin").collect()}
    assert a == b


def test_hashed_doc_features_numpy_referee(spark):
    """Signed feature hashing equals a hand-rolled referee token for token
    (same md5-prefix bucket/sign semantics), and the dense builder is the
    L2-normalized scatter of the sparse weights."""
    import hashlib
    import math

    from networkit_spark.functions.textstats import (
        hashed_doc_features,
        hashed_doc_vectors,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta beta delta"),
            (3, ""),                       # zero tokens -> absent
        ],
        "doc_id long, text string",
    )
    dim, seed = 8, 42

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    want: dict[tuple, int] = {}
    for doc, text in [(1, "alpha beta gamma alpha"), (2, "beta beta delta")]:
        for tok in text.split():
            b = h48(f"fhb{seed}:{tok}") % dim
            s = h48(f"fhs{seed}:{tok}") % 2 * 2 - 1
            want[(doc, b)] = want.get((doc, b), 0) + s
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_doc_features(docs, dim=dim, seed=seed).collect()
    }
    assert got == want
    assert not any(d == 3 for d, _ in got)

    vecs = {
        r["doc_id"]: r["embedding"]
        for r in hashed_doc_vectors(docs, dim=dim, seed=seed).collect()
    }
    for doc in (1, 2):
        dense = [0.0] * dim
        for (d, b), w in want.items():
            if d == doc:
                dense[b] = float(w)
        nrm = math.sqrt(sum(x * x for x in dense)) or 1.0
        assert all(
            abs(vecs[doc][i] - dense[i] / nrm) < 1e-6 for i in range(dim)
        )
    # identical docs embed identically -> cosine 1.0 through the ANN tier
    from networkit_spark.functions.similarity import cosine_topk

    both = spark.createDataFrame(
        [(1, "same words here today"), (2, "same words here today"),
         (3, "unrelated other tokens")],
        "doc_id long, text string",
    )
    emb = hashed_doc_vectors(both, dim=16)
    top = cosine_topk(
        emb.withColumnRenamed("doc_id", "vec_id"), query_ids=[1], k=1
    ).collect()
    assert top[0]["neighbor_id"] == 2 and abs(top[0]["sim"] - 1.0) < 1e-6


def test_quality_classifier_learns_separable_sources(spark):
    """quality_classifier (GPT-3 WebText-classifier role): on a separable
    corpus the trained model scores high-quality-source documents above
    the low-quality ones, deterministically at any parallelism."""
    from networkit_spark.functions.textstats import quality_classifier

    rows = []
    for i in range(20):
        rows.append((i, f"curated prose well formed sentence {i % 3}", "wiki"))
    for i in range(20, 40):
        rows.append((i, f"spam spam buy now click {i % 3}", "crawl"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = quality_classifier(
        docs, positive_sources=["wiki"], dim=32, lr=8.0, epochs=6, seed=1
    ).toPandas()
    assert set(out["doc_id"]) == set(range(40))
    pos = out[out["label"] == 1.0]["score"]
    neg = out[out["label"] == 0.0]["score"]
    assert pos.mean() > neg.mean() + 0.1
    # scores are ROUND(sigmoid, 6): saturated docs may collapse to 0/1
    assert ((out["score"] >= 0) & (out["score"] <= 1)).all()

    # deterministic at a different shuffle width
    out2 = quality_classifier(
        docs.repartition(7), positive_sources=["wiki"], dim=32, lr=8.0,
        epochs=6, seed=1,
    ).toPandas()
    import pandas.testing as pdt

    pdt.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_quality_classifier_grid_guard(spark):
    from networkit_spark.functions.textstats import quality_classifier

    import pytest

    docs = spark.createDataFrame(
        [(i, "a b c", "s") for i in range(100)],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="2\\^-24"):
        quality_classifier(docs, ["s"], lr=1e-9)
