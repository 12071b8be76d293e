"""Skip-gram-with-negative-sampling (SGNS) embedding trainer over walks.

Reference: networkit/cpp/embedding/LearnEmbedding.cpp (bundled word2vec,
Mikolov et al. 2013) consumed by embedding/Node2Vec.cpp:40-55 and
exercised end-to-end by embedding/test/EmbeddingGTest.cpp — walks from
BiasedRandomWalk feed a skip-gram objective: for every (center c,
context o) pair within ``window`` positions of the same walk, plus k
negative draws per pair, ascend sigma(label - sigmoid(in[c]·out[o])).

Documented deviations from the reference trainer (each is what makes the
distributed trainer deterministic and oracle-checkable; the OBJECTIVE and
the walk->embedding role are the same):

- **Synchronous full-batch GD, not hogwild SGD.** The reference's word2vec
  updates weights per-sample from racing threads (results differ
  run-to-run even at fixed seed). Here every epoch computes all pair
  gradients against the epoch-start weights, averages them (mean
  gradient), and applies ONE update — the distributed-natural formulation
  (two groupBy aggregations per epoch), identical at any parallelism.
- **Derandomized unigram^0.75 negative sampling** (default; r5 — closes
  the larger of r4's two documented deviations): word2vec's quantized
  unigram table (LearnEmbedding.cpp InitUnigramTable role) rebuilt with
  integer-exact arithmetic so both engines agree bit-for-bit —
  cnt^0.75 = sqrt(sqrt(cnt^3)) (sqrt IS correctly rounded in IEEE 754,
  unlike pow), snapped to an integer weight on the 2^-20 grid; slots
  apportioned by integer largest-remainder; the slot table materialized
  as T rows and each draw an md5-mod-T EQUI-join on the slot — the same
  scale shape as the uniform draw (``neg_dist="uniform"`` keeps it).
  Draws that collide with the pair's true context are dropped (the
  reference's word2vec `if (target == word) continue`).
- **Exact sigmoid, no MAX_EXP lookup table** (the table is a CPU-cache
  trick, not semantics).

Bit-exact cross-engine protocol (what makes the DuckDB oracle hash-green
instead of katz-style ULP-red): IEEE +,-,*,/ are correctly rounded and
therefore bit-identical across engines GIVEN the same association order,
but (a) libm EXP differs by ULPs between the JVM and DuckDB and (b)
SUM over a shuffled row set is order-dependent. So:

- the per-pair coefficient g = lr*(label - sigmoid(score))/P is snapped to
  the 2^-24 grid (``floor(x*2^24 + 0.5)/2^24``) right after the sigmoid —
  both engines land on the same grid point unless g sits within ~1 ULP of
  a grid boundary (P ~ 2^-29 per pair);
- every gradient CONTRIBUTION g*w is snapped to the 2^-30 grid before the
  per-(node, dim) SUM. A sum of exact multiples of 2^-30 whose magnitude
  stays below 2^23 is EXACT in IEEE doubles in ANY accumulation order —
  the aggregation becomes integer arithmetic in disguise, so Spark's
  partial-agg tree and DuckDB's serial fold agree bit-for-bit;
- weights start on the 2^-30 grid (init snaps the md5-uniform draw) and
  updates add grid sums, so they STAY on the grid across epochs — no
  drift to re-sync.

Scale shape: pairs = one self-join of the walk table bounded by
window x walk positions; negatives = an equi-join against a dense node
rank; each epoch = two equi-joins (weights into pairs) + two
groupBy(node) partial aggs + two id-keyed update joins. Nothing is
collected but two scalars (|V|, |pairs|); 10^9 walks are just more rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.hashing import md5_long_sql
from networkit_spark.plans.checkpoint import IterationState, materialize

_Q24 = 1 << 24   # coefficient grid: absorbs cross-libm EXP ULPs
_Q30 = 1 << 30   # contribution grid: makes gradient SUMs order-exact


def _snap(col: F.Column, grid: int) -> F.Column:
    """floor(x*grid + 0.5)/grid — round-half-up onto a dyadic grid with
    the identical expression text the SQL oracle uses."""
    return F.floor(col * F.lit(float(grid)) + F.lit(0.5)) / F.lit(float(grid))


def skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """(walk_id, cs, os, c, o) — every (center, context) position pair of
    the same walk within ``window`` steps (both directions, like word2vec's
    symmetric context scan)."""
    a = walks.select("walk_id", F.col("step").alias("cs"), F.col("node").alias("c"))
    b = walks.select("walk_id", F.col("step").alias("os"), F.col("node").alias("o"))
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("cs") != F.col("os"))
            & (F.abs(F.col("cs") - F.col("os")) <= window)
        )
    )


def unigram_table(
    walks: DataFrame, table_size: int | None = None
) -> tuple[DataFrame, int]:
    """((slot, node) quantized unigram^0.75 draw table, T) over the walk
    corpus — word2vec's InitUnigramTable with deterministic integer
    apportionment (module docstring). T defaults to 8x the vocabulary
    (>= word2vec's 1e8/|V| slot density at any corpus that matters);
    every arithmetic step is exact in int64, so the oracle SQL lands on
    the identical table. Scale shape: one count groupBy, two
    range-partition cumsums over the |V|-row weight table (no single-task
    window), one T-row explode."""
    from networkit_spark.functions.ordering import global_cumsum

    cnt = walks.groupBy("node").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    # cnt^0.75 via sqrt(sqrt(cnt^3)): sqrt is correctly rounded (IEEE), so
    # the double is bit-identical in any engine; snap to the 2^-20 integer
    # grid. (pow() is NOT correctly rounded and could flip the floor.)
    q = cnt.select(
        "node",
        F.floor(
            F.sqrt(F.sqrt(F.col("cnt") * F.col("cnt") * F.col("cnt")))
            * F.lit(float(1 << 20))
            + F.lit(0.5)
        ).cast("long").alias("q"),
    )
    tot = q.agg(
        F.sum("q").alias("qq"), F.count(F.lit(1)).alias("v"), F.max("q").alias("mq")
    ).first()
    big_q, vocab, max_q = int(tot["qq"]), int(tot["v"]), int(tot["mq"])
    T = table_size if table_size is not None else 8 * vocab
    # the apportionment computes T*q in int64; DuckDB silently promotes to
    # hugeint while Spark would wrap — refuse the divergence loudly
    if max_q > (2**63 - 1) // max(T, 1):
        raise ValueError(
            f"unigram_table: T*max(q) = {T}*{max_q} overflows int64; pass a "
            "smaller table_size (slots per node only need ~constant factor "
            "over the vocabulary)"
        )
    # integer largest-remainder apportionment of T slots by weight
    base = q.select(
        "node",
        "q",
        F.expr(f"(CAST({T} AS BIGINT) * q) DIV {big_q}").alias("base"),
        F.expr(f"(CAST({T} AS BIGINT) * q) % {big_q}").alias("rem"),
        F.lit(1).cast("long").alias("one"),
    )
    leftover = T - int(base.agg(F.sum("base")).first()[0])
    ranked = global_cumsum(
        base.withColumn("nrem", -F.col("rem")), ["nrem", "node"], ["one"]
    ).select(
        "node",
        (
            F.col("base")
            + F.when(F.col("cum_one") <= leftover, F.lit(1)).otherwise(F.lit(0))
        ).alias("slots"),
    )
    occupied = ranked.filter(F.col("slots") > 0).withColumn(
        "sl", F.col("slots").cast("long")
    )
    started = global_cumsum(occupied, ["node"], ["sl"]).select(
        "node", "slots", (F.col("cum_sl") - F.col("slots")).alias("start")
    )
    table = started.select(
        "node",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.col("slots") - 1)
        ).alias("slot"),
    ).select("slot", "node")
    return materialize(table), T


def train_sgns(
    walks: DataFrame,
    vertices: DataFrame,
    dim: int = 8,
    window: int = 2,
    negatives: int = 2,
    lr: float = 4.0,
    epochs: int = 3,
    seed: int = 42,
    neg_dist: str = "unigram75",
) -> DataFrame:
    """(id, emb array<double>) — the in-embedding matrix after ``epochs``
    synchronous mean-gradient SGNS epochs over ``walks``
    (walk_id, step, node). ``vertices`` is the (id) universe: every vertex
    gets a row (untrained ones keep their init vector), and negative draws
    are uniform over it. ``lr`` is the mean-gradient step size (the update
    magnitude is lr * pair-share, so values ~1-10 are the useful range).
    Deterministic at any parallelism and bit-identical to the SQL oracle
    (module docstring protocol)."""
    spark = walks.sparkSession

    pos = skipgram_pairs(walks, window)
    reps = spark.range(negatives).select(F.col("id").cast("int").alias("i"))
    draw = F.expr(
        md5_long_sql(
            f"('{seed}:neg:' || CAST(i AS STRING) || ':' || "
            "CAST(walk_id AS STRING) || ':' || CAST(cs AS STRING) || ':' || "
            "CAST(os AS STRING))"
        )
    )
    if neg_dist == "unigram75":
        # word2vec unigram^0.75 draw table (equi-join on the slot)
        table, T = unigram_table(walks)
        neg = (
            pos.crossJoin(reps)
            .withColumn("slot", draw % F.lit(T))
            .join(table, "slot")
        )
    elif neg_dist == "uniform":
        # dense rank of the vertex universe for uniform draws; ids are
        # non-negative graph ids, compact_labels orders them numerically
        from networkit_spark.operators.clustering_tools import compact_labels

        rank = materialize(
            compact_labels(vertices.select(F.col("id").alias("label")))
            .select(F.col("label").alias("node"), F.col("cid").alias("rank"))
        )
        n_ranks = rank.count()
        neg = (
            pos.crossJoin(reps)
            .withColumn("rank", draw % F.lit(n_ranks))
            .join(rank, "rank")
        )
    else:
        raise ValueError(f"neg_dist must be 'unigram75' or 'uniform', got {neg_dist!r}")
    neg = (
        neg.filter(F.col("node") != F.col("o"))  # word2vec skips target==word
        .select("walk_id", "cs", "os", "c", F.col("node").alias("o"),
                F.lit(0.0).alias("label"))
    )
    pairs = materialize(
        pos.select("walk_id", "cs", "os", "c", "o", F.lit(1.0).alias("label"))
        .unionByName(neg)
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        return vertices.select(
            "id", F.array(*[F.lit(0.0) for _ in range(dim)]).alias("emb")
        )

    # init: in-vectors uniform in [-0.5/dim, 0.5/dim) from md5 (snapped to
    # the grid), out-vectors zero — word2vec's syn0/syn1neg convention
    dims = spark.range(dim).select(F.col("id").cast("int").alias("j"))
    init_u = F.expr(
        md5_long_sql(f"('{seed}:init:' || CAST(id AS STRING) || ':' || CAST(j AS STRING))")
    ) / F.lit(float(1 << 48))
    init_long = vertices.crossJoin(dims).select(
        "id", "j", _snap((init_u - F.lit(0.5)) / F.lit(float(dim)), _Q30).alias("w")
    )
    win = materialize(
        init_long.groupBy("id").agg(
            F.array(*[
                F.max(F.when(F.col("j") == j, F.col("w"))).alias(f"_{j}")
                for j in range(dim)
            ]).alias("emb")
        )
    )
    wout = materialize(
        vertices.select("id", F.array(*[F.lit(0.0) for _ in range(dim)]).alias("emb"))
    )

    it = IterationState(None, "sgns")
    # the per-pair coefficient lr*(label-s)/n_pairs snaps to the 2^-24
    # grid; once lr/n_pairs drops below the grid resolution EVERY
    # coefficient rounds to exactly 0 and training would be a silent
    # no-op — fail loudly instead (raise lr, or shard the corpus into
    # per-partition training runs, to stay above the grid)
    if lr / n_pairs < 1.0 / float(1 << 24):
        raise ValueError(
            f"lr/n_pairs = {lr}/{n_pairs} is below the 2^-24 coefficient "
            "grid: every snapped gradient would be 0 and training a "
            "silent no-op; raise lr proportionally to the pair count"
        )
    coeff = F.lit(lr) * (F.col("label") - F.col("s")) / F.lit(float(n_pairs))
    for epoch in range(epochs):
        joined = (
            pairs.join(win.select(F.col("id").alias("c"), F.col("emb").alias("wi")), "c")
            .join(wout.select(F.col("id").alias("o"), F.col("emb").alias("wo")), "o")
        )
        dot = None
        for j in range(dim):
            term = F.col("wi")[j] * F.col("wo")[j]
            dot = term if dot is None else dot + term
        scored = joined.select(
            "c", "o", "label", "wi", "wo",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))).alias("s"),
        ).select("c", "o", "wi", "wo", _snap(coeff, _Q24).alias("g"))
        # per-pair contributions snapped to the grid -> order-exact sums
        d_in = (
            scored.select(
                F.col("c").alias("id"),
                *[_snap(F.col("g") * F.col("wo")[j], _Q30).alias(f"v{j}")
                  for j in range(dim)],
            )
            .groupBy("id")
            .agg(*[F.sum(f"v{j}").alias(f"v{j}") for j in range(dim)])
        )
        d_out = (
            scored.select(
                F.col("o").alias("id"),
                *[_snap(F.col("g") * F.col("wi")[j], _Q30).alias(f"v{j}")
                  for j in range(dim)],
            )
            .groupBy("id")
            .agg(*[F.sum(f"v{j}").alias(f"v{j}") for j in range(dim)])
        )
        win = it.advance(
            2 * epoch + 1,
            win.join(d_in, "id", "left").select(
                "id",
                F.array(*[
                    F.col("emb")[j] + F.coalesce(F.col(f"v{j}"), F.lit(0.0))
                    for j in range(dim)
                ]).alias("emb"),
            ),
        )
        wout = it.advance(
            2 * epoch + 2,
            wout.join(d_out, "id", "left").select(
                "id",
                F.array(*[
                    F.col("emb")[j] + F.coalesce(F.col(f"v{j}"), F.lit(0.0))
                    for j in range(dim)
                ]).alias("emb"),
            ),
        )
    it.close()
    return win


def sgns_loss(pairs: DataFrame, win: DataFrame, wout: DataFrame, dim: int) -> float:
    """Mean logistic loss of (c, o, label) pairs under (id, emb) weight
    tables — the SGNS objective, for tests asserting training descends."""
    joined = (
        pairs.join(win.select(F.col("id").alias("c"), F.col("emb").alias("wi")), "c")
        .join(wout.select(F.col("id").alias("o"), F.col("emb").alias("wo")), "o")
    )
    dot = None
    for j in range(dim):
        term = F.col("wi")[j] * F.col("wo")[j]
        dot = term if dot is None else dot + term
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    eps = F.lit(1e-12)
    loss = -(
        F.col("label") * F.log(s + eps)
        + (F.lit(1.0) - F.col("label")) * F.log(F.lit(1.0) - s + eps)
    )
    return joined.select(loss.alias("l")).agg(F.avg("l")).first()[0]
