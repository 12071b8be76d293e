"""Synthetic graph generators (SURVEY.md §2.10) — fully distributed and
per-row deterministic: every edge is a pure function of (seed, edge index)
via xxhash64 column expressions, so the same (seed, params) produce the
identical graph at any parallelism or cluster size. All JVM-side
whole-stage-codegen expressions; no Python in the generation path.

RMAT is the fork's benchmark workload (Unittests-X.cpp:245-249; generator at
networkit/cpp/generators/RmatGenerator.cpp:16-124): n = 2^scale nodes,
recursive quadrant descent per edge with probabilities (a, b, c, d). The
reference's unweighted path REJECTS duplicate edges and redraws until
n*edgeFactor distinct edges exist (RmatGenerator.cpp:113-118) — a sequential
rejection loop that does not distribute; this engine instead overdraws by a
factor and keeps the first n*edgeFactor distinct edges in draw order, which
preserves the degree distribution and determinism (the properties the
benchmark sweep exercises) without a sequential dependency.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import EDGE_SCHEMA, Graph


def _distinct_to_target(draw_fn, m_target: int, overdraw: float, max_overdraw: float = 64.0):
    """Overdraw-with-retry: ``draw_fn(m_draw)`` must return a DataFrame of
    candidate distinct edges with a ``first_draw`` ordering column, as a pure
    function of the draw index — so enlarging the draw range only APPENDS
    candidates and the first ``m_target`` in draw order are stable across
    retries. Doubles the overdraw factor until the target edge count exists
    (dense G(n,p) / heavily skewed RMAT quadrants can exceed any fixed
    factor); raises if ``max_overdraw`` still falls short."""
    factor = overdraw
    while True:
        got = draw_fn(int(m_target * factor)).limit(m_target)
        n_got = got.count()
        if n_got >= m_target:
            return got
        if factor >= max_overdraw:
            raise ValueError(
                f"generator exhausted: {n_got}/{m_target} distinct edges at "
                f"overdraw {factor}x — graph too dense for the requested m"
            )
        warnings.warn(
            f"generator redraw: {n_got}/{m_target} distinct at {factor}x, doubling"
        )
        factor *= 2


def _u01(seed: int, *cols) -> F.Column:
    """Deterministic uniform [0,1) from a 63-bit hash."""
    return F.abs(F.xxhash64(F.lit(seed), *cols)) / F.lit(float(1 << 63))


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
    weighted: bool = False,
    overdraw: float = 2.0,
) -> Graph:
    """Undirected RMAT graph: 2^scale nodes, ~2^scale * edge_factor distinct
    edges. Per edge index i and level l, one hash draw picks the quadrant:
    src bit = draw >= a+b, dst bit = draw in [a, a+b) or >= a+b+c — the
    recursive descent of RmatGenerator.cpp:38-66 unrolled into `scale`
    column expressions."""
    n = 1 << scale
    m_target = n * edge_factor
    ab, abc = a + b, a + b + c

    def drawn_df(m_draw: int) -> DataFrame:
        e = spark.range(m_draw).select(F.col("id").alias("i"))
        src = F.lit(0).cast("long")
        dst = F.lit(0).cast("long")
        for level in range(scale):
            u = _u01(seed * 1_000_003 + level, "i")
            src_bit = (u >= ab).cast("long")
            dst_bit = ((u >= abc) | ((u >= a) & (u < ab))).cast("long")
            src = src * 2 + src_bit
            dst = dst * 2 + dst_bit
        return e.select("i", src.alias("src"), dst.alias("dst"))

    if weighted:
        # weighted path accumulates duplicate draws via increaseWeight
        # (RmatGenerator.cpp:107-111): weight = multiplicity
        half = (
            drawn_df(int(m_target * overdraw))
            .filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("float").alias("weight"))
        )
    else:
        # distinct edges in draw order, truncated to the target count;
        # redraw with a larger factor if duplicates ate the overdraw
        half = _distinct_to_target(
            lambda m: (
                drawn_df(m)
                .filter(F.col("src") != F.col("dst"))
                .select(
                    "i",
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
                .groupBy("src", "dst")
                .agg(F.min("i").alias("first_draw"))
                .orderBy("first_draw")
            ),
            m_target,
            overdraw,
        ).select("src", "dst", F.lit(1.0).cast("float").alias("weight"))

    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=weighted)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> Graph:
    """G(n, m) with m = round(p * n(n-1)/2) — the fixed-edge-count variant of
    generators/ErdosRenyiGenerator.cpp (its skip-sampling loop is inherently
    sequential; fixed-m hashing gives the same degree statistics
    distributively). Each edge index hashes to a uniform (u, v) pair."""
    m = int(round(p * n * (n - 1) / (1 if directed else 2)))

    def drawn_df(m_draw: int) -> DataFrame:
        e = spark.range(m_draw + 16).select(F.col("id").alias("i"))
        u = (F.abs(F.xxhash64(F.lit(seed), "i", F.lit(0))) % n).cast("long")
        v = (F.abs(F.xxhash64(F.lit(seed), "i", F.lit(1))) % n).cast("long")
        d = e.select("i", u.alias("u"), v.alias("v")).filter(F.col("u") != F.col("v"))
        if not directed:
            d = d.select(
                "i", F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
        return d.groupBy("u", "v").agg(F.min("i").alias("first_draw")).orderBy("first_draw")

    half = _distinct_to_target(drawn_df, m, overdraw=1.5).select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        F.lit(1.0).cast("float").alias("weight"),
    )
    edges = half if directed else half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, edges, directed=directed, weighted=False)


def watts_strogatz(
    spark: SparkSession, n: int, k: int, p: float, seed: int = 42
) -> Graph:
    """Small-world ring rewiring (generators/WattsStrogatzGenerator.cpp):
    ring lattice n nodes x k nearest neighbors per side, then each lattice
    edge is rewired with probability p to a uniform random target. One pass
    of column expressions; the rewire draw and the new target are pure
    functions of (seed, i, j), duplicate/self edges dropped (the reference
    redraws sequentially; dropping preserves the degree statistics the
    generator exists for)."""
    base = spark.range(n).select(F.col("id").alias("i"))
    offsets = F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
    lattice = base.select("i", offsets)
    rewire = _u01(seed * 7 + 1, "i", "j") < p
    new_dst = (F.abs(F.xxhash64(F.lit(seed * 7 + 2), "i", "j")) % n).cast("long")
    ring_dst = F.pmod(F.col("i") + F.col("j"), F.lit(n)).cast("long")
    drawn = lattice.select(
        F.col("i").alias("u"), F.when(rewire, new_dst).otherwise(ring_dst).alias("v")
    ).filter(F.col("u") != F.col("v"))
    half = (
        drawn.select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def barabasi_albert(
    spark: SparkSession, k: int, n_max: int, seed: int = 42, max_rounds: int = 64
) -> Graph:
    """Preferential attachment via the Batagelj-Brandes construction
    (the same linear-time scheme behind generators/
    BarabasiAlbertGenerator.cpp's batagelj mode): write the edge list as a
    position array M of length 2m where M[2i] = source of edge i (node
    i // k) and M[2i+1] = M[r_i] with r_i uniform in [0, 2i) — copying an
    already-placed endpoint samples targets proportionally to degree.

    The r_i are hash-drawn up front, so the only sequential dependency is
    the pointer chain M[r_i], resolved DISTRIBUTEDLY by pointer-halving:
    odd positions hold a ref to an earlier position; each round follows
    refs one hop (odd -> its target's value, or its target's ref) until all
    positions are grounded — geometric chain lengths make this converge in
    a handful of join rounds."""
    m = k * n_max
    pos = spark.range(m).select(F.col("id").alias("i"))
    # ref for odd position 2i+1: uniform in [0, 2i); position 1 grounds to 0
    ref = F.when(
        F.col("i") == 0, F.lit(0)
    ).otherwise(F.abs(F.xxhash64(F.lit(seed * 13 + 5), "i")) % (2 * F.col("i")))
    table = pos.select(
        (F.col("i") * 2).alias("p"),
        (F.col("i") / k).cast("long").alias("val"),
        F.lit(None).cast("long").alias("ref"),
    ).unionByName(
        pos.select(
            (F.col("i") * 2 + 1).alias("p"),
            F.lit(None).cast("long").alias("val"),
            ref.cast("long").alias("ref"),
        )
    )
    table = table.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        unresolved = table.filter(F.col("val").isNull())
        if unresolved.limit(1).count() == 0:
            break
        lookup = table.select(
            F.col("p").alias("ref"), F.col("val").alias("tval"), F.col("ref").alias("tref")
        )
        table = (
            table.join(lookup, "ref", "left")
            .select(
                "p",
                F.coalesce("val", "tval").alias("val"),
                F.when(F.col("val").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.coalesce("tref", "ref"))
                .alias("ref"),
            )
            .localCheckpoint(eager=True)
        )
    half = (
        table.select((F.col("p") / 2).cast("long").alias("i"), "p", "val")
        .groupBy("i")
        .agg(F.min_by("val", "p").alias("u"), F.max_by("val", "p").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n_max).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def clustered_random_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p_intra: float,
    p_inter: float,
    seed: int = 42,
) -> tuple[Graph, DataFrame]:
    """Planted-partition graph + ground-truth partition
    (generators/ClusteredRandomGraphGenerator.cpp — the PLP test fixture,
    community/test/CommunityGTest.cpp:73-110). Nodes are assigned to k
    clusters by hash; candidate pairs are drawn by index and kept with
    probability p_intra (same cluster) / p_inter (different), decided by a
    second hash — one pass, no rejection loop."""
    m_intra = int(p_intra * n * max(1, n // k) / 2 * 1.2) + k
    m_inter = int(p_inter * n * n / 2 * 1.2) + k

    def cluster_of(col):
        # membership is striped: cluster(id) = id % k (see intra drawing)
        return F.pmod(col, F.lit(k))

    # intra: pick a cluster, then two members of it
    intra = spark.range(m_intra).select(F.col("id").alias("i"))
    ci = F.pmod(F.xxhash64(F.lit(seed + 1), "i"), F.lit(k))
    # member j of cluster c is node j*k + c style striping (deterministic)
    sz = n // k
    u_i = (ci + (F.abs(F.xxhash64(F.lit(seed + 2), "i")) % sz) * k).cast("long")
    v_i = (ci + (F.abs(F.xxhash64(F.lit(seed + 3), "i")) % sz) * k).cast("long")
    intra_e = intra.select("i", u_i.alias("u"), v_i.alias("v"))

    inter = spark.range(m_inter).select((F.col("id") + m_intra).alias("i"))
    u_x = (F.abs(F.xxhash64(F.lit(seed + 4), "i")) % n).cast("long")
    v_x = (F.abs(F.xxhash64(F.lit(seed + 5), "i")) % n).cast("long")
    inter_e = inter.select("i", u_x.alias("u"), v_x.alias("v")).filter(
        cluster_of(F.col("u")) != cluster_of(F.col("v"))
    )

    drawn = (
        intra_e.unionByName(inter_e)
        .filter((F.col("u") != F.col("v")) & (F.col("u") < n) & (F.col("v") < n))
        .select("i", F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
    )
    half = (
        drawn.groupBy("u", "v")
        .agg(F.min("i").alias("fd"))
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.lit(1.0).cast("float").alias("weight"),
        )
    )
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    truth = vertices.select("id", (F.col("id") % k).cast("long").alias("label"))
    return Graph(vertices, edges, directed=False, weighted=False), truth


def chung_lu(
    spark: SparkSession, weights: list[float], seed: int = 42
) -> Graph:
    """Chung-Lu expected-degree random graph (ref: generators/
    ChungLuGenerator.cpp — pair (u,v) is an edge with probability
    w_u w_v / S, S = sum of weights). The reference walks all pairs with
    geometric skips; the distributed re-expression draws M = ceil(S/2)
    candidate edges whose endpoints are i.i.d. proportional to w (the
    standard "fast Chung-Lu" sampler: per-pair inclusion converges to
    w_u w_v / S for sparse graphs), then dedupes — no O(n^2) anywhere.

    Endpoint sampling is inverse-CDF: nodes own segments of [0,1) sized
    w/S, draws are hash-u01s, and the segment lookup is a BINNED
    equi-join (segments exploded over the n buckets they overlap, draws
    bucketed by floor(u*n)) — never a range cross join. The cumulative
    sum uses one ordered window at fixture scale; at 10^9 nodes the
    drop-in is the two-pass per-partition prefix sum over the same
    range-partitioned id order. Deterministic in (seed, weights)."""
    from pyspark.sql import Window

    n = len(weights)
    S = float(sum(weights))
    m_draws = int(S // 2) + 1
    wdf = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "id long, w double"
    )
    cum = wdf.withColumn(
        "hi", F.sum("w").over(Window.orderBy("id")) / F.lit(S)
    ).withColumn("lo", F.col("hi") - F.col("w") / F.lit(S))
    # explode each segment over the draw buckets it overlaps
    seg = cum.select(
        "id", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") * n).cast("long"),
                F.least(
                    F.floor(F.col("hi") * n).cast("long"), F.lit(n - 1)
                ),
            )
        ).alias("bucket"),
    )

    draws = spark.range(m_draws).select(F.col("id").alias("i"))
    u01 = lambda tag: (
        F.abs(F.xxhash64(F.lit(seed * 31 + tag), "i")) % F.lit(1 << 48)
    ).cast("double") / F.lit(float(1 << 48))
    d = draws.select("i", u01(1).alias("ua"), u01(2).alias("ub"))

    def lookup(col, out):
        dd = d.withColumn("bucket", F.floor(F.col(col) * n).cast("long"))
        return (
            dd.join(seg, "bucket")
            .filter((F.col(col) >= F.col("lo")) & (F.col(col) < F.col("hi")))
            .select("i", F.col("id").alias(out))
        )

    pairs = lookup("ua", "u").join(lookup("ub", "v"), "i")
    half = (
        pairs.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def hyperbolic(
    spark: SparkSession,
    n: int,
    R: float,
    alpha: float = 1.0,
    seed: int = 42,
    angular_buckets: int = 64,
) -> Graph:
    """Threshold (T=0) random hyperbolic graph (ref: generators/
    HyperbolicGenerator.cpp:69-129 + geometric/HyperbolicSpace.cpp:74-90):
    points get angle theta ~ U[0, 2pi) and radius r with CDF
    (cosh(alpha r) - 1)/(cosh(alpha R) - 1); an edge exists iff the
    hyperbolic distance acosh(cosh r_u cosh r_v - sinh r_u sinh r_v
    cos(d_theta)) <= R. Coordinates are hash-derandomized pure functions
    of (seed, id).

    The reference prunes candidate pairs with a polar quadtree; the
    distributed analogue is the standard core/periphery split: "core"
    points (r <= R/2 — an e^{-alpha R/2} fraction) pair with everyone via
    a small-side join, while each periphery point explodes over only the
    angular buckets within its OWN reach Delta(r, R/2) (cos Delta =
    (cosh r cosh(R/2) - cosh R)/(sinh r sinh(R/2)); Delta decreases in
    both radii, so the exploded node's window bounds every periphery
    pair it belongs to) and equi-joins on bucket against home-anchored
    points. Rim points get genuinely narrow windows — candidate volume
    ~O(sum_b Delta(r_b)/2pi * n_bucket) instead of O(n^2). The final
    exact distance filter makes pruning loss-free — the pytest checks
    the edge set EQUALS the brute-force O(n^2) evaluation."""
    coords = _hyperbolic_coords(spark, n, R, alpha, seed)
    half = _hyperbolic_edges(coords, R, angular_buckets)
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def _hyperbolic_coords(
    spark: SparkSession, n: int, R: float, alpha: float, seed: int
) -> DataFrame:
    """(id, theta, r) hash-derandomized hyperbolic coordinates (the
    HyperbolicSpace::fillPoints law), checkpointed."""
    pts = spark.range(n).select(F.col("id").cast("long"))
    u_theta = (
        F.abs(F.xxhash64(F.lit(seed * 17 + 1), "id")) % F.lit(1 << 48)
    ).cast("double") / F.lit(float(1 << 48))
    u_r = (
        F.abs(F.xxhash64(F.lit(seed * 17 + 2), "id")) % F.lit(1 << 48)
    ).cast("double") / F.lit(float(1 << 48))
    cosh_aR = math.cosh(alpha * R)
    return pts.select(
        "id",
        (u_theta * F.lit(2.0 * math.pi)).alias("theta"),
        (F.acosh(F.lit(1.0) + u_r * F.lit(cosh_aR - 1.0)) / F.lit(alpha)).alias("r"),
    ).localCheckpoint(eager=True)


def _hyperbolic_edges(
    coords: DataFrame, R: float, angular_buckets: int = 64
) -> DataFrame:
    """Canonical (src < dst, weight 1.0) threshold-hyperbolic edge set over
    a (id, theta, r) coordinate table — the core/periphery split +
    per-node angular-bucket window join documented on hyperbolic()."""
    r0 = R / 2.0
    bw = 2.0 * math.pi / angular_buckets

    core = coords.filter(F.col("r") <= r0)
    peri = coords.filter(F.col("r") > r0)

    def dist_leq_R(a, b):
        cd = (
            F.cosh(F.col(f"{a}.r")) * F.cosh(F.col(f"{b}.r"))
            - F.sinh(F.col(f"{a}.r"))
            * F.sinh(F.col(f"{b}.r"))
            * F.cos(F.col(f"{a}.theta") - F.col(f"{b}.theta"))
        )
        return cd <= F.lit(math.cosh(R))

    # core pairs with everyone (small side broadcast by AQE)
    core_pairs = (
        core.alias("a")
        .join(coords.alias("b"), F.col("a.id") != F.col("b.id"))
        .filter(dist_leq_R("a", "b"))
        .select(
            F.least("a.id", "b.id").alias("src"),
            F.greatest("a.id", "b.id").alias("dst"),
        )
        .distinct()
    )
    # periphery pairs via PER-NODE angular-bucket windows: for a periphery
    # pair (a, b), d_theta <= Delta(r_a, r_b) <= Delta(r_b, r0) (Delta is
    # decreasing in each radius), so exploding b over +-Delta(r_b, r0)
    # buckets and anchoring a at its home bucket is loss-free; nodes near
    # the rim get genuinely narrow windows (the quadtree-pruning analogue)
    home = F.floor(F.col("theta") / F.lit(bw)).cast("long")
    cos_d = (
        F.cosh("r") * F.lit(math.cosh(r0)) - F.lit(math.cosh(R))
    ) / (F.sinh("r") * F.lit(math.sinh(r0)))
    delta = F.when(cos_d <= -1.0, F.lit(math.pi)).when(
        cos_d >= 1.0, F.lit(0.0)
    ).otherwise(F.acos(cos_d))
    win_col = F.least(
        (F.ceil(delta / F.lit(bw)) + 1).cast("long"),
        F.lit(angular_buckets // 2 + 1),
    )
    offs = F.explode(F.sequence(-win_col, win_col)).alias("o")
    exploded = peri.select(
        "id", "theta", "r", home.alias("hb"), offs
    ).select(
        "id", "theta", "r",
        F.pmod(F.col("hb") + F.col("o"), F.lit(angular_buckets)).alias("bucket"),
    )
    anchored = peri.select("id", "theta", "r", home.alias("bucket"))
    peri_pairs = (
        anchored.alias("a")
        .join(exploded.alias("b"), ["bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(dist_leq_R("a", "b"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .distinct()
    )
    # core-core edges appear in core_pairs; drop them from none — core x peri
    # already covered by core_pairs (core joins everyone)
    peri_only = peri_pairs.join(
        core.select(F.col("id").alias("src")), "src", "anti"
    ).join(core.select(F.col("id").alias("dst")), "dst", "anti")
    return (
        core_pairs.unionByName(peri_only.select("src", "dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )


def lfr(
    spark: SparkSession,
    n: int,
    min_degree: int = 3,
    max_degree: int = 20,
    degree_exp: float = 2.5,
    min_comm: int = 8,
    max_comm: int = 40,
    comm_exp: float = 1.5,
    mu: float = 0.2,
    seed: int = 42,
) -> tuple[Graph, "DataFrame"]:
    """LFR-style community benchmark graph -> (Graph, ground_truth).

    Reference shape: generators/LFRGenerator.cpp — power-law degree
    sequence (generatePowerlawDegreeSequence, :28-38), power-law
    community sizes (:46-67), mixing parameter mu splitting each degree
    into (1-mu) intra + mu inter stubs (:69-89), nodes packed into
    communities with intra-degree < community size, then intra graphs
    realized per community and the inter graph over the external stubs.
    The reference realizes the sequences exactly via Havel-Hakimi +
    edge-switching randomization (sequential); this generator uses the
    fast-Chung-Lu realization instead (endpoints drawn proportional to
    the stub counts, the standard scalable LFR variant), so realized
    degrees approximate the sequence and the PLANTED PARTITION + mixing
    fraction are the contract — the properties the tests pin.

    Distributed realization: the per-community intra sampler is ONE pass
    — segment CDFs via windows partitioned by community, draws exploded
    per community, binned (community, bucket) equi-joins exactly like
    chung_lu's global sampler — and the inter sampler is chung_lu over
    external stubs with same-community pairs rejected. No per-community
    driver loop, no O(n^2) pair walk. Deterministic in (seed, params).
    ground_truth is (id, label)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def plaw(size, lo, hi, g):
        u = rng.random(size)
        a, b = float(lo) ** (1 - g), float(hi + 1) ** (1 - g)
        return np.minimum(
            np.floor(((b - a) * u + a) ** (1.0 / (1 - g))).astype(int), hi
        )

    deg = plaw(n, min_degree, max_degree, degree_exp)
    sizes: list[int] = []
    while sum(sizes) < n:
        sizes.append(int(plaw(1, min_comm, max_comm, comm_exp)[0]))
    sizes[-1] -= sum(sizes) - n  # trim to exactly n
    if sizes[-1] < 1:
        sizes[-2] += sizes[-1] - 1
        sizes[-1] = 1
    sizes.sort(reverse=True)

    intra = np.rint((1.0 - mu) * deg).astype(int)
    order = np.argsort(-intra, kind="stable")  # big intra -> big communities
    comm_of = np.empty(n, dtype=int)
    cap_of = np.empty(n, dtype=int)
    pos = 0
    for c, sz in enumerate(sizes):
        members = order[pos : pos + sz]
        comm_of[members] = c
        cap_of[members] = sz
        pos += sz
    intra = np.minimum(intra, cap_of - 1)  # intra-degree < community size
    ext = deg - intra

    nodes = spark.createDataFrame(
        [
            (int(i), int(comm_of[i]), float(intra[i]), float(ext[i]))
            for i in range(n)
        ],
        "id long, comm long, iw double, xw double",
    )

    from pyspark.sql import Window

    # ---- intra edges: per-community fast Chung-Lu, one distributed pass
    wsum = Window.partitionBy("comm")
    wcum = Window.partitionBy("comm").orderBy("id")
    seg_base = (
        nodes.filter(F.col("iw") > 0)
        .withColumn("S", F.sum("iw").over(wsum))
        .withColumn("nc", F.count(F.lit(1)).over(wsum))
        .withColumn("hi", F.sum("iw").over(wcum) / F.col("S"))
        .withColumn("lo", F.col("hi") - F.col("iw") / F.col("S"))
    )
    seg = seg_base.select(
        "comm", "id", "lo", "hi", "nc",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") * F.col("nc")).cast("long"),
                F.least(
                    F.floor(F.col("hi") * F.col("nc")).cast("long"),
                    F.col("nc") - 1,
                ),
            )
        ).alias("bucket"),
    )
    comm_draws = (
        seg_base.groupBy("comm")
        .agg(F.first("S").alias("S"), F.first("nc").alias("nc"))
        .select(
            "comm", "nc",
            F.explode(
                F.sequence(F.lit(0), (F.col("S") / 2).cast("long"))
            ).alias("i"),
        )
    )
    d = comm_draws.select(
        "comm", "nc", "i",
        _u01(seed * 31 + 11, "comm", "i").alias("ua"),
        _u01(seed * 31 + 12, "comm", "i").alias("ub"),
    )

    def _lookup(col, out):
        dd = d.withColumn("bucket", F.floor(F.col(col) * F.col("nc")).cast("long"))
        return (
            dd.join(seg.drop("nc"), ["comm", "bucket"])
            .filter((F.col(col) >= F.col("lo")) & (F.col(col) < F.col("hi")))
            .select("comm", "i", F.col("id").alias(out))
        )

    intra_half = (
        _lookup("ua", "u")
        .join(_lookup("ub", "v"), ["comm", "i"])
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
        .distinct()
    )

    # ---- inter edges: global Chung-Lu over external stubs, intra pairs
    # rejected (LFRGenerator.cpp rewires these; rejection is the
    # fast-variant equivalent -- slight undershoot, documented)
    xtot = float(ext.sum())
    inter_half = spark.createDataFrame([], "src long, dst long")
    if xtot >= 2:
        gx = chung_lu(spark, [float(x) for x in ext], seed=seed * 31 + 13)
        cm = nodes.select("id", "comm")
        inter_half = (
            gx.edges.filter(F.col("src") < F.col("dst"))
            .join(cm.withColumnRenamed("id", "src").withColumnRenamed("comm", "ca"), "src")
            .join(cm.withColumnRenamed("id", "dst").withColumnRenamed("comm", "cb"), "dst")
            .filter(F.col("ca") != F.col("cb"))
            .select("src", "dst")
        )

    half = intra_half.unionByName(inter_half).distinct().withColumn(
        "weight", F.lit(1.0).cast("float")
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    g = Graph(nodes.select("id"), sym, directed=False, weighted=False)
    return g, nodes.select("id", F.col("comm").alias("label"))


def havel_hakimi(spark: SparkSession, sequence: list[int]) -> Graph:
    """Havel-Hakimi realization of an exact degree sequence (ref:
    generators/HavelHakimiGenerator.cpp — repeatedly connect the
    highest-remaining-degree node to the next-highest ones; raises if the
    sequence is not graphical, mirroring erdosGallai failure).

    The algorithm is inherently sequential (each step depends on the
    updated residual degrees), so like the reference it runs on the
    DRIVER over the sequence — fixture-tier by design (the reference uses
    it to realize LFR's intra-community sequences; fixtures here are the
    same use).  The resulting edge list is parallelized into a normal
    distributed Graph.  Deterministic: ties broken by node id.
    """
    import heapq

    n = len(sequence)
    heap = [(-int(d), i) for i, d in enumerate(sequence) if d > 0]
    heapq.heapify(heap)
    edges: list[tuple[int, int, float]] = []
    while heap:
        negd, u = heapq.heappop(heap)
        d = -negd
        if d > len(heap):
            raise ValueError("degree sequence is not graphical")
        taken = [heapq.heappop(heap) for _ in range(d)]
        for negdv, v in taken:
            edges.append((min(u, v), max(u, v), 1.0))
        for negdv, v in taken:
            if -negdv - 1 > 0:
                heapq.heappush(heap, (negdv + 1, v))
    e = spark.createDataFrame(edges, schema=EDGE_SCHEMA)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return Graph(v, sym, directed=False, weighted=False)


def stochastic_blockmodel(
    spark: SparkSession,
    membership: list[int],
    affinity: list[list[float]],
    seed: int = 42,
) -> Graph:
    """Stochastic blockmodel graph (ref:
    generators/StochasticBlockmodel.cpp — each pair u < v is an edge with
    probability affinity[block(u)][block(v)]).  The reference walks all
    O(n^2) pairs; this generator uses the expected-count realization (the
    same fast-sampler trade as chung_lu/lfr): per block pair it draws
    round(p * #pairs) candidate edges with hash-uniform endpoints inside
    each block, then dedupes — per-pair inclusion converges to p for
    sparse blocks, and the block structure is exact.  Deterministic in
    (seed, membership, affinity)."""
    n = len(membership)
    k = len(affinity)
    if any(len(row) != k for row in affinity):
        raise ValueError("affinity matrix must be square nBlocks x nBlocks")
    if any(not (0 <= b < k) for b in membership):
        raise ValueError("membership entries must be valid block indices")

    mem = spark.createDataFrame(
        [(i, int(b)) for i, b in enumerate(membership)], "id long, block long"
    )
    from pyspark.sql import Window

    idx = mem.withColumn(
        "idx", F.row_number().over(Window.partitionBy("block").orderBy("id")) - 1
    )
    sizes = [sum(1 for b in membership if b == a) for a in range(k)]

    pair_rows = []
    for a in range(k):
        for b in range(a, k):
            p = float(affinity[a][b])
            npairs = (
                sizes[a] * (sizes[a] - 1) // 2 if a == b else sizes[a] * sizes[b]
            )
            m = int(round(p * npairs))
            if m > 0:
                pair_rows.append((a, b, m))
    if not pair_rows:
        e = spark.createDataFrame([], EDGE_SCHEMA)
        return Graph(mem.select("id"), e, directed=False, weighted=False)

    draws = (
        spark.createDataFrame(pair_rows, "ba long, bb long, m long")
        .select("ba", "bb", F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("i"))
    )
    sz = spark.createDataFrame(
        [(a, s) for a, s in enumerate(sizes)], "block long, sz long"
    )
    d = (
        draws.join(sz.withColumnRenamed("block", "ba").withColumnRenamed("sz", "sa"), "ba")
        .join(sz.withColumnRenamed("block", "bb").withColumnRenamed("sz", "sb"), "bb")
        .select(
            "ba", "bb", "i",
            (
                F.abs(F.xxhash64(F.lit(seed * 31 + 21), "ba", "bb", "i"))
                % F.col("sa")
            ).alias("ia"),
            (
                F.abs(F.xxhash64(F.lit(seed * 31 + 22), "ba", "bb", "i"))
                % F.col("sb")
            ).alias("ib"),
        )
    )
    ua = idx.select(
        F.col("block").alias("ba"), F.col("idx").alias("ia"), F.col("id").alias("u")
    )
    ub = idx.select(
        F.col("block").alias("bb"), F.col("idx").alias("ib"), F.col("id").alias("v")
    )
    half = (
        d.join(ua, ["ba", "ia"])
        .join(ub, ["bb", "ib"])
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("src"),
            F.greatest("u", "v").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0).cast("float"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    return Graph(mem.select("id"), sym, directed=False, weighted=False)


def _dm_attach(spark: SparkSession, n: int, seed: int) -> DataFrame:
    """The Dorogovtsev-Mendes attach table: two rows (a, val) per new node
    a in [3, n) — the endpoints of the existing edge node ``a`` picked.
    Shared by the static graph builder and the dynamic event stream (same
    seed => identical picks). See dorogovtsev_mendes for the
    pointer-halving derandomization notes."""
    if n < 3:
        raise ValueError("DorogovtsevMendes needs n >= 3")
    m = 3 + 2 * (n - 3)
    tri_a = [0, 1, 2]
    tri_b = [1, 2, 0]
    js = spark.range(3, m).select(F.col("id").alias("j"))
    k = ((F.col("j") - 3) / 2).cast("long")
    b = (F.col("j") - 3) % 2
    e = F.abs(F.xxhash64(F.lit(seed * 31 + 7), k)) % (3 + 2 * k)
    # ground value of A_e / triangle endpoints; for b=1 and e>=3: ref chain
    a_of_e = F.when(e < 3, F.element_at(F.array(*[F.lit(x) for x in tri_a]), (e + 1).cast("int")))\
        .otherwise(3 + ((e - 3) / 2).cast("long"))
    b0_ground = a_of_e
    b1_ground = F.when(e < 3, F.element_at(F.array(*[F.lit(x) for x in tri_b]), (e + 1).cast("int")))
    table = js.select(
        "j",
        (3 + k).alias("a"),
        F.when(b == 0, b0_ground).otherwise(b1_ground).cast("long").alias("val"),
        F.when((b == 1) & (e >= 3), e).cast("long").alias("ref"),
    ).localCheckpoint(eager=True)
    while table.filter(F.col("val").isNull()).limit(1).count() > 0:
        lookup = table.select(
            F.col("j").alias("ref"), F.col("val").alias("tval"), F.col("ref").alias("tref")
        )
        table = (
            table.join(lookup, "ref", "left")
            .select(
                "j",
                "a",
                F.coalesce("val", "tval").alias("val"),
                F.when(F.col("val").isNotNull(), F.lit(None).cast("long"))
                .otherwise(F.coalesce("tref", "ref"))
                .alias("ref"),
            )
            .localCheckpoint(eager=True)
        )
    return table.select("a", "val")


def dorogovtsev_mendes(spark: SparkSession, n: int, seed: int = 42) -> Graph:
    """DorogovtsevMendesGenerator.cpp:17-40: start from a triangle; each
    new node picks a uniformly random EXISTING edge and connects to both
    of its endpoints (m = 3 + 2(n-3)).

    Distributed derandomization: node 3+k picks edge index
    e_k = hash(seed, k) mod (3 + 2k) up front. Writing each edge j >= 3 as
    (A_j, B_j) with A_j = its new node (closed form: 3 + (j-3)//2), the
    b=0 copy's other endpoint is A_{e} (closed form again) and the b=1
    copy's is B_{e} — a pure pointer chain through earlier B's, resolved
    by the same pointer-halving rounds as barabasi_albert (geometric
    chain lengths -> a handful of join rounds)."""
    tri = spark.createDataFrame(
        list(zip([0, 1, 2], [1, 2, 0])), "a long, val long"
    )
    half = (
        _dm_attach(spark, n, seed)
        .unionByName(tri)
        .select(F.least("a", "val").alias("src"), F.greatest("a", "val").alias("dst"))
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def _torus_points(spark: SparkSession, n: int, seed: int, salt: str) -> DataFrame:
    return spark.range(n).select(
        F.col("id"),
        _u01(seed, F.lit(salt + ":x"), F.col("id")).alias("x"),
        _u01(seed, F.lit(salt + ":y"), F.col("id")).alias("y"),
    )


def _grid_pairs(pts: DataFrame, cell: float) -> DataFrame:
    """Candidate point pairs (id, x, y, id2, x2, y2) whose torus grid
    cells are adjacent — the spatial-join pruning both PubWeb and Mocnik
    need (the reference's quadratic scans are its own TODO,
    PubWebGenerator.cpp:44-46)."""
    g = int(max(1, math.floor(1.0 / cell)))
    with_cell = pts.select(
        "id", "x", "y",
        (F.floor(F.col("x") * g) % g).cast("int").alias("cx"),
        (F.floor(F.col("y") * g) % g).cast("int").alias("cy"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nbr = with_cell.select(
        F.col("id").alias("id2"), F.col("x").alias("x2"), F.col("y").alias("y2"),
        F.explode(
            F.array(*[
                F.struct(
                    ((F.col("cx") + dx + g) % g).alias("cx"),
                    ((F.col("cy") + dy + g) % g).alias("cy"),
                )
                for dx, dy in offs
            ])
        ).alias("c"),
    ).select("id2", "x2", "y2", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    return with_cell.join(nbr, ["cx", "cy"]).filter(F.col("id") != F.col("id2"))


def _torus_d2(x1, y1, x2, y2):
    dx = F.abs(x1 - x2)
    dy = F.abs(y1 - y2)
    dx = F.least(dx, 1.0 - dx)
    dy = F.least(dy, 1.0 - dy)
    return dx * dx + dy * dy


def pub_web(
    spark: SparkSession,
    n: int,
    num_dense_areas: int = 10,
    neighborhood_radius: float = 0.1,
    max_neighbors: int = 20,
    seed: int = 42,
) -> Graph:
    """PubWebGenerator.cpp (peer-to-peer web layout): points on the unit
    TORUS — a fraction scattered uniformly, the rest clustered around
    dense-area centers — connected to their <= max_neighbors nearest
    neighbors within neighborhood_radius (torus metric). The reference's
    O(n^2) neighbor scan (its own TODO) becomes a grid-cell spatial join;
    the per-node cap is a partitioned rank by (distance, id)."""
    centers = _torus_points(spark, num_dense_areas, seed, "pwc")
    frac_dense = 0.7
    base = spark.range(n).select(
        "id",
        (_u01(seed, F.lit("pwm"), F.col("id")) < frac_dense).alias("dense"),
        _u01(seed, F.lit("pwx"), F.col("id")).alias("ux"),
        _u01(seed, F.lit("pwy"), F.col("id")).alias("uy"),
        (F.abs(F.xxhash64(F.lit(seed), F.lit("pwa"), F.col("id"))) % num_dense_areas).alias("area"),
        (_u01(seed, F.lit("pwr"), F.col("id")) * 0.05).alias("rad"),
        (_u01(seed, F.lit("pwt"), F.col("id")) * 2.0 * math.pi).alias("ang"),
    )
    pts = (
        base.join(centers.select(F.col("id").alias("area"), F.col("x").alias("acx"), F.col("y").alias("acy")), "area", "left")
        .select(
            "id",
            F.when(F.col("dense"), (F.col("acx") + F.col("rad") * F.cos("ang") + 1.0) % 1.0)
            .otherwise(F.col("ux")).alias("x"),
            F.when(F.col("dense"), (F.col("acy") + F.col("rad") * F.sin("ang") + 1.0) % 1.0)
            .otherwise(F.col("uy")).alias("y"),
        )
    )
    pts = pts.localCheckpoint(eager=True)
    cand = _grid_pairs(pts, neighborhood_radius)
    within = cand.withColumn(
        "d2", _torus_d2(F.col("x"), F.col("y"), F.col("x2"), F.col("y2"))
    ).filter(F.col("d2") <= neighborhood_radius * neighborhood_radius)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("d2", "id2")
    kept = within.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_neighbors
    )
    half = (
        kept.select(F.least("id", "id2").alias("src"), F.greatest("id", "id2").alias("dst"))
        .distinct()
        .select("src", "dst", F.lit(1.0).cast("float").alias("weight"))
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def mocnik(
    spark: SparkSession, n: int, density: float = 2.5, seed: int = 42
) -> Graph:
    """MocnikGenerator.cpp:300-340 (Mocnik & Frank spatial model, d=2):
    n uniform points in the unit square, directed edge u->v iff
    dist(u, v) < density * n^(-1/d). Grid-bucketed spatial join instead
    of the reference's cell-list scan; plain (non-torus) metric, matching
    the reference."""
    r = density * (n ** -0.5)
    pts = _torus_points(spark, n, seed, "moc").localCheckpoint(eager=True)
    cand = _grid_pairs(pts, min(max(r, 1e-6), 0.5))
    dx = F.col("x") - F.col("x2")
    dy = F.col("y") - F.col("y2")
    edges = (
        cand.withColumn("d2", dx * dx + dy * dy)
        .filter(F.col("d2") < r * r)
        .select(
            F.col("id").alias("src"), F.col("id2").alias("dst"),
            F.lit(1.0).cast("float").alias("weight"),
        )
    )
    # the grid wraps (torus cells) but the metric must not: wrap-around
    # candidate pairs fail the plain-distance filter unless genuinely close
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, edges, directed=True, weighted=False)


def powerlaw_degree_sequence(
    n: int, min_deg: int, max_deg: int, gamma: float, seed: int = 42
) -> list[int]:
    """generators/PowerlawDegreeSequence.cpp: P(deg = k) proportional to
    k^-gamma on [min_deg, max_deg]; returns a sorted-descending sequence
    (getDegreeSequence) drawn by deterministic inverse-CDF hash draws —
    ready to feed havel_hakimi. Driver-side: the sequence is n ints, the
    same scale the reference returns as std::vector<count>."""
    import numpy as np

    ks = np.arange(min_deg, max_deg + 1, dtype=np.float64)
    pdf = ks ** -gamma
    cdf = np.cumsum(pdf / pdf.sum())
    import hashlib

    seq = []
    for i in range(n):
        h = int.from_bytes(
            hashlib.md5(f"{seed}:plds:{i}".encode()).digest()[:6], "big"
        ) / float(1 << 48)
        seq.append(int(min_deg + np.searchsorted(cdf, h, side="right")))
    seq.sort(reverse=True)
    # even degree sum (a realizable sequence needs it; the reference's
    # HavelHakimi consumers fix parity the same way)
    if sum(seq) % 2 == 1:
        seq[-1] += 1 if seq[-1] < max_deg else -1
    return seq


def regular_ring_lattice(spark: SparkSession, n: int, k: int) -> Graph:
    """generators/RegularRingLatticeGenerator.cpp:13-25: every node i
    connects to its k nearest clockwise neighbors (i+1 .. i+k mod n);
    k is clamped to n/2 - 1 like the reference ctor. Pure-expr:
    range x sequence explode, no shuffle beyond the symmetrize union."""
    if n < 3:
        raise ValueError("ring lattice needs n >= 3")
    k = min(k, n // 2 - 1)
    half = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
        )
        .select(
            "src",
            ((F.col("src") + F.col("j")) % n).alias("dst"),
            F.lit(1.0).cast("float").alias("weight"),
        )
    )
    sym = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    vertices = spark.range(n).select(F.col("id").cast("long"))
    return Graph(vertices, sym, directed=False, weighted=False)


def edge_switching_markov_chain(
    spark: SparkSession, sequence: list[int], rounds: int = 10, seed: int = 42
):
    """EdgeSwitchingMarkovChainGenerator (generators/
    EdgeSwitchingMarkovChainGenerator.cpp:13-19): realize the exact degree
    sequence with Havel-Hakimi, then randomize with degree-preserving edge
    switching — the standard uniform-ish sampler over graphs with a fixed
    degree sequence.  Strict mode only (non-graphical sequences raise,
    the reference's ignoreIfNotRealizable=false path); the switching phase
    is the superstep-native hash-derandomized EdgeSwitching
    (operators/randomization.py), so the generator inherits its exact
    degree-preservation guarantee."""
    from networkit_spark.operators.randomization import edge_switching

    g = havel_hakimi(spark, sequence)
    return edge_switching(g, rounds=rounds, seed=seed)


PUBWEB_BASE_WEIGHT = 0.01  # PubWebGenerator.hpp:67


def _pubweb_points(
    ids: DataFrame,
    centers: DataFrame,
    num_dense_areas: int,
    seed: int,
    tag: str,
) -> DataFrame:
    """(id, x, y) PubWeb positions for the given id column: 70% clustered
    around a hash-chosen dense-area center, 30% uniform noise — the same
    position law as pub_web(), parameterized by ``tag`` so dynamic steps
    can draw fresh coordinates for inserted nodes."""
    base = ids.select(
        "id",
        (_u01(seed, F.lit(tag + ":m"), F.col("id")) < 0.7).alias("dense"),
        _u01(seed, F.lit(tag + ":x"), F.col("id")).alias("ux"),
        _u01(seed, F.lit(tag + ":y"), F.col("id")).alias("uy"),
        (
            F.abs(F.xxhash64(F.lit(seed), F.lit(tag + ":a"), F.col("id")))
            % num_dense_areas
        ).alias("area"),
        (_u01(seed, F.lit(tag + ":r"), F.col("id")) * 0.05).alias("rad"),
        (_u01(seed, F.lit(tag + ":t"), F.col("id")) * 2.0 * math.pi).alias("ang"),
    )
    return base.join(
        centers.select(
            F.col("id").alias("area"), F.col("x").alias("acx"), F.col("y").alias("acy")
        ),
        "area",
        "left",
    ).select(
        "id",
        F.when(F.col("dense"), (F.col("acx") + F.col("rad") * F.cos("ang") + 1.0) % 1.0)
        .otherwise(F.col("ux"))
        .alias("x"),
        F.when(F.col("dense"), (F.col("acy") + F.col("rad") * F.sin("ang") + 1.0) % 1.0)
        .otherwise(F.col("uy"))
        .alias("y"),
    )


def _pubweb_eligible(pts: DataFrame, radius: float, max_neighbors: int) -> DataFrame:
    """Canonical (src < dst, weight) eligible-edge set under the DYNAMIC
    PubWeb rule (DynamicPubWebGenerator.cpp:106-131): each node marks its
    <= max_neighbors nearest in-radius neighbors (torus metric), an edge
    exists iff BOTH endpoints marked it (eligibleEdges[e] >= 2), weighted
    BASE_WEIGHT / d2. Grid-cell spatial join + per-node rank instead of
    the reference's quadratic scan (its own FIXME)."""
    from pyspark.sql import Window

    cand = _grid_pairs(pts, radius)
    within = cand.withColumn(
        "d2", _torus_d2(F.col("x"), F.col("y"), F.col("x2"), F.col("y2"))
    ).filter(F.col("d2") <= radius * radius)
    w = Window.partitionBy("id").orderBy("d2", "id2")
    kept = within.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_neighbors
    )
    return (
        kept.select(
            F.least("id", "id2").alias("src"),
            F.greatest("id", "id2").alias("dst"),
            "d2",
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("marks"), F.first("d2").alias("d2"))
        .filter(F.col("marks") >= 2)
        .select(
            "src",
            "dst",
            (F.lit(PUBWEB_BASE_WEIGHT) / F.greatest("d2", F.lit(1e-12)))
            .cast("float")
            .alias("weight"),
        )
    )
