"""Graph generators — R-MAT (bench/scale graph), Erdős–Rényi, planted SBM.

Reference parity: networkit/cpp/generators/{RmatGenerator, ErdosRenyi
Generator, ClusteredRandomGraphGenerator}.cpp. R-MAT is the P0 bench
generator (SURVEY §2A): power-law degree skew with tunable hub intensity —
exactly the shape that stresses the skew handling the north rule demands.

Determinism: every edge's quadrant path derives from splitmix64(edge_id,
level) — counter-based hashing, no sequential RNG state — so the SAME
graph comes out regardless of partitioning or cluster size, and generation
is embarrassingly parallel (mapInPandas over spark.range, numpy-vectorized
per Arrow batch; no shuffle at all).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — public-domain mixing function."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def rmat(
    spark: SparkSession,
    scale: int = 16,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """R-MAT edge table (src, dst, weight=1.0): 2^scale vertices,
    edge_factor·2^scale edges (with natural multi-edge collapse via the
    caller's dedup if desired). Kept directed; self-loops possible (as in
    the reference generator)."""
    n_edges = edge_factor << scale
    probs = np.array([a, b, c, d], dtype=np.float64)
    cum = np.cumsum(probs) / probs.sum()
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            src = np.zeros(len(ids), dtype=np.uint64)
            dst = np.zeros(len(ids), dtype=np.uint64)
            for level in range(scale):
                u = _u01(base + ids * np.uint64(scale) + np.uint64(level))
                quad = np.searchsorted(cum, u, side="right")
                src = (src << np.uint64(1)) | np.uint64(1) * (quad >= 2)
                dst = (dst << np.uint64(1)) | np.uint64(1) * (quad % 2 == 1)
            yield pd.DataFrame(
                {
                    "src": src.astype(np.int64),
                    "dst": dst.astype(np.int64),
                    "weight": np.ones(len(ids)),
                }
            )

    return (
        spark.range(n_edges)
        .mapInPandas(gen, "src bigint, dst bigint, weight double")
    )


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> DataFrame:
    """G(n, p) via per-pair Bernoulli filter over the candidate-pair range.

    Candidate enumeration is O(n²) rows streamed through a filter — fine
    for fixtures (n ≤ ~10^4); large sparse graphs should use rmat().
    """
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
    )
    pairs = pairs.where(
        F.col("src") < F.col("dst") if not directed else F.col("src") != F.col("dst")
    )
    # deterministic per-pair coin: xxhash64 → [0,1)
    coin = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007)) / 1_000_000_007.0
    return pairs.where(coin < p).withColumn("weight", F.lit(1.0))


def planted_sbm(
    spark: SparkSession,
    n: int = 60,
    blocks: int = 2,
    p_in: float = 0.3,
    p_out: float = 0.01,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Planted-partition SBM (fixture oracle for PLP): returns (edges,
    planted_labels(id, label)); block of vertex v = v % blocks-interleaved →
    contiguous ranges for canonical min-id labels."""
    size = n // blocks
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
        .where(F.col("src") < F.col("dst"))
    )
    same = (F.col("src") / size).cast("int") == (F.col("dst") / size).cast("int")
    coin = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007)) / 1_000_000_007.0
    edges = pairs.where(
        (same & (coin < p_in)) | (~same & (coin < p_out))
    ).withColumn("weight", F.lit(1.0))
    labels = spark.range(n).select(
        F.col("id"),
        ((F.col("id") / size).cast("int") * size).cast("bigint").alias("label"),
    )
    return edges, labels


def watts_strogatz(
    spark: SparkSession, n: int, k: int = 4, p: float = 0.1, seed: int = 42
) -> DataFrame:
    """Watts–Strogatz small world (generators/WattsStrogatzGenerator.cpp):
    ring lattice of n vertices each wired to its k/2 clockwise neighbors,
    then every lattice edge is independently rewired (new random dst) with
    probability p. Fully parallel: one spark.range scan, counter-based
    coins, no shuffle; deterministic under any partitioning."""
    half = max(1, k // 2)
    lattice = (
        spark.range(n)
        .crossJoin(spark.range(1, half + 1).withColumnRenamed("id", "j"))
        .select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") + F.col("j"), F.lit(n)).alias("ring_dst"),
            "j",
        )
    )
    coin = (
        F.pmod(F.xxhash64("src", "j", F.lit(seed)), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    # shifted draw over n-1 targets: src + 1 + h mod (n-1) can never land
    # on src, so rewiring REDRAWS instead of deleting the edge (the
    # reference redraws too; a plain mod-n draw lost ~p/n of the edges)
    rand_dst = F.pmod(
        F.col("src")
        + 1
        + F.pmod(F.xxhash64("src", "j", F.lit(seed + 1)), F.lit(n - 1)),
        F.lit(n),
    )
    rewired = lattice.select(
        "src",
        F.when(coin < p, rand_dst).otherwise(F.col("ring_dst")).alias("dst"),
    )
    # collapse parallel edges from rewire collisions (self-loops can no
    # longer occur by construction)
    return (
        rewired.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def chung_lu(spark: SparkSession, degrees, seed: int = 42) -> DataFrame:
    """Chung–Lu expected-degree model (generators/ChungLuGenerator.cpp):
    P(i~j) = min(1, w_i·w_j / Σw). ``degrees`` is a python list or an
    (id, w) DataFrame. Exact pairwise-Bernoulli form — candidate
    enumeration is O(n²) rows through a filter (fixture scale, like
    erdos_renyi); use chung_lu_fast for the sampled scale path."""
    if not isinstance(degrees, DataFrame):
        degrees = spark.createDataFrame(
            list(enumerate(map(float, degrees))), "id bigint, w double"
        )
    s = degrees.agg(F.sum("w")).collect()[0][0] or 1.0
    a = degrees.select(F.col("id").alias("src"), F.col("w").alias("wa"))
    b = degrees.select(F.col("id").alias("dst"), F.col("w").alias("wb"))
    pairs = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    coin = (
        F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    prob = F.least(F.lit(1.0), F.col("wa") * F.col("wb") / F.lit(float(s)))
    return pairs.where(coin < prob).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )


def chung_lu_fast(
    spark: SparkSession,
    n: int,
    gamma: float = 2.5,
    avg_degree: float = 8.0,
    seed: int = 42,
) -> DataFrame:
    """Sampled Chung–Lu at scale: power-law weights w_i ∝ (i+1)^(-1/(γ-1)),
    m = n·avg_degree/2 edges whose endpoints are drawn i.i.d. proportional
    to w via the CLOSED-FORM inverse CDF of the weight distribution — the
    classic 'fast Chung–Lu' approximation (endpoint sampling instead of
    pair Bernoulli; degree expectations match as n grows). mapInPandas
    over spark.range: embarrassingly parallel, counter-based, no shuffle."""
    m = int(n * avg_degree / 2)
    alpha = 1.0 / (gamma - 1.0)
    # CDF of w_i ∝ i^-alpha over i∈[1,n]: F(x) ≈ x^(1-alpha)/n^(1-alpha)
    # inverse: x = (u)^(1/(1-alpha)) · n   (0<alpha<1 for gamma>2)
    inv_exp = 1.0 / (1.0 - alpha)
    base = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            u1 = _u01(base + ids * np.uint64(2))
            u2 = _u01(base + ids * np.uint64(2) + np.uint64(1))
            src = np.minimum(
                (np.power(u1, inv_exp) * n).astype(np.int64), n - 1
            )
            dst = np.minimum(
                (np.power(u2, inv_exp) * n).astype(np.int64), n - 1
            )
            keep = src != dst
            yield pd.DataFrame(
                {
                    "src": src[keep],
                    "dst": dst[keep],
                    "weight": np.ones(int(keep.sum())),
                }
            )

    return spark.range(m).mapInPandas(gen, "src bigint, dst bigint, weight double")


def barabasi_albert(
    spark: SparkSession, n: int, k: int = 4, seed: int = 42, max_rounds: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Barabási–Albert preferential attachment, DISTRIBUTED
    (generators/BarabasiAlbertGenerator.cpp is sequential; this is the
    parallel reformulation of Sanders & Schulz, "Scalable Generation of
    Scale-Free Graphs" (IPL 2016), as used in KaGen): materialize the
    virtual edge-slot array — edge e=(v, T(e)) occupies slots 2e (source,
    known: v = k0 + e//k) and 2e+1 (target, random). T(e) is defined by
    picking a uniform slot r(e) = hash(e) mod 2e·... among all PREVIOUS
    slots: an even slot resolves immediately to its source vertex; an odd
    slot aliases the target of an earlier edge → pointer chain. Chains
    are resolved by iterative pointer-JUMPING joins (expected O(log)
    rounds, geometric tail), so the whole graph derives from counter-based
    hashes — deterministic under any partitioning, no sequential state.

    Seed graph: a k-clique on vertices 0..k-1 (edges 0..C(k,2)-1 fixed),
    then vertices k..n-1 attach k edges each. ``portable=True`` draws the
    slot references from the md5 portable hash (native expressions, no
    pandas) so the gate's DuckDB oracle can resolve the identical pointer
    chains with a recursive CTE."""
    k0 = k
    seed_edges = [(i, j) for i in range(k0) for j in range(i + 1, k0)]
    n_seed = len(seed_edges)
    base = np.uint64((seed * 0xD6E8FEB86659FD93) % (1 << 64))

    # slot numbering: seed edges occupy slots [0, 2·n_seed); attachment
    # edge e (0-based among attachments) occupies slots 2(n_seed+e),
    # 2(n_seed+e)+1. Its random reference r(e) is uniform over all slots
    # strictly below 2(n_seed+e).
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            e = pdf["id"].to_numpy().astype(np.int64)  # attachment index
            src = k0 + e // k
            lim = (2 * (n_seed + e)).astype(np.uint64)
            r = (_splitmix64(base + e.astype(np.uint64)) % lim).astype(np.int64)
            yield pd.DataFrame({"edge": n_seed + e, "src": src, "ref": r})

    if portable:
        from linkgraph.portable import phash

        att = spark.range((n - k0) * k).select(
            (F.lit(n_seed) + F.col("id")).alias("edge"),
            (F.lit(k0) + (F.col("id") / k).cast("bigint")).alias("src"),
            F.pmod(
                phash(F.col("id"), F.lit(int(seed))),
                F.lit(2) * (F.lit(n_seed) + F.col("id")),
            ).alias("ref"),
        )
    else:
        att = spark.range((n - k0) * k).mapInPandas(
            gen, "edge bigint, src bigint, ref bigint"
        )
    # resolve even slots immediately: slot 2m → source of edge m
    seed_df = spark.createDataFrame(
        [(i, s, d) for i, (s, d) in enumerate(seed_edges)],
        "edge bigint, src bigint, dst bigint",
    )
    pend = att.select(
        "edge",
        "src",
        F.when(F.col("ref") % 2 == 0, (F.col("ref") / 2).cast("bigint"))
        .otherwise(F.lit(None))
        .alias("src_edge"),  # resolves to source vertex of this edge
        F.when(F.col("ref") % 2 == 1, ((F.col("ref") - 1) / 2).cast("bigint"))
        .otherwise(F.lit(None))
        .alias("tgt_edge"),  # aliases target of this edge (chain)
    )
    # resolve src_edge references: seed edges via broadcast join, attachment
    # edges via closed form.
    seed_src = F.broadcast(seed_df.select(F.col("edge").alias("src_edge"),
                                          F.col("src").alias("seed_src")))
    seed_tgt = F.broadcast(seed_df.select(F.col("edge").alias("tgt_edge"),
                                          F.col("dst").alias("seed_tgt")))
    cur = (
        pend.join(seed_src, "src_edge", "left")
        .join(seed_tgt, "tgt_edge", "left")
        .select(
            "edge",
            "src",
            F.coalesce(
                "seed_src",
                F.when(
                    F.col("src_edge").isNotNull(),
                    F.lit(k0) + ((F.col("src_edge") - n_seed) / k).cast("bigint"),
                ),
                "seed_tgt",
            ).alias("dst"),
            F.when(
                F.col("seed_tgt").isNull() & F.col("tgt_edge").isNotNull(),
                F.col("tgt_edge"),
            ).alias("chain"),
        )
    )
    # pointer-jumping: unresolved rows need target of edge ``chain`` —
    # which is exactly cur[edge=chain].dst once THAT row resolves. Iterate
    # joins until no chains remain (depth is O(log m) whp: each hop halves
    # the expected index).
    from linkgraph.iterutil import Pin

    pin = Pin(spark, "ba")
    cur = pin(cur)
    for _ in range(max_rounds):
        if cur.where(F.col("chain").isNotNull()).isEmpty():
            break
        ref = cur.select(
            F.col("edge").alias("chain"),
            F.col("dst").alias("ref_dst"),
            F.col("chain").alias("ref_chain"),
        )
        cur = pin(
            cur.join(ref, "chain", "left").select(
                "edge",
                "src",
                F.coalesce("dst", "ref_dst").alias("dst"),
                F.when(F.col("dst").isNull(), F.col("ref_chain")).alias("chain"),
            )
        )
    out = cur.select("src", "dst").unionByName(seed_df.select("src", "dst"))
    return (
        out.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def dynamic_edge_stream(
    spark: SparkSession,
    n: int = 100,
    steps: int = 200,
    p_remove: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Timestamped graph-event table (generators/Dynamic*Generator family
    → GraphEvent streams): step t emits an edge ADDITION (uniform random
    pair; colliding pairs can re-add an existing edge) and, with
    probability p_remove, ALSO a REMOVAL of an edge added at an earlier
    step (each add is removed at most once — duplicate back-references
    collapse to the earliest removal). Counter-based, deterministic;
    feed to linkgraph.streaming.deltas as a replayable event source."""
    ev = spark.range(steps).select(
        F.col("id").alias("ts"),
        (
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_000_007))
            / 1_000_000_007.0
        ).alias("coin"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n)).alias("u"),
        F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(n - 1)).alias("v0"),
        F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.greatest(F.col("id"), F.lit(1))).alias("back"),
    )
    adds = ev.select(
        "ts",
        F.lit("add_edge").alias("op"),
        F.col("u").alias("src"),
        # v0 ∈ [0, n-1); shift past u to avoid self-loops
        F.when(F.col("v0") >= F.col("u"), F.col("v0") + 1).otherwise(F.col("v0")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    from pyspark.sql import Window as _W

    removes = (
        ev.where((F.col("coin") < p_remove) & (F.col("ts") > 0))
        .select(F.col("ts"), F.col("back").alias("ref_ts"))
        # one removal per referenced add: two steps can draw the same
        # back-reference, and a second remove_edge for an already-removed
        # edge breaks strict delta consumers
        .withColumn(
            "_rn",
            F.row_number().over(_W.partitionBy("ref_ts").orderBy("ts")),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .join(
            adds.select(F.col("ts").alias("ref_ts"), "src", "dst"),
            "ref_ts",
        )
        .select(
            (F.col("ts") + F.lit(0.5)).alias("tsf"),
            F.lit("remove_edge").alias("op"),
            "src",
            "dst",
            F.lit(0.0).alias("weight"),
        )
    )
    return (
        adds.select(F.col("ts").cast("double").alias("tsf"), "op", "src", "dst", "weight")
        .unionByName(removes)
        .orderBy("tsf")
        .select(F.col("tsf").alias("ts"), "op", "src", "dst", "weight")
    )


def lfr(
    spark: SparkSession,
    n: int = 1000,
    mu: float = 0.1,
    tau_degree: float = 2.5,
    tau_community: float = 1.5,
    avg_degree: float = 10.0,
    max_degree: int | None = None,
    min_community: int = 20,
    max_community: int | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """LFR-style community benchmark (generators/LFRGenerator.cpp scope):
    power-law degrees (exponent ``tau_degree``), power-law community
    sizes (``tau_community``), mixing parameter ``mu`` = expected
    fraction of inter-community incident edges. Returns (edges,
    planted_labels(id, label)) with labels canonical (min member id).

    Distributed formulation (NOT the reference's sequential stub-rewiring
    — documented deviation): community sizes are drawn driver-side (the
    community LIST is #communities ≈ n/min_community rows, small; at true
    web scale the same cumsum runs as a distributed prefix sum), nodes are
    EXPLODED from community rows (linear, no range join), each node draws
    its degree from the closed-form power-law inverse CDF on a
    hash-permuted rank (decorrelates degree from community), and emits
    ceil((1−mu)·d) intra-stubs (uniform peer within community) +
    round(mu·d) inter-stubs (peer via the global power-law CDF on the
    permuted rank — inter links stay degree-proportional). Stub sampling
    approximates LFR's configuration-model rewiring; community structure,
    size/degree power laws and the mu dial — the properties detectors are
    benchmarked against — are preserved. Counter-based, deterministic."""
    rng = np.random.default_rng(seed)
    max_community = max_community or max(min_community * 5, n // 10)
    max_degree = max_degree or max(int(avg_degree * 5), 32)
    # community sizes: truncated power law, driver-side (small list)
    sizes = []
    total = 0
    while total < n:
        u = rng.random()
        lo, hi, a = min_community, max_community, 1.0 - tau_community
        s = int(((lo ** a) + u * ((hi ** a) - (lo ** a))) ** (1.0 / a))
        s = min(s, n - total)
        sizes.append(s)
        total += s
    # merge a too-small trailing community into the previous one
    if len(sizes) > 1 and sizes[-1] < min_community:
        sizes[-2] += sizes[-1]
        sizes.pop()
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(int)
    comm_df = spark.createDataFrame(
        [(int(c), int(st), int(sz)) for c, (st, sz) in enumerate(zip(starts, sizes))],
        "comm bigint, start bigint, size bigint",
    )
    nodes = comm_df.select(
        "comm",
        "start",
        "size",
        F.explode(F.sequence(F.col("start"), F.col("start") + F.col("size") - 1)).alias("id"),
    )
    # degree comes from the node's RANK in the same stride bijection the
    # inter-peer sampler inverts below (rank 0 = heaviest): a fresh hash
    # here decorrelated degrees from ranks, so the rank-CDF peer draw was
    # NOT degree-proportional despite the docstring's claim
    stride = 0x9E3779B1 | 1
    while math.gcd(stride, n) != 1:
        stride += 2
    inv_stride = pow(stride, -1, n)
    rank = F.pmod((F.col("id") - 7) * F.lit(inv_stride), F.lit(n))
    dmin = max(2.0, avg_degree * (tau_degree - 2.0) / (tau_degree - 1.0))
    a = 1.0 - tau_degree
    u = (rank + F.lit(0.5)) / F.lit(float(n))
    deg = F.least(
        F.lit(float(max_degree)),
        F.pow(
            F.lit(dmin ** a) + u * (F.lit(float(max_degree) ** a) - F.lit(dmin ** a)),
            F.lit(1.0 / a),
        ),
    )
    nd = nodes.withColumn("deg", deg)
    intra_k = F.greatest(F.ceil(F.col("deg") * (1.0 - mu)).cast("int"), F.lit(1))
    inter_k = F.round(F.col("deg") * mu).cast("int")
    # intra stubs: peer uniform within the community, self-loops dropped
    intra = (
        nd.select(
            "id", "start", "size",
            F.explode(F.sequence(F.lit(1), intra_k)).alias("s"),
        )
        .select(
            F.col("id").alias("src"),
            (F.col("start") + F.pmod(F.xxhash64("id", "s", F.lit(seed + 31)), F.col("size"))).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # inter stubs: global degree-proportional peer via the same power-law
    # CDF inverted on a uniform draw → rank → id through the bijection
    # rank→(rank*stride+shift) mod n (the permutation the degree draw
    # above is keyed to)
    u2 = (
        F.pmod(F.xxhash64("id", "s", F.lit(seed + 47)), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    # inverse of the rank-CDF for weights ∝ (rank+1)^(-1/(tau-1))
    alpha = 1.0 / (tau_degree - 1.0)
    inv_exp = 1.0 / (1.0 - alpha)
    peer_rank = F.least(
        F.lit(n - 1), (F.pow(u2, F.lit(inv_exp)) * n).cast("bigint")
    )
    inter = (
        nd.where(inter_k > 0)
        .select("id", F.explode(F.sequence(F.lit(1), inter_k)).alias("s"))
        .select(
            F.col("id").alias("src"),
            F.pmod(peer_rank * F.lit(stride) + F.lit(7), F.lit(n)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    edges = (
        intra.unionByName(inter)
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    labels = nodes.select("id", F.col("start").alias("label"))
    return edges, labels


def dorogovtsev_mendes(
    spark: SparkSession, n: int, seed: int = 42, max_rounds: int = 64
) -> DataFrame:
    """Dorogovtsev–Mendes growing network
    (generators/DorogovtsevMendesGenerator.cpp): start from a triangle;
    each new node picks a uniform random EXISTING EDGE and connects to
    both its endpoints (edge-copy preferential attachment; power-law
    degrees, high clustering). Sequential in the reference; here the same
    pointer-resolution trick as barabasi_albert: node t's random edge
    reference r(t) = hash(t) mod m_t is counter-based, one endpoint of
    every edge is its creator (closed form), the other endpoint of edge j
    aliases an earlier edge's endpoint → chains shrink strictly and
    resolve in O(log) pointer-jumping join rounds. Deterministic under
    any partitioning."""
    if n < 3:
        raise ValueError("dorogovtsev_mendes needs n >= 3")
    base = np.uint64((seed * 0xA24BAED4963EE407) % (1 << 64))
    # edge numbering: 0..2 = triangle (0,1),(1,2),(0,2); node t >= 3 adds
    # edges 3+2(t-3) and 3+2(t-3)+1, with m_t = 3 + 2(t-3) edges existing.
    tri = [(0, 1), (1, 2), (0, 2)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t = pdf["id"].to_numpy().astype(np.int64) + 3  # new node ids
            m_t = (3 + 2 * (t - 3)).astype(np.uint64)
            r = (_splitmix64(base + t.astype(np.uint64)) % m_t).astype(np.int64)
            out = []
            for side in (0, 1):
                out.append(
                    pd.DataFrame(
                        {
                            "edge": 3 + 2 * (t - 3) + side,
                            "src": t,
                            "ref": r,
                            "side": side,
                        }
                    )
                )
            yield pd.concat(out)

    att = spark.range(n - 3).mapInPandas(
        gen, "edge bigint, src bigint, ref bigint, side int"
    )
    tri_df = spark.createDataFrame(
        [(i, s, d) for i, (s, d) in enumerate(tri)],
        "edge bigint, src bigint, dst bigint",
    )
    # endpoint(ref, 0) = src of edge ref: triangle constant or creator-node
    # formula 3 + (ref-3)//2. endpoint(ref, 1) = dst of edge ref: triangle
    # constant or a chain to that edge's own resolution.
    tri_src = F.broadcast(tri_df.select(F.col("edge").alias("ref"), F.col("src").alias("t_src")))
    tri_dst = F.broadcast(tri_df.select(F.col("edge").alias("ref"), F.col("dst").alias("t_dst")))
    cur = (
        att.join(tri_src, "ref", "left")
        .join(tri_dst, "ref", "left")
        .select(
            "edge",
            "src",
            F.when(F.col("side") == 0,
                   F.coalesce(
                       "t_src",
                       F.lit(3) + ((F.col("ref") - 3) / 2).cast("bigint"),
                   ))
            .otherwise(F.col("t_dst"))
            .alias("dst"),
            F.when((F.col("side") == 1) & F.col("t_dst").isNull(), F.col("ref")).alias("chain"),
        )
    )
    from linkgraph.iterutil import Pin

    pin = Pin(spark, "dm")
    cur = pin(cur)
    for _ in range(max_rounds):
        if cur.where(F.col("chain").isNotNull()).isEmpty():
            break
        ref = cur.select(
            F.col("edge").alias("chain"),
            F.col("dst").alias("ref_dst"),
            F.col("chain").alias("ref_chain"),
        )
        cur = pin(
            cur.join(ref, "chain", "left").select(
                "edge",
                "src",
                F.coalesce("dst", "ref_dst").alias("dst"),
                F.when(F.col("dst").isNull(), F.col("ref_chain")).alias("chain"),
            )
        )
    out = cur.select("src", "dst").unionByName(tri_df.select("src", "dst"))
    return (
        out.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


def havel_hakimi(spark: SparkSession, degrees: list) -> DataFrame:
    """Havel–Hakimi degree-sequence realization
    (generators/HavelHakimiGenerator.cpp): greedy highest-degree-first
    wiring; raises ValueError when the sequence is not graphical
    (Erdős–Gallai violated). The greedy is inherently sequential —
    driver-side like the reference (fixture scale; large degree-driven
    graphs use chung_lu/chung_lu_fast, the expected-degree scale path)."""
    seq = sorted(((int(d), i) for i, d in enumerate(degrees)), reverse=True)
    edges = []
    import heapq

    heap = [(-d, i) for d, i in seq if d > 0]
    heapq.heapify(heap)
    while heap:
        d, v = heapq.heappop(heap)
        d = -d
        if d > len(heap):
            raise ValueError("degree sequence is not graphical")
        taken = [heapq.heappop(heap) for _ in range(d)]
        for du, u in taken:
            edges.append((min(u, v), max(u, v)))
        for du, u in taken:
            if -du - 1 > 0:
                heapq.heappush(heap, (du + 1, u))
    df = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], "src bigint, dst bigint, weight double"
    )
    return df


def hyperbolic_points(
    spark: SparkSession, n: int, a: float, R: float, seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id, theta, r) — deterministic counter-hash coordinates in the
    hyperbolic disk: theta uniform on [0, 2pi), r by inverting the radial
    CDF (cosh(a r)-1)/(cosh(a R)-1) on a hash-uniform draw.

    portable=True draws from the 60-bit md5 ``portable.phash`` instead of
    xxhash64 so the gate's DuckDB oracle can regenerate the identical
    point set (same arithmetic, same doubles)."""
    if portable:
        from linkgraph.portable import phash

        def draw(counter: int):
            return phash(F.col("id"), F.lit(int(seed)), F.lit(counter)) / F.lit(
                float(1 << 60)
            )
    else:
        base = F.lit(seed * 0x9E3779B9 + 0x243F6A88)

        def draw(counter: int):
            return F.shiftrightunsigned(
                F.xxhash64("id", base, F.lit(counter)), 11
            ) / F.lit(float(1 << 53))

    x = 1.0 + draw(1) * (math.cosh(a * R) - 1.0)
    # portable mode spells acosh as ln(x + sqrt(x^2-1)) — the exact
    # expression the DuckDB oracle computes (JVM acosh differs by ulps)
    r = (F.log(x + F.sqrt(x * x - 1.0)) if portable else F.acosh(x)) / a
    return spark.range(n).select(
        F.col("id"),
        (draw(0) * (2.0 * math.pi)).alias("theta"),
        r.alias("r"),
    )


def hyperbolic(
    spark: SparkSession,
    n: int,
    avg_degree: float = 8.0,
    gamma: float = 2.5,
    radius: float | None = None,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Random hyperbolic graph, threshold (T=0) model — generators/
    HyperbolicGenerator.cpp parity. Node i sits at (r_i, theta_i) in the
    hyperbolic disk of radius R (theta uniform, radial CDF
    (cosh(a r)-1)/(cosh(a R)-1) with a = (gamma-1)/2); u~v iff their
    hyperbolic distance <= R. Yields power-law degree exponent ~gamma
    with native hub skew.

    R defaults to the Krioukov et al. asymptotic estimate for the target
    average degree: avg_k ~= (2 a^2 / (pi (a - 1/2)^2)) * n * e^{-R/2}.

    Distributed shape (the engine's version of the reference's band data
    structure): coordinates are counter-hash deterministic (no RNG state,
    no shuffle to generate); CORE points (r <= 3R/4 — O(n^{1-3a/4}·) of
    them, a vanishing fraction) are broadcast-joined against everything,
    the hub path; PERIPHERY pairs (both r > 3R/4) have angular reach
    bounded by theta_max(3R/4, 3R/4), so a bucketed self-join on angular
    sectors of that width (own + adjacent sector) finds every candidate;
    each candidate is verified with the exact distance formula. Falls
    back to the plain self-join when the reach bound exceeds a sector
    third (tiny graphs).

    Returns canonical (src, dst, weight=1.0) rows with src < dst.
    """
    a = (gamma - 1.0) / 2.0
    if a <= 0.5:
        raise ValueError("gamma must exceed 2 (alpha > 1/2)")
    if radius is None:
        radius = 2.0 * math.log(
            (2.0 * a * a * n) / (math.pi * avg_degree * (a - 0.5) ** 2)
        )
    R = float(radius)
    pts = hyperbolic_points(spark, n, a, R, seed, portable=portable).localCheckpoint(eager=True)
    return _hyperbolic_pairs(pts, R, portable=portable)


def _hyperbolic_pairs(pts: DataFrame, R: float, portable: bool = False) -> DataFrame:
    """Canonical (src, dst, weight) within-distance-R pairs for a point
    table (id, theta, r) — the core/periphery banded candidate plan of
    ``hyperbolic``, reusable against MOVED point sets (the dynamic
    generator recomputes it per time step)."""
    spark = pts.sparkSession
    # portable mode spells cosh/sinh via exp — the exact expressions the
    # DuckDB oracle computes (no cosh/sinh builtins there; JVM ulps differ)
    if portable:
        _ch = lambda c: (F.exp(c) + F.exp(-c)) / 2.0  # noqa: E731
        _sh = lambda c: (F.exp(c) - F.exp(-c)) / 2.0  # noqa: E731
    else:
        _ch, _sh = F.cosh, F.sinh

    def _dist_ok(ru, rv, du):  # cosh d <= cosh R, d = hyperbolic distance
        return (
            _ch(ru) * _ch(rv) - _sh(ru) * _sh(rv) * F.cos(du)
        ) <= math.cosh(R) + 1e-12

    r_split = 0.75 * R
    core = pts.where(F.col("r") <= r_split)
    peri = pts.where(F.col("r") > r_split)

    # exact angular reach bound at the inner periphery rim
    ch = (math.cosh(r_split) ** 2 - math.cosh(R)) / (math.sinh(r_split) ** 2)
    theta_max = math.acos(max(-1.0, min(1.0, ch)))

    def _pairs_exact(left, right, anti_dup):
        l = left.select(
            F.col("id").alias("u"), F.col("theta").alias("tu"), F.col("r").alias("ru")
        )
        rt = right.select(
            F.col("id").alias("v"), F.col("theta").alias("tv"), F.col("r").alias("rv")
        )
        cond = F.col("u") < F.col("v") if anti_dup else F.col("u") != F.col("v")
        dtheta = F.abs(F.col("tu") - F.col("tv"))
        du = F.least(dtheta, 2.0 * math.pi - dtheta)
        return (
            l.join(rt, cond)
            .where(_dist_ok(F.col("ru"), F.col("rv"), du))
            .select(
                F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
            )
        )

    from pyspark.sql.functions import broadcast

    core_pairs = _pairs_exact(broadcast(core), pts, anti_dup=False)

    if theta_max >= (2.0 * math.pi) / 3.0:
        peri_pairs = _pairs_exact(peri, peri, anti_dup=True)
    else:
        n_buckets = int((2.0 * math.pi) // theta_max)
        bucket = F.floor(F.col("theta") / F.lit(2.0 * math.pi / n_buckets))
        lhs = peri.select(
            F.col("id").alias("u"), F.col("theta").alias("tu"), F.col("r").alias("ru"),
            F.explode(
                F.array(
                    F.pmod(bucket - 1, F.lit(n_buckets)),
                    bucket,
                    F.pmod(bucket + 1, F.lit(n_buckets)),
                )
            ).alias("b"),
        )
        rhs = peri.select(
            F.col("id").alias("v"), F.col("theta").alias("tv"), F.col("r").alias("rv"),
            bucket.alias("b"),
        )
        dtheta = F.abs(F.col("tu") - F.col("tv"))
        du = F.least(dtheta, 2.0 * math.pi - dtheta)
        peri_pairs = (
            lhs.join(rhs, "b")
            .where(F.col("u") < F.col("v"))
            .where(_dist_ok(F.col("ru"), F.col("rv"), du))
            .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        )

    return (
        core_pairs.unionByName(peri_pairs)
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


def powerlaw_degree_sequence(
    spark: SparkSession,
    n: int,
    gamma: float = 2.5,
    min_deg: int = 1,
    max_deg: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id, degree) — n power-law degrees P(d) ∝ d^(−gamma) on
    [min_deg, max_deg] via per-id counter-hash inverse-CDF draws
    (generators/PowerlawDegreeSequence.cpp parity: the reference samples
    the same truncated law; hash draws keep parallelism identity). Feed
    into chung_lu (expected degrees) or havel_hakimi (exact realization,
    fixture scale)."""
    from pyspark.sql import functions as F

    max_deg = max_deg if max_deg is not None else max(min_deg, int(n ** 0.5))
    a = 1.0 - float(gamma)
    lo, hi = float(min_deg) ** a, float(max_deg + 1) ** a
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000_007))
        / 1_000_000_007.0
    )
    # inverse CDF of the continuous truncated power law, floored
    inv = F.pow(F.lit(lo) + u * F.lit(hi - lo), F.lit(1.0 / a))
    return spark.range(n).select(
        F.col("id"),
        F.least(
            F.greatest(F.floor(inv).cast("int"), F.lit(int(min_deg))),
            F.lit(int(max_deg)),
        ).alias("degree"),
    )


def pubweb(
    spark: SparkSession,
    n: int,
    neighborhood_radius: float = 0.125,
    seed: int = 42,
) -> DataFrame:
    """(src, dst) — PubWebGenerator parity (generators/PubWebGenerator.cpp
    intent: points on the unit torus with a dense-center distribution,
    connected within a radius). Counter-hash coordinates (center-biased
    via averaging two uniforms), grid-bucket join over the 3×3
    neighborhood of each cell — the same spatial-bucket plan as the
    hyperbolic generator, O(n·density) candidate pairs, never all-pairs."""
    from pyspark.sql import functions as F

    r = float(neighborhood_radius)
    cell = max(r, 1e-6)
    n_cells = max(int(1.0 / cell), 1)
    u = lambda k: (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_003))
        / 1_000_003.0
    )
    pts = spark.range(n).select(
        "id",
        ((u(0) + u(1)) / 2.0).alias("x"),  # triangular: denser center
        ((u(2) + u(3)) / 2.0).alias("y"),
    ).persist()
    out = _pubweb_pairs(pts, r)
    pts.unpersist()
    return out


def _pubweb_pairs(pts: DataFrame, r: float) -> DataFrame:
    """Canonical (src, dst) within-torus-radius pairs for a point table
    (id, x, y) — pubweb's 3×3 grid-bucket plan, reusable against MOVED
    point sets (the dynamic generator recomputes it per time step)."""
    spark = pts.sparkSession
    cell = max(float(r), 1e-6)
    n_cells = max(int(1.0 / cell), 1)
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") * n_cells).cast("int").alias("cx"),
        F.floor(F.col("y") * n_cells).cast("int").alias("cy"),
    )
    # replicate each point into its 3x3 neighborhood (torus wrap)
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    rep = cells.crossJoin(offs).select(
        F.col("id").alias("rid"), F.col("x").alias("rx"), F.col("y").alias("ry"),
        F.pmod(F.col("cx") + F.col("dx"), F.lit(n_cells)).alias("cx"),
        F.pmod(F.col("cy") + F.col("dy"), F.lit(n_cells)).alias("cy"),
    )
    # torus distance
    ddx = F.abs(F.col("x") - F.col("rx"))
    ddy = F.abs(F.col("y") - F.col("ry"))
    tx = F.least(ddx, 1.0 - ddx)
    ty = F.least(ddy, 1.0 - ddy)
    out = (
        cells.join(rep, ["cx", "cy"])
        .where(F.col("id") < F.col("rid"))
        .where(tx * tx + ty * ty <= F.lit(r * r))
        .select(F.col("id").alias("src"), F.col("rid").alias("dst"))
        .distinct()
    )
    return out


def clustered_random_graph(
    spark: SparkSession,
    n: int,
    k: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """ClusteredRandomGraphGenerator parity (generators/
    ClusteredRandomGraphGenerator.cpp): each vertex joins one of ``k``
    clusters uniformly at random; every unordered pair gets an
    independent edge with probability ``p_in`` (same cluster) or
    ``p_out`` (different clusters). Returns ``(edges, labels)`` where
    labels is the planted partition ``(id, label)`` with label = cluster
    index — the reference's getCommunities().

    Coins and assignments are counter-hash deterministic (same graph at
    any parallelism). Candidate enumeration streams O(n^2) pairs through
    a filter — a fixture/oracle-scale generator like erdos_renyi; the
    sparse scale path is rmat/hyperbolic. ``portable=True`` swaps
    xxhash64 for the md5 portable hash so the gate's DuckDB oracle
    regenerates the identical graph (gen_clustered_structure)."""
    if portable:
        from linkgraph.portable import phash

        def assign(col):
            return F.pmod(phash(col, F.lit(seed), F.lit("c")), F.lit(k))

        def coin(a, b):
            return phash(a, b, F.lit(seed), F.lit("e")) / F.lit(float(1 << 60))

    else:

        def assign(col):
            return F.pmod(F.xxhash64(col, F.lit(seed), F.lit("c")), F.lit(k))

        def coin(a, b):
            return F.shiftrightunsigned(
                F.xxhash64(a, b, F.lit(seed), F.lit("e")), 11
            ) / F.lit(float(1 << 53))

    labels = spark.range(n).select(
        "id", assign(F.col("id")).cast("bigint").alias("label")
    )
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
        .where(F.col("src") < F.col("dst"))
    )
    same = assign(F.col("src")) == assign(F.col("dst"))
    edges = pairs.where(
        coin(F.col("src"), F.col("dst"))
        < F.when(same, F.lit(float(p_in))).otherwise(F.lit(float(p_out)))
    ).withColumn("weight", F.lit(1.0))
    return edges, labels


def mocnik(
    spark: SparkSession,
    n: int,
    dim: int = 2,
    k: float = 2.5,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """MocnikGenerator parity (generators/MocnikGenerator.cpp — Mocnik &
    Fairbairn spatial-network model): ``n`` points uniform in the unit
    ``dim``-cube; directed edge u->v (both directions, as the reference
    emits) iff euclidean dist(u, v) < k * n^(-1/dim). Returns
    (src, dst, weight=1.0).

    Scale shape: NOT the reference's kd-scan — candidate pairs come from
    a grid-cell equi-join at cell width = radius, so each vertex only
    meets the 3^dim neighboring cells (expected O(k^dim) candidates per
    vertex, O(n) total work, one shuffle on cell key); a within-radius
    pair always lies in adjacent cells, and each ordered pair appears
    exactly once because the probe side emits each offset cell once.
    Coordinates are counter-hash deterministic; ``portable=True`` uses
    the md5 portable hash so the DuckDB oracle regenerates the identical
    point set and re-derives every edge by brute-force pairwise distance
    (a full end-to-end check of the bucketed candidate join)."""
    import itertools

    if portable:
        from linkgraph.portable import phash

        def draw(j):
            return phash(F.col("id"), F.lit(seed), F.lit(j)) / F.lit(float(1 << 60))

    else:

        def draw(j):
            return F.shiftrightunsigned(
                F.xxhash64("id", F.lit(seed), F.lit(j)), 11
            ) / F.lit(float(1 << 53))

    radius = float(k) * float(n) ** (-1.0 / dim)
    pts = spark.range(n).select(
        "id", *[draw(j).alias(f"x{j}") for j in range(dim)]
    )
    cells = pts.select(
        "id",
        *[F.col(f"x{j}") for j in range(dim)],
        *[
            F.floor(F.col(f"x{j}") / F.lit(radius)).cast("bigint").alias(f"c{j}")
            for j in range(dim)
        ],
    )
    home = cells.select(
        F.col("id").alias("src"),
        *[F.col(f"x{j}").alias(f"sx{j}") for j in range(dim)],
        F.concat_ws(",", *[F.col(f"c{j}") for j in range(dim)]).alias("cell"),
    )
    offsets = spark.createDataFrame(
        [tuple(o) for o in itertools.product((-1, 0, 1), repeat=dim)],
        ", ".join(f"o{j} bigint" for j in range(dim)),
    )
    probe = cells.crossJoin(F.broadcast(offsets)).select(
        F.col("id").alias("dst"),
        *[F.col(f"x{j}").alias(f"dx{j}") for j in range(dim)],
        F.concat_ws(
            ",", *[F.col(f"c{j}") + F.col(f"o{j}") for j in range(dim)]
        ).alias("cell"),
    )
    d2 = None
    for j in range(dim):
        t = (F.col(f"sx{j}") - F.col(f"dx{j}")) * (
            F.col(f"sx{j}") - F.col(f"dx{j}")
        )
        d2 = t if d2 is None else d2 + t
    return (
        home.join(probe, "cell")
        .where((F.col("src") != F.col("dst")) & (d2 < F.lit(radius * radius)))
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


def _snapshot_events(snapshots: list) -> DataFrame:
    """GraphEvent table (ts, op, src, dst, weight) from a list of
    (t, edge_df) snapshots: per consecutive pair, additions = E_t \\ E_{t-1}
    and removals = E_{t-1} \\ E_t, each a pair of anti-joins — the
    distributed diff that turns any deterministic position model into a
    Dynamic*Generator event stream."""
    prev_t, prev = snapshots[0]
    out = prev.select(
        F.lit(float(prev_t)).alias("ts"),
        F.lit("add_edge").alias("op"),
        "src",
        "dst",
        F.lit(1.0).alias("weight"),
    )
    for t, cur in snapshots[1:]:
        adds = cur.join(prev, ["src", "dst"], "left_anti").select(
            F.lit(float(t)).alias("ts"),
            F.lit("add_edge").alias("op"),
            "src",
            "dst",
            F.lit(1.0).alias("weight"),
        )
        rems = prev.join(cur, ["src", "dst"], "left_anti").select(
            F.lit(float(t)).alias("ts"),
            F.lit("remove_edge").alias("op"),
            "src",
            "dst",
            F.lit(0.0).alias("weight"),
        )
        out = out.unionByName(adds).unionByName(rems)
        prev = cur
    return out.orderBy("ts", "op", "src", "dst")


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    steps: int,
    avg_degree: float = 8.0,
    gamma: float = 2.5,
    omega: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """DynamicHyperbolicGenerator parity (generators/
    DynamicHyperbolicGenerator.cpp intent: nodes MOVE in the hyperbolic
    disk; edges appear/disappear as pairwise distances cross R). Each node
    gets a fixed counter-hash angular velocity in [-omega/2, omega/2]
    rad/step (radial coordinate fixed); the step-t snapshot is the
    threshold graph over the rotated point set, computed with the SAME
    banded core/periphery candidate plan as the static generator, and
    events are the distributed diff of consecutive snapshots. Everything
    is a deterministic function of (id, t) — no sequential RNG state, so
    any step's snapshot is reproducible in isolation."""
    a = (gamma - 1.0) / 2.0
    R = 2.0 * math.log(
        (2.0 * a * a * n) / (math.pi * avg_degree * (a - 0.5) ** 2)
    )
    pts0 = hyperbolic_points(spark, n, a, R, seed).localCheckpoint(eager=True)
    vel = (
        F.shiftrightunsigned(F.xxhash64("id", F.lit(seed), F.lit("w")), 11)
        / F.lit(float(1 << 53))
        - 0.5
    ) * F.lit(float(omega))
    snaps = []
    two_pi = 2.0 * math.pi
    for t in range(steps + 1):
        pts_t = pts0.select(
            "id",
            F.pmod(F.col("theta") + F.lit(float(t)) * vel, F.lit(two_pi)).alias(
                "theta"
            ),
            "r",
        )
        snaps.append(
            (t, _hyperbolic_pairs(pts_t, R).select("src", "dst").localCheckpoint(eager=True))
        )
    return _snapshot_events(snaps)


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    steps: int,
    neighborhood_radius: float = 0.125,
    velocity: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """DynamicPubWebGenerator parity (generators/DynamicPubWebGenerator.cpp
    intent: peers drift on the unit torus; links hold while within the
    neighborhood radius). Per-node constant drift vector from counter
    hashes (|v| ≤ velocity/2 per axis per step, torus wrap); snapshots via
    the static generator's 3×3 grid-bucket plan; events = distributed
    snapshot diff. Deterministic function of (id, t)."""
    u = lambda k: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_003))
        / 1_000_003.0
    )
    pts0 = spark.range(n).select(
        "id",
        ((u(0) + u(1)) / 2.0).alias("x"),
        ((u(2) + u(3)) / 2.0).alias("y"),
        ((u(4) - 0.5) * velocity).alias("vx"),
        ((u(5) - 0.5) * velocity).alias("vy"),
    ).localCheckpoint(eager=True)
    snaps = []
    for t in range(steps + 1):
        pts_t = pts0.select(
            "id",
            F.pmod(F.col("x") + F.lit(float(t)) * F.col("vx"), F.lit(1.0)).alias("x"),
            F.pmod(F.col("y") + F.lit(float(t)) * F.col("vy"), F.lit(1.0)).alias("y"),
        )
        snaps.append(
            (
                t,
                _pubweb_pairs(pts_t, neighborhood_radius)
                .select("src", "dst")
                .localCheckpoint(eager=True),
            )
        )
    return _snapshot_events(snaps)


def dynamic_forest_fire_events(
    spark: SparkSession,
    steps: int,
    p: float = 0.3,
    r_back: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """DynamicForestFireGenerator parity (generators/
    DynamicForestFireGenerator.cpp; Leskovec et al. forest-fire model):
    each time step a new node arrives, picks a uniform ambassador among
    existing nodes, and "burns" outward — every untried neighbor of a
    burning node catches fire independently with probability ``p``
    (``r_back·p`` across reverse edges) — the new node linking to every
    burned node. Events are (ts, add_edge, new_node, burned) rows.

    Scale note: event GENERATION here is inherently sequential (step t's
    burn walks edges added by steps < t — the reference generator is the
    same single-threaded loop), so this runs as a seeded numpy loop on
    the driver and parallelizes only the OUTPUT; it is a fixture/stream-
    source generator feeding linkgraph.streaming.deltas, not a corpus-
    scale op. Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    fwd: dict[int, list] = {0: []}
    rev: dict[int, list] = {0: []}
    rows = []
    for v in range(1, steps + 1):
        amb = int(rng.integers(0, v))
        burned = {amb}
        frontier = [amb]
        while frontier:
            nxt = []
            for w in frontier:
                for x in fwd.get(w, ()):
                    if x not in burned and rng.random() < p:
                        burned.add(x)
                        nxt.append(x)
                for x in rev.get(w, ()):
                    if x not in burned and rng.random() < r_back * p:
                        burned.add(x)
                        nxt.append(x)
            frontier = nxt
        fwd[v] = sorted(burned)
        rev[v] = []
        for w in burned:
            rev[w].append(v)
            rows.append((float(v), "add_edge", v, int(w), 1.0))
    return spark.createDataFrame(
        rows, "ts double, op string, src bigint, dst bigint, weight double"
    )
