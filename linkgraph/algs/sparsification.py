"""Edge-score sparsification — local-rank filters over edge scores.

Reference parity: sparsification/{LocalDegreeScore, RandomEdgeScore,
GlobalThresholdFilter}.cpp and the edge-score normalization toolkit
(edgescores/EdgeScoreNormalizer). Scores are per-edge columns; the local
filter is a window ``rank() over (partition by src order by score)`` —
the canonical window-function surface of the engine (SURVEY §2B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def local_degree_score(graph: Graph) -> DataFrame:
    """(src, dst, score): per LocalDegreeScore — rank neighbors by their
    degree; score = 1 − (rank−1)/deg(src), so keeping score ≥ 1−α retains
    each vertex's top-α fraction of highest-degree neighbors (preserves
    the backbone/hub structure)."""
    deg = graph.degrees().select("id", "degree")
    sym = graph.symmetric_edges().join(
        deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst"
    )
    w = Window.partitionBy("src").orderBy(F.desc("ddeg"), F.asc("dst"))
    sdeg = Window.partitionBy("src")
    return sym.select(
        "src",
        "dst",
        (
            1.0
            - (F.rank().over(w) - 1)
            / F.count("*").over(sdeg)
        ).alias("score"),
    )


def random_edge_score(graph: Graph, seed: int = 42) -> DataFrame:
    """Deterministic pseudo-random per-edge score in [0,1) — hash-based so
    the score is stable across runs/partitioning (RandomEdgeScore with the
    reference's seeded Aux::Random)."""
    return graph.symmetric_edges().select(
        "src",
        "dst",
        (
            F.pmod(F.xxhash64(F.least("src", "dst"), F.greatest("src", "dst"), F.lit(seed)),
                   F.lit(1_000_000_007)) / 1_000_000_007.0
        ).alias("score"),
    )


def global_threshold_filter(
    scored_edges: DataFrame, threshold: float, above: bool = True
) -> DataFrame:
    """Keep edges with score ≥/< threshold (GlobalThresholdFilter)."""
    cond = F.col("score") >= threshold if above else F.col("score") < threshold
    return scored_edges.where(cond)


def local_sparsifier(graph: Graph, alpha: float, score_fn=local_degree_score) -> Graph:
    """Sparsify: keep each vertex's edges with score ≥ 1−α (α in (0,1];
    α=1 keeps everything). Returns the sparsified undirected graph."""
    kept = global_threshold_filter(score_fn(graph), 1.0 - alpha).select("src", "dst")
    canon = kept.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    e = graph.symmetric_edges().where(F.col("src") < F.col("dst")).join(
        canon, ["src", "dst"], "left_semi"
    )
    return Graph(e, directed=False, weighted=graph.weighted)


def local_similarity_score(graph: Graph) -> DataFrame:
    """(src, dst, score) — per-edge Jaccard of endpoint neighborhoods
    EXCLUDING the endpoints themselves (sparsification/
    LocalSimilarityScore.cpp's similarity kernel): with T = per-edge
    triangle count, score = T / (deg(u) + deg(v) − T − 2); 0 when both
    endpoints are degree-1 (empty union)."""
    from linkgraph.algs.triangles import per_edge_triangles

    tri = per_edge_triangles(graph)  # |Γ(u)∩Γ(v)| per canonical edge
    deg = graph.remove_self_loops().degrees().select("id", "degree")
    denom = F.col("du") + F.col("dv") - F.col("triangles") - 2
    return (
        tri.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dv"), "dst")
        .select(
            "src",
            "dst",
            F.when(denom > 0, F.col("triangles") / denom).otherwise(0.0).alias("score"),
        )
    )


def scan_structural_similarity(graph: Graph) -> DataFrame:
    """(src, dst, score) — SCAN structural similarity
    (sparsification/SCANStructuralSimilarityScore.cpp):
    |Γ⁺(u)∩Γ⁺(v)| / sqrt(|Γ⁺(u)|·|Γ⁺(v)|) with closed neighborhoods
    Γ⁺(x) = Γ(x) ∪ {x}; shared count = per-edge triangles + the two
    endpoints themselves."""
    from linkgraph.algs.triangles import per_edge_triangles

    tri = per_edge_triangles(graph)
    deg = graph.remove_self_loops().degrees().select("id", "degree")
    return (
        tri.join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dv"), "dst")
        .select(
            "src",
            "dst",
            (
                (F.col("triangles") + 2)
                / F.sqrt((F.col("du") + 1.0) * (F.col("dv") + 1.0))
            ).alias("score"),
        )
    )


def multiscale_score(graph: Graph) -> DataFrame:
    """(src, dst, score) — multiscale backbone significance
    (sparsification/MultiscaleScore.cpp; Serrano et al. PNAS'09 disparity
    filter): for edge e at endpoint x with strength s_x and degree k_x,
    p = w_e/s_x and the edge's significance is 1 − (1−p)^(k_x−1); the
    edge score is the MAX over both endpoints (an edge survives if it is
    significant for either). Pure joins + codegen arithmetic — no window,
    no UDF."""
    sym = graph.symmetric_edges()
    stats = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("k"), F.sum("weight").alias("s")
    )
    e = (
        sym.where(F.col("src") < F.col("dst"))
        .join(stats.withColumnRenamed("id", "src")
              .withColumnRenamed("k", "ku").withColumnRenamed("s", "su"), "src")
        .join(stats.withColumnRenamed("id", "dst")
              .withColumnRenamed("k", "kv").withColumnRenamed("s", "sv"), "dst")
    )

    def sig(w, s, k):
        p = F.least(w / s, F.lit(1.0))
        # k=1: single edge carries all strength — fully significant
        return F.when(k <= 1, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.pow(F.lit(1.0) - p, k - F.lit(1.0))
        )

    return e.select(
        "src",
        "dst",
        F.greatest(
            sig(F.col("weight"), F.col("su"), F.col("ku")),
            sig(F.col("weight"), F.col("sv"), F.col("kv")),
        ).alias("score"),
    )


def forest_fire_score(
    graph: Graph,
    n_fires: int = 64,
    p_burn: float = 0.7,
    max_rounds: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, score) — ForestFireScore.cpp: repeatedly ignite a random
    vertex and let the fire spread along edges, each neighbor catching
    with probability p_burn; an edge's score is the fraction of fires
    that traversed it. Distributed shape: ALL fires burn simultaneously —
    the frontier table carries a fire column (multi-source-BFS pattern),
    per-(fire, edge, round) coins are counter-based xxhash64, visited
    state is a (fire, id) table. O(max_rounds) supersteps total,
    independent of n_fires."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().select("src", "dst").persist()
    # start vertex of fire f: bucket nodes by hash into n_fires buckets
    # and take each bucket's min-hash node — ONE partial+final hash-agg,
    # no global sort/window, deterministic under any partitioning. Empty
    # buckets (n < n_fires) simply light fewer fires.
    n = graph.nodes().count()
    hashed = graph.nodes().select(
        "id",
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_fires)).alias("fire"),
        F.xxhash64("id", F.lit(seed + 1)).alias("h"),
    )
    starts = (
        hashed.groupBy("fire")
        .agg(F.min_by("id", "h").alias("id"))
        .select("fire", "id")
    )
    visited = starts.localCheckpoint(eager=True)
    frontier = visited
    burns = None
    for t in range(max_rounds):
        cand = (
            frontier.join(sym, frontier.id == sym.src)
            .select("fire", "src", "dst")
            .withColumn(
                "coin",
                F.pmod(
                    F.xxhash64("fire", "src", "dst", F.lit(seed + t)),
                    F.lit(1_000_000_007),
                )
                / 1_000_000_007.0,
            )
            .where(F.col("coin") < p_burn)
            .select("fire", "src", "dst")
        )
        new_burn_edges = cand.join(
            visited.select("fire", F.col("id").alias("dst")), ["fire", "dst"], "left_anti"
        ).localCheckpoint(eager=True)
        burns = (
            new_burn_edges
            if burns is None
            else burns.unionByName(new_burn_edges).localCheckpoint(eager=True)
        )
        frontier = (
            new_burn_edges.select("fire", F.col("dst").alias("id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    sym.unpersist()
    if burns is None:
        return graph.edges.select("src", "dst", F.lit(0.0).alias("score"))
    canon = burns.select(
        "fire", F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    counts = canon.groupBy("src", "dst").agg(
        (F.count("*") / F.lit(float(n_fires))).alias("score")
    )
    base = graph.edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return base.join(counts, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def edge_switching(
    graph: Graph, rounds: int = 10, seed: int = 42
) -> Graph:
    """Degree-preserving randomization — PARALLEL edge switching
    (randomization/EdgeSwitchingMarkovChainGenerator.cpp /
    randomization/Curveball.cpp intent; the reference's chains are
    sequential MCMC, this is the synchronous-rounds variant): each round,
    edges are hash-paired into buckets of two; a bucket {(a,b),(c,d)}
    proposes the switch {(a,d),(c,b)} (degrees invariant by
    construction); proposals that would create a self-loop or duplicate
    an existing/just-created edge are rejected (their originals stay).
    Each round is: one bucket hash + one window over 2-row buckets + one
    anti-join validity check — all partition-parallel, deterministic by
    counter hashes."""
    spark = graph.edges.sparkSession
    cur = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    m = cur.count()  # invariant: switches preserve the edge count
    n_buckets = max(m // 2, 1)
    for t in range(rounds):
        h = F.xxhash64("src", "dst", F.lit(seed + t))
        w = Window.partitionBy("bucket").orderBy("h")
        tagged = (
            cur.withColumn("h", h)
            .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("sz", F.count("*").over(Window.partitionBy("bucket")))
        )
        # pair rows 1&2 of each bucket (extras stay unswitched)
        a = tagged.where((F.col("rn") == 1) & (F.col("sz") >= 2)).select(
            "bucket", F.col("src").alias("a"), F.col("dst").alias("b")
        )
        b = tagged.where(F.col("rn") == 2).select(
            "bucket", F.col("src").alias("c"), F.col("dst").alias("d")
        )
        prop = (
            a.join(b, "bucket")
            .select(
                "bucket", "a", "b", "c", "d",
                F.least("a", "d").alias("s1"), F.greatest("a", "d").alias("d1"),
                F.least("c", "b").alias("s2"), F.greatest("c", "b").alias("d2"),
            )
            .where(
                (F.col("a") != F.col("d")) & (F.col("c") != F.col("b"))
                & ~((F.col("s1") == F.col("s2")) & (F.col("d1") == F.col("d2")))
            )
        )
        # reject proposals that collide with surviving current edges
        new1 = prop.select("bucket", F.col("s1").alias("src"), F.col("d1").alias("dst"))
        new2 = prop.select("bucket", F.col("s2").alias("src"), F.col("d2").alias("dst"))
        news = new1.unionByName(new2)
        originals = prop.select(
            "bucket", F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(
            prop.select("bucket", F.col("c").alias("src"), F.col("d").alias("dst"))
        )
        untouched = cur.join(
            originals.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        # CONSERVATIVE validity: reject a proposal whose new edge exists
        # ANYWHERE in the current graph — including edges other buckets
        # are switching away. Checking only `untouched` cascades: a
        # reverted bucket restores its originals, which may then collide
        # with an already-accepted proposal. Slightly fewer acceptances
        # per round, but rounds compose and the chain stays valid.
        conflict = (
            news.join(cur, ["src", "dst"], "left_semi")
            .select("bucket")
            .union(
                news.groupBy("src", "dst")
                .agg(F.count("*").alias("n"), F.collect_set("bucket").alias("bs"))
                .where(F.col("n") > 1)
                .select(F.explode("bs").alias("bucket"))
            )
            .distinct()
        )
        ok = prop.join(conflict, "bucket", "left_anti")
        switched = (
            ok.select(F.col("s1").alias("src"), F.col("d1").alias("dst"))
            .unionByName(ok.select(F.col("s2").alias("src"), F.col("d2").alias("dst")))
        )
        reverted = prop.join(conflict, "bucket", "left_semi")
        kept_originals = (
            reverted.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(reverted.select(F.col("c").alias("src"), F.col("d").alias("dst")))
        )
        cur = (
            untouched.unionByName(switched).unionByName(kept_originals)
            .localCheckpoint(eager=True)
        )
    return Graph(
        cur.withColumn("weight", F.lit(1.0)), directed=False, weighted=False
    )


def degree_preserving_shuffle(
    graph: Graph, seed: int = 42, n_buckets: int = 256
) -> DataFrame:
    """(src, dst, weight) — randomization/DegreePreservingShuffle.cpp:
    permute vertex IDENTITIES among equal-degree vertices (hash-ordered
    within each class), preserving the exact degree sequence and graph
    structure while destroying id-attribute correlations.

    Skew shape: low degrees dominate a web graph (the degree-1 class is
    billions of vertices), so the permutation windows partition on
    (degree, hash-bucket) rather than bare degree — a bijection within
    each subgroup is still degree-preserving, and no window partition
    exceeds ~class/n_buckets rows."""
    from pyspark.sql import Window

    deg = graph.degrees().select("id", "degree").withColumn(
        "bkt", F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(n_buckets))
    )
    w_old = Window.partitionBy("degree", "bkt").orderBy(F.asc("id"))
    w_new = Window.partitionBy("degree", "bkt").orderBy(
        F.xxhash64("id", F.lit(seed)), F.asc("id")
    )
    old_rank = deg.select(
        "id", "degree", "bkt", F.row_number().over(w_old).alias("rk")
    )
    new_rank = deg.select(
        F.col("id").alias("nid"), "degree", "bkt",
        F.row_number().over(w_new).alias("rk"),
    )
    mapping = old_rank.join(new_rank, ["degree", "bkt", "rk"]).select("id", "nid")
    e = graph.edges
    return (
        e.join(mapping.withColumnRenamed("id", "src"), "src")
        .select(F.col("nid").alias("src"), "dst", "weight")
        .join(mapping.withColumnRenamed("id", "dst"), "dst")
        .select("src", F.col("nid").alias("dst"), "weight")
    )


def global_curveball(graph: Graph, rounds: int = 5, seed: int = 42) -> Graph:
    """Degree-preserving randomization — GLOBAL CURVEBALL trades
    (randomization/GlobalCurveball.cpp; Carstens et al. "Parallel and I/O-
    efficient randomisation of massive networks using Global Curveball
    trades"). Per round: vertices are hash-paired, and each pair (u, v)
    randomly redistributes its tradeable neighbors between u and v,
    preserving every degree by construction.

    Parallel-safe formulation: each undirected edge gets a per-round
    hash-flipped ORIENTATION, so it lives in exactly ONE vertex's trade
    list (no two pairs can trade the same edge — global rounds are
    conflict-free with no reject/retry path, unlike edge_switching's
    collision checks); the flip alternates which endpoint gets to trade
    the edge across rounds. A pair's tradeable set excludes the partner's
    full neighborhood and the partner itself (the reference's
    disjoint-set rule, adapted to one-owner orientation), which also
    makes every reassignment duplicate- and self-loop-free. Pool
    shuffling = one window per pair bucket (bounded by deg(u)+deg(v)),
    everything else hash joins/aggs — deterministic under any
    partitioning."""
    cur = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = graph.nodes().localCheckpoint(eager=True)
    n = nodes.count()
    n_pairs = max(n // 2, 1)
    for t in range(rounds):
        # per-round orientation: owner trades the edge this round
        flip = F.pmod(F.xxhash64("src", "dst", F.lit(seed + t), F.lit("o")), F.lit(2))
        adj = cur.select(
            F.when(flip == 0, F.col("src")).otherwise(F.col("dst")).alias("owner"),
            F.when(flip == 0, F.col("dst")).otherwise(F.col("src")).alias("target"),
        )
        # hash-pair the vertices (extras in buckets of size != 2 sit out)
        ph = F.xxhash64("id", F.lit(seed + t), F.lit("p"))
        w = Window.partitionBy("bucket").orderBy("h", "id")
        tagged = (
            nodes.withColumn("h", ph)
            .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_pairs)))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("sz", F.count("*").over(Window.partitionBy("bucket")))
        )
        pairs = (
            tagged.where((F.col("rn") == 1) & (F.col("sz") == 2))
            .select("bucket", F.col("id").alias("u"))
            .join(
                tagged.where((F.col("rn") == 2) & (F.col("sz") == 2)).select(
                    "bucket", F.col("id").alias("v")
                ),
                "bucket",
            )
        )
        members = pairs.select(
            "bucket", F.col("u").alias("owner"), F.col("v").alias("partner")
        ).unionByName(
            pairs.select(
                "bucket", F.col("v").alias("owner"), F.col("u").alias("partner")
            )
        )
        owned = adj.join(members, "owner")
        # tradeable = owned targets not the partner and not in the
        # partner's neighborhood (either orientation)
        nbr = cur.select(F.col("src").alias("partner"), F.col("dst").alias("target")).unionByName(
            cur.select(F.col("dst").alias("partner"), F.col("src").alias("target"))
        )
        tradeable = (
            owned.where(F.col("target") != F.col("partner"))
            .join(nbr, ["partner", "target"], "left_anti")
            .localCheckpoint(eager=True)
        )
        fixed = adj.join(
            tradeable.select("owner", "target"), ["owner", "target"], "left_anti"
        )
        # shuffle each pair's pool; the first |tradeable_u| go to u
        quota = (
            tradeable.join(pairs.select("bucket", "u"), "bucket")
            .where(F.col("owner") == F.col("u"))
            .groupBy("bucket")
            .agg(F.count("*").alias("qu"))
        )
        sw = Window.partitionBy("bucket").orderBy(
            F.xxhash64("target", F.lit(seed + t), F.lit("s")), "target"
        )
        reassigned = (
            tradeable.withColumn("pos", F.row_number().over(sw))
            .join(pairs.select("bucket", "u", "v"), "bucket")
            .join(quota, "bucket", "left")
            .select(
                F.when(
                    F.col("pos") <= F.coalesce("qu", F.lit(0)), F.col("u")
                ).otherwise(F.col("v")).alias("owner"),
                "target",
            )
        )
        cur = (
            fixed.select("owner", "target")
            .unionByName(reassigned)
            .select(
                F.least("owner", "target").alias("src"),
                F.greatest("owner", "target").alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
    return Graph(
        cur.withColumn("weight", F.lit(1.0)), directed=False, weighted=False
    )
