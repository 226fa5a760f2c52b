"""KadabraBetweenness — adaptive path-sampling betweenness.

Reference parity: centrality/KadabraBetweenness.cpp (Borassi & Natale,
ESA'16 "KADABRA is an ADaptive Algorithm for Betweenness via Random
Approximation"). The estimator: sample random (s, t) pairs, pick ONE
uniformly-random shortest s→t path, count traversals per internal
vertex; b̃(v) = traversals(v)/samples is an unbiased estimate of
NORMALIZED betweenness b(v) = Σ_{s≠t} σ_st(v)/σ_st / (n(n−1)).
Sampling stops adaptively once an empirical-Bernstein confidence radius
drops under ``epsilon`` for every vertex (union bound over n), or at the
ω = O((log n + log(1/δ))/ε²) budget.

Distributed formulation — every batch of B pairs advances TOGETHER:

- forward: pair-keyed level-synchronous BFS with σ path counts (the
  linkgraph/algs/betweenness.py plan, source column = pair id);
- path sampling: walk backwards from t; at (pair, w) the predecessor v
  (edge v→w, depth(v) = depth(w) − 1) is drawn with probability
  σ_v / Σ σ_pred via a cumulative-σ inversion against a counter-hash
  uniform — ONE window + join per level, all pairs in parallel, no
  per-pair loops;
- per-vertex traversal counts accumulate in a DataFrame; the stopping
  scalar (max Bernstein radius) is one aggregate per batch.

State is O(pairs·reached) during a batch and O(n) between batches.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def _dense_index(nodes: DataFrame, n_ranges: int = 64) -> DataFrame:
    """(id, rk) — dense 0..n-1 index by ascending id WITHOUT a global
    single-partition window: range-partition on id, rank within each
    partition under a PARTITIONED window, shift by broadcast per-partition
    offsets (the same scale-safe exact-rank shape as
    edgescores.linearize_scores)."""
    keyed = nodes.select("id").repartitionByRange(n_ranges, F.asc("id")).withColumn(
        "_part", F.spark_partition_id()
    )
    keyed = keyed.localCheckpoint(eager=True)
    counts = {
        r["_part"]: r["c"]
        for r in keyed.groupBy("_part").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_df = keyed.sparkSession.createDataFrame(
        list(offsets.items()), "_part int, _off bigint"
    )
    w = Window.partitionBy("_part").orderBy(F.asc("id"))
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(off_df), "_part")
        .select("id", (F.col("_off") + F.col("_rk") - 1).alias("rk"))
    )


def kadabra_betweenness(
    graph: Graph,
    epsilon: float = 0.05,
    delta: float = 0.1,
    batch_size: int = 64,
    max_batches: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, score) — normalized betweenness within ±epsilon with
    probability ≥ 1−delta (adaptive; stops early when the empirical
    Bernstein bound allows)."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    nodes = graph.nodes().persist()
    n = nodes.count()
    if n < 3:
        e.unpersist()
        return nodes.select("id", F.lit(0.0).alias("score"))
    # ω: the non-adaptive VC-style budget — the adaptive rule only ever
    # stops EARLIER than this
    omega = int(
        math.ceil((0.5 / epsilon**2) * (math.log2(n) + 1 + math.log(1.0 / delta)))
    )
    counts = nodes.select("id", F.lit(0.0).alias("cnt")).localCheckpoint(eager=True)
    samples = 0
    log_term = math.log(3.0 * n / delta)
    for batch in range(max_batches):
        # --- deterministic random pairs for this batch -------------------
        h1 = F.pmod(F.xxhash64("pair", F.lit(seed), F.lit(batch)), F.lit(n))
        h2 = F.pmod(
            F.xxhash64("pair", F.lit(seed + 7), F.lit(batch)), F.lit(n - 1)
        )
        idx = spark.range(batch_size).select(F.col("id").alias("pair"))
        ranked = _dense_index(nodes)
        pairs = (
            idx.select("pair", h1.alias("rs"), h2.alias("rt"))
            .withColumn("rt", F.when(F.col("rt") >= F.col("rs"), F.col("rt") + 1).otherwise(F.col("rt")))
            .join(ranked.withColumnRenamed("rk", "rs").withColumnRenamed("id", "s"), "rs")
            .join(ranked.withColumnRenamed("rk", "rt").withColumnRenamed("id", "t"), "rt")
            .select("pair", "s", "t")
            .localCheckpoint(eager=True)
        )
        # --- forward BFS with sigma, keyed by pair -----------------------
        dist = pairs.select(
            "pair", F.col("s").alias("id"), F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")
        ).localCheckpoint(eager=True)
        frontier = dist
        levels = 0
        while True:
            cand = (
                frontier.join(e, frontier.id == e.src)
                .groupBy("pair", F.col("dst").alias("id"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            new = (
                cand.join(dist.select("pair", "id"), ["pair", "id"], "left_anti")
                .select("pair", "id", F.lit(levels + 1).alias("dist"), "sigma")
                .localCheckpoint(eager=True)
            )
            if new.isEmpty():
                break
            dist = dist.unionByName(new).localCheckpoint(eager=True)
            frontier = new
            levels += 1
        # --- backward uniform-shortest-path sampling ---------------------
        # start at t for pairs where t was reached
        t_state = (
            pairs.join(
                dist.select("pair", F.col("id").alias("t"), F.col("dist").alias("dt")),
                ["pair", "t"],
            )
            .select("pair", F.col("t").alias("cur"), F.col("dt").alias("d"))
            .localCheckpoint(eager=True)
        )
        walked = spark.createDataFrame([], "pair bigint, id bigint")
        lvl = 0
        while True:
            active = t_state.where(F.col("d") > 1)
            if active.isEmpty():
                break
            # predecessors of cur at depth d-1
            preds = (
                active.join(e.withColumnRenamed("dst", "cur").withColumnRenamed("src", "p"), "cur")
                .join(
                    dist.select(
                        "pair", F.col("id").alias("p"), F.col("dist").alias("dp"),
                        F.col("sigma").alias("sp"),
                    ),
                    ["pair", "p"],
                )
                .where(F.col("dp") == F.col("d") - 1)
            )
            w = Window.partitionBy("pair", "cur").orderBy("p")
            tot = Window.partitionBy("pair", "cur")
            u = (
                F.pmod(
                    F.xxhash64("pair", "cur", F.lit(seed + 13), F.lit(batch), F.lit(lvl)),
                    F.lit(1_000_000_007),
                )
                / 1_000_000_007.0
            )
            chosen = (
                preds.select(
                    "pair",
                    "cur",
                    "p",
                    (F.sum("sp").over(w) / F.sum("sp").over(tot)).alias("cum"),
                    u.alias("u"),
                    F.col("d"),
                )
                .where(F.col("cum") > F.col("u"))
                .groupBy("pair", "cur", "d")
                .agg(F.min_by("p", F.col("cum")).alias("p"))
            )
            walked = walked.unionByName(
                chosen.select("pair", F.col("p").alias("id"))
            )
            t_state = chosen.select(
                "pair", F.col("p").alias("cur"), (F.col("d") - 1).alias("d")
            ).localCheckpoint(eager=True)
            walked = walked.localCheckpoint(eager=True)
            lvl += 1
        inc = walked.groupBy("id").agg(F.count("*").cast("double").alias("inc"))
        counts = (
            counts.join(inc, "id", "left")
            .select(
                "id", (F.col("cnt") + F.coalesce("inc", F.lit(0.0))).alias("cnt")
            )
            .localCheckpoint(eager=True)
        )
        samples += batch_size
        # --- adaptive stop: empirical Bernstein, union bound over n ------
        stat = counts.select(
            (F.col("cnt") / samples).alias("b")
        ).agg(F.max(
            F.sqrt(2.0 * F.col("b") * (1.0 - F.col("b")) * log_term / samples)
            + 7.0 * log_term / (3.0 * max(samples - 1, 1))
        )).collect()[0][0]
        if stat is not None and stat < epsilon:
            break
        if samples >= omega:
            break
    e.unpersist()
    nodes.unpersist()
    return counts.select("id", (F.col("cnt") / samples).alias("score"))


def sample_path_internals(
    graph: Graph, n_pairs: int = 256, seed: int = 42
) -> tuple:
    """((pair, id) DataFrame of internal vertices of one uniform shortest
    path per sampled (s,t) pair, #pairs sampled) — the Kadabra sampling
    core exposed for group-coverage estimators."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    nodes = graph.nodes().persist()
    n = nodes.count()
    h1 = F.pmod(F.xxhash64("pair", F.lit(seed)), F.lit(n))
    h2 = F.pmod(F.xxhash64("pair", F.lit(seed + 7)), F.lit(n - 1))
    idx = spark.range(n_pairs).select(F.col("id").alias("pair"))
    ranked = _dense_index(nodes)
    pairs = (
        idx.select("pair", h1.alias("rs"), h2.alias("rt"))
        .withColumn(
            "rt",
            F.when(F.col("rt") >= F.col("rs"), F.col("rt") + 1).otherwise(F.col("rt")),
        )
        .join(ranked.withColumnRenamed("rk", "rs").withColumnRenamed("id", "s"), "rs")
        .join(ranked.withColumnRenamed("rk", "rt").withColumnRenamed("id", "t"), "rt")
        .select("pair", "s", "t")
        .localCheckpoint(eager=True)
    )
    dist = pairs.select(
        "pair", F.col("s").alias("id"), F.lit(0).alias("dist"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    frontier = dist
    levels = 0
    while True:
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("pair", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            cand.join(dist.select("pair", "id"), ["pair", "id"], "left_anti")
            .select("pair", "id", F.lit(levels + 1).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
        levels += 1
    t_state = (
        pairs.join(
            dist.select("pair", F.col("id").alias("t"), F.col("dist").alias("dt")),
            ["pair", "t"],
        )
        .select("pair", F.col("t").alias("cur"), F.col("dt").alias("d"))
        .localCheckpoint(eager=True)
    )
    walked = spark.createDataFrame([], "pair bigint, id bigint")
    lvl = 0
    while True:
        active = t_state.where(F.col("d") > 1)
        if active.isEmpty():
            break
        preds = (
            active.join(
                e.withColumnRenamed("dst", "cur").withColumnRenamed("src", "p"), "cur"
            )
            .join(
                dist.select(
                    "pair", F.col("id").alias("p"), F.col("dist").alias("dp"),
                    F.col("sigma").alias("sp"),
                ),
                ["pair", "p"],
            )
            .where(F.col("dp") == F.col("d") - 1)
        )
        w = Window.partitionBy("pair", "cur").orderBy("p")
        tot = Window.partitionBy("pair", "cur")
        u = (
            F.pmod(
                F.xxhash64("pair", "cur", F.lit(seed + 13), F.lit(lvl)),
                F.lit(1_000_000_007),
            )
            / 1_000_000_007.0
        )
        chosen = (
            preds.select(
                "pair", "cur", "p",
                (F.sum("sp").over(w) / F.sum("sp").over(tot)).alias("cum"),
                u.alias("u"), F.col("d"),
            )
            .where(F.col("cum") > F.col("u"))
            .groupBy("pair", "cur", "d")
            .agg(F.min_by("p", F.col("cum")).alias("p"))
        )
        walked = walked.unionByName(chosen.select("pair", F.col("p").alias("id")))
        t_state = chosen.select(
            "pair", F.col("p").alias("cur"), (F.col("d") - 1).alias("d")
        ).localCheckpoint(eager=True)
        walked = walked.localCheckpoint(eager=True)
        lvl += 1
    e.unpersist()
    nodes.unpersist()
    return walked, n_pairs


def approx_group_betweenness(
    graph: Graph, k: int = 3, n_pairs: int = 512, seed: int = 42
) -> list:
    """[ids] — approximate GROUP betweenness maximization (centrality/
    ApproxGroupBetweenness.cpp contract): group betweenness of S is the
    probability a random shortest path meets S, so the (1−1/e) greedy
    max-coverage over a sampled-path universe solves it within sampling
    error. One uniform-shortest-path sample per random pair (the Kadabra
    sampler); each greedy round is ONE aggregate over the remaining
    (path, vertex) incidence rows — k rounds total."""
    inc, _n = sample_path_internals(graph, n_pairs=n_pairs, seed=seed)
    inc = inc.localCheckpoint(eager=True)
    picked: list = []
    for _ in range(k):
        best = (
            inc.groupBy("id")
            .agg(F.count_distinct("pair").alias("cov"))
            .orderBy(F.desc("cov"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cov"] == 0:
            break
        v = int(best[0]["id"])
        picked.append(v)
        covered = inc.where(F.col("id") == v).select("pair").distinct()
        inc = inc.join(covered, "pair", "left_anti").localCheckpoint(eager=True)
    return picked
