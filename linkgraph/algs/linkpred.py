"""Link-prediction indices — neighborhood-overlap pair scores.

Reference parity: networkit/cpp/linkprediction/{CommonNeighborsIndex,
JaccardIndex, AdamicAdarIndex, ResourceAllocationIndex,
PreferentialAttachmentIndex, TotalNeighborsIndex}.cpp — the reference
scores one (u,v) pair at a time via neighbor-set intersection; here every
pair with ≥1 common neighbor is scored in ONE wedge join (the same plan
family as triangles, SURVEY §2A):

    sym e1 ⋈ sym e2 ON e1.dst = e2.dst AND e1.src < e2.src
    → groupBy(u, v) → per-index aggregate

Hub skew: the wedge join fans out on high-degree common neighbors; for
top-k use-cases pre-filter w by degree (parameter ``max_wedge_degree``) —
the standard "drop super-hubs from wedge generation" trick (a w with
degree d creates d² pairs; at web scale a 10^6-degree hub alone would
produce 10^12 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _sym(graph: Graph, max_wedge_degree: int | None) -> DataFrame:
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).select("src", "dst")
    if max_wedge_degree is not None:
        deg = graph.degrees().select(F.col("id").alias("dst"), "degree")
        sym = (
            sym.join(deg, "dst")
            .where(F.col("degree") <= max_wedge_degree)
            .select("src", "dst")
        )
    return sym


def _pairs(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, w) wedges: w is a common neighbor of u < v."""
    sym = _sym(graph, max_wedge_degree)
    e1 = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    e2 = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return e1.join(e2, "w").where(F.col("u") < F.col("v"))


def common_neighbors(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — |Γ(u) ∩ Γ(v)| for all pairs with ≥1 common neighbor."""
    return (
        _pairs(graph, max_wedge_degree)
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("score"))
    )


def adamic_adar(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — Σ_w 1/ln(deg(w)); w with deg=1 cannot be a common
    neighbor of two distinct nodes, so ln(deg) > 0 always."""
    deg = graph.degrees().select(F.col("id").alias("w"), "degree")
    return (
        _pairs(graph, max_wedge_degree)
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("degree").cast("double"))).alias("score"))
    )


def resource_allocation(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — Σ_w 1/deg(w)."""
    deg = graph.degrees().select(F.col("id").alias("w"), "degree")
    return (
        _pairs(graph, max_wedge_degree)
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.col("degree").cast("double")).alias("score"))
    )


def jaccard_index(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|; union size via the
    inclusion-exclusion join with per-endpoint degrees."""
    cn = common_neighbors(graph, max_wedge_degree).withColumnRenamed("score", "cn")
    deg = graph.degrees().select("id", "degree")
    return (
        cn.join(deg.withColumnRenamed("id", "u").withColumnRenamed("degree", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("degree", "dv"), "v")
        .select(
            "u",
            "v",
            (F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn"))).alias("score"),
        )
    )


def preferential_attachment(graph: Graph) -> DataFrame:
    """(u, v, score) = deg(u)·deg(v) for pairs with ≥1 common neighbor.

    (The reference scores arbitrary pairs on demand; materializing all
    n² pairs is nonsensical distributed — callers score candidate pairs,
    and the common-neighbor support set is the standard candidate set.)
    """
    cn = common_neighbors(graph).select("u", "v")
    deg = graph.degrees().select("id", "degree")
    return (
        cn.join(deg.withColumnRenamed("id", "u").withColumnRenamed("degree", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("degree", "dv"), "v")
        .select("u", "v", (F.col("du") * F.col("dv")).cast("double").alias("score"))
    )


def _auc_ranked(scores: DataFrame, positives: DataFrame) -> DataFrame:
    """(p, neg, neg_below) per distinct score — the distributed Mann-
    Whitney histogram. Exposed separately so tests can assert the plan
    shape (no single-partition Exchange feeding the window)."""
    from pyspark.sql import Window

    labeled = scores.join(
        positives.select("u", "v").withColumn("pos", F.lit(1)), ["u", "v"], "left"
    ).select("score", F.coalesce("pos", F.lit(0)).alias("pos"))
    hist = labeled.groupBy("score").agg(
        F.sum("pos").alias("p"),
        (F.count("*") - F.sum("pos")).alias("neg"),
    )
    spark = scores.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hist = (
        hist.repartitionByRange(n_parts, "score")
        .sortWithinPartitions("score")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pids across the two uses below
    )
    # per-partition negative totals → prefix offsets (one row per partition)
    part_tot = hist.groupBy("pid").agg(F.sum("neg").alias("tn")).collect()
    offsets, acc = {}, 0
    for r in sorted(part_tot, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["tn"]
    off_df = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()] or [(0, 0)], "pid int, off bigint"
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        hist.withColumn("neg_before_local", F.coalesce(F.sum("neg").over(w), F.lit(0)))
        .join(F.broadcast(off_df), "pid")
        .select(
            "p",
            "neg",
            (F.col("off") + F.col("neg_before_local")).alias("neg_below"),
        )
    )
    return ranked


def roc_auc(scores: DataFrame, positives: DataFrame) -> float:
    """AUC of a (u, v, score) prediction table against a (u, v) positive
    set (ROCMetric.cpp's summary statistic), Mann-Whitney form:

        AUC = [ Σ_s p_s · N_{<s}  +  ½ Σ_s p_s · n_s ] / (P · N)

    over the per-score histogram (p_s positives, n_s negatives at score
    s; N_{<s} = negatives strictly below s). Scale shape: the billions of
    scored pairs reduce to ONE hash aggregation on score; the prefix sum
    N_{<s} runs on the (distinct-score-sized) histogram via range
    repartitioning + per-partition running sums + a driver-side offset
    table of one row per partition — no single-partition global window
    anywhere in the plan (plan-asserted in tests)."""
    ranked = _auc_ranked(scores, positives)
    row = ranked.agg(
        F.sum(F.col("p") * F.col("neg_below")).alias("wins"),
        F.sum(F.col("p") * F.col("neg")).alias("ties"),
        F.sum("p").alias("pp"),
        F.sum("neg").alias("nn"),
    ).collect()[0]
    p, neg = float(row["pp"] or 0), float(row["nn"] or 0)
    if p == 0 or neg == 0:
        return 0.5
    return (float(row["wins"]) + 0.5 * float(row["ties"])) / (p * neg)


def precision_at_k(scores: DataFrame, positives: DataFrame, k: int) -> float:
    """Fraction of the top-k predictions that are true links
    (PrecisionRecallMetric's precision point at k)."""
    top = (
        scores.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))
        .limit(k)
        .join(positives.select("u", "v"), ["u", "v"], "left_semi")
    )
    return top.count() / k if k else 0.0


def random_link_sample(graph: Graph, fraction: float, seed: int = 42) -> tuple:
    """Deterministic hash-split of the canonical edge set into (train,
    test) — RandomLinkSampler; stable across partitioning."""
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
    )
    # pmod, not abs: abs(Long.MIN_VALUE) overflows under ANSI mode
    coin = (
        F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007))
    ) / 1_000_000_007.0
    test = canon.where(coin < fraction)
    train = canon.where(coin >= fraction)
    return train, test


def total_neighbors(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — |Γ(u) ∪ Γ(v)| (TotalNeighborsIndex.cpp) on the
    common-neighbor candidate set."""
    cn = common_neighbors(graph, max_wedge_degree).withColumnRenamed("score", "cn")
    deg = graph.degrees().select("id", "degree")
    return (
        cn.join(deg.withColumnRenamed("id", "u").withColumnRenamed("degree", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("degree", "dv"), "v")
        .select("u", "v", (F.col("du") + F.col("dv") - F.col("cn")).alias("score"))
    )


def neighborhood_distance(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — cosine overlap |Γ(u)∩Γ(v)| / sqrt(deg(u)·deg(v))
    (NeighborhoodDistanceIndex.cpp's similarity form)."""
    cn = common_neighbors(graph, max_wedge_degree).withColumnRenamed("score", "cn")
    deg = graph.degrees().select("id", "degree")
    return (
        cn.join(deg.withColumnRenamed("id", "u").withColumnRenamed("degree", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("degree", "dv"), "v")
        .select(
            "u", "v",
            (F.col("cn") / F.sqrt(F.col("du") * F.col("dv"))).alias("score"),
        )
    )


def same_community(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """(u, v, score ∈ {0,1}) — SameCommunityIndex.cpp over any candidate
    pair table and a (id, label) partition."""
    return (
        pairs.select("u", "v")
        .join(labels.withColumnRenamed("id", "u").withColumnRenamed("label", "lu"), "u")
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "lv"), "v")
        .select(
            "u", "v",
            (F.col("lu") == F.col("lv")).cast("double").alias("score"),
        )
    )


def u_degree_index(graph: Graph) -> DataFrame:
    """(u, v, score = deg(u)) on the common-neighbor candidate set
    (UDegreeIndex.cpp; VDegreeIndex is the symmetric column)."""
    cn = common_neighbors(graph).select("u", "v")
    deg = graph.degrees().select("id", "degree")
    return cn.join(
        deg.withColumnRenamed("id", "u"), "u"
    ).select("u", "v", F.col("degree").cast("double").alias("score"))


def v_degree_index(graph: Graph) -> DataFrame:
    """(u, v, score = deg(v)) — VDegreeIndex.cpp."""
    cn = common_neighbors(graph).select("u", "v")
    deg = graph.degrees().select("id", "degree")
    return cn.join(
        deg.withColumnRenamed("id", "v"), "v"
    ).select("u", "v", F.col("degree").cast("double").alias("score"))


def katz_index(graph: Graph, beta: float = 0.005, max_length: int = 3) -> DataFrame:
    """(u, v, score) — truncated Katz index Σ_{l=1..L} β^l · paths_l(u,v)
    (KatzIndex.cpp). Path counts are exact integers (doubles to 2^53).

    Scale note: materializes ALL pairs within L hops — the L-step
    path-count closure densifies, so this exact form is a fixture/
    candidate-set tool (the reference's on-demand per-pair evaluation has
    the same total cost when asked for all pairs); at web scale pre-filter
    candidates and keep L ≤ 2."""
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    paths = sym.select("src", "dst", F.lit(1.0).alias("cnt"))
    score = paths.select("src", "dst", (F.lit(beta) * F.col("cnt")).alias("score"))
    acc = score
    for length in range(2, max_length + 1):
        paths = (
            paths.join(
                sym.select(F.col("src").alias("dst"), F.col("dst").alias("nxt")),
                "dst",
            )
            .groupBy("src", F.col("nxt").alias("dst"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        acc = acc.unionByName(
            paths.select(
                "src", "dst", (F.lit(beta ** length) * F.col("cnt")).alias("score")
            )
        )
    return (
        acc.where(F.col("src") < F.col("dst"))
        .groupBy(F.col("src").alias("u"), F.col("dst").alias("v"))
        .agg(F.sum("score").alias("score"))
    )


def adjusted_rand_index(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — Adjusted Rand Index of the two neighborhood
    indicator partitions over the n vertices (REF⚠
    linkprediction/AdjustedRandIndex.cpp [TBV] — reference repo empty;
    the public ARI-for-two-binary-partitions closed form): with
    i = |Γ(u)∩Γ(v)|, a = deg(u)−i, b = deg(v)−i, d = n−(i+a+b),
    score = 2(i·d − a·b) / ((i+a)(a+d) + (i+b)(b+d)), 0 when the
    denominator vanishes. Candidate set: common-neighbor pairs (u < v).

    Plan: the common-neighbors wedge agg + two broadcast-sized degree
    joins + pure expressions — no extra shuffles over common_neighbors."""
    n = graph.num_nodes()
    cn = common_neighbors(graph, max_wedge_degree).withColumnRenamed("score", "i")
    deg = graph.degrees().select("id", "degree")
    j = (
        cn.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("dv")), "v")
    )
    i = F.col("i")
    a = F.col("du") - i
    b = F.col("dv") - i
    d = F.lit(float(n)) - (i + a + b)
    num = 2.0 * (i * d - a * b)
    den = (i + a) * (a + d) + (i + b) * (b + d)
    return j.select(
        "u", "v", F.when(den != 0, num / den).otherwise(F.lit(0.0)).alias("score")
    )


def neighbors_measure(graph: Graph, max_wedge_degree: int | None = None) -> DataFrame:
    """(u, v, score) — Friends measure (Fire et al. 2011; REF⚠
    linkprediction/NeighborsMeasureIndex.cpp): the number of ordered
    pairs (x, y) ∈ Γ(u)×Γ(v) with x = y or x~y — i.e. common neighbors
    plus the count of u–x–y–v 3-paths. Candidate set: pairs with
    score > 0, canonical u < v (the measure is symmetric).

    Plan: the wedge agg (common neighbors) + one 3-path double join;
    ``max_wedge_degree`` caps BOTH intermediate endpoints, which bounds
    the 3-path fan-out to Σ min(deg,cap)² — the hub-skew discipline the
    other indices use."""
    cn = common_neighbors(graph, max_wedge_degree).withColumnRenamed("score", "cnt")
    e_ux = _sym(graph, max_wedge_degree).select(
        F.col("src").alias("u"), F.col("dst").alias("x")
    )
    e_xy = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("x"), F.col("dst").alias("y"))
    )
    e_yv = _sym(graph, max_wedge_degree).select(
        F.col("dst").alias("y"), F.col("src").alias("v")
    )
    p3 = (
        e_ux.join(e_xy, "x")
        .join(e_yv, "y")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("p3"))
    )
    return (
        cn.join(p3, ["u", "v"], "full_outer")
        .select(
            "u",
            "v",
            (F.coalesce("cnt", F.lit(0.0)) + F.coalesce("p3", F.lit(0.0))).alias(
                "score"
            ),
        )
    )


def algebraic_distance_index(
    graph: Graph,
    pairs: DataFrame | None = None,
    n_systems: int = 8,
    n_iters: int = 20,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(u, v, score) — ℓ2 algebraic distance between the JOR-smoothed
    coordinates of u and v (REF⚠ linkprediction/AlgebraicDistanceIndex.cpp:
    AlgebraicDistance preprocessing, then per-pair distance; SMALLER =
    more similar, unlike the other indices — the reference has the same
    inversion). ``pairs`` (u, v) defaults to the common-neighbor
    candidate set; coordinates come from
    :func:`linkgraph.algs.bfs.algebraic_coordinates` (one smoothing run
    for ALL scored pairs)."""
    from linkgraph.algs.bfs import algebraic_coordinates

    state, cols = algebraic_coordinates(graph, n_systems, n_iters, omega, seed)
    if pairs is None:
        pairs = common_neighbors(graph).select("u", "v")
    su = state.select(F.col("id").alias("u"), *[F.col(c).alias(f"u{c}") for c in cols])
    sv = state.select(F.col("id").alias("v"), *[F.col(c).alias(f"v{c}") for c in cols])
    diff2 = sum(
        ((F.col(f"u{c}") - F.col(f"v{c}")) * (F.col(f"u{c}") - F.col(f"v{c}")))
        for c in cols
    )
    return (
        pairs.select("u", "v")
        .join(su, "u")
        .join(sv, "v")
        .select("u", "v", F.sqrt(diff2).alias("score"))
    )


def link_thresholder(scores: DataFrame, threshold: float) -> DataFrame:
    """Predicted links with score ≥ threshold (LinkThresholder.cpp)."""
    return scores.where(F.col("score") >= threshold).select("u", "v", "score")


def sort_predictions(scores: DataFrame) -> DataFrame:
    """Canonical prediction ordering (PredictionsSorter.cpp): score desc,
    then (u, v) asc for a stable total order."""
    return scores.orderBy(F.desc("score"), F.asc("u"), F.asc("v"))


def kfold_cross_validation(
    graph: Graph,
    index_fn,
    k: int = 5,
    seed: int = 42,
) -> list[float]:
    """KFoldCrossValidator.cpp: hash-split the canonical edge set into k
    folds; for each fold, score the graph WITHOUT those edges using
    ``index_fn(train_graph)`` and report the AUC of recovering the held-out
    fold against non-edges. Returns one AUC per fold."""
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
    )
    fold_col = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(k))
    aucs = []
    for fold in range(k):
        train = canon.where(fold_col != fold)
        test = canon.where(fold_col == fold).select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        )
        tg = Graph.from_edges(train, directed=False, weighted=graph.weighted)
        scores = missing_links(tg, index_fn(tg))
        aucs.append(roc_auc(scores, test))
    return aucs


def missing_links(graph: Graph, scores: DataFrame) -> DataFrame:
    """Filter a (u,v,score) table to NON-edges (MissingLinksFinder.cpp) —
    an anti-join against the canonical undirected edge set."""
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    return scores.join(canon, ["u", "v"], "left_anti")
