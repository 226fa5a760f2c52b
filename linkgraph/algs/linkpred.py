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


def roc_auc(scores: DataFrame, positives: DataFrame) -> float:
    """AUC of a (u, v, score) prediction table against a (u, v) positive
    set (ROCMetric.cpp's summary statistic): rank-sum / Mann-Whitney form
    via a cume_dist-free window — AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N).
    Ties get average ranks (rank + (count−1)/2)."""
    from pyspark.sql import Window

    labeled = scores.join(
        positives.select("u", "v").withColumn("pos", F.lit(1)), ["u", "v"], "left"
    ).select("score", F.coalesce("pos", F.lit(0)).alias("pos"))
    w = Window.orderBy("score")
    ranked = labeled.select(
        "pos",
        (
            F.rank().over(w)
            + (F.count("*").over(Window.partitionBy("score")) - 1) / 2.0
        ).alias("r"),
    )
    row = ranked.agg(
        F.sum(F.when(F.col("pos") == 1, F.col("r")).otherwise(0.0)).alias("rs"),
        F.sum("pos").alias("p"),
        F.count("*").alias("t"),
    ).collect()[0]
    p = float(row["p"] or 0)
    neg = float(row["t"]) - p
    if p == 0 or neg == 0:
        return 0.5
    return (float(row["rs"]) - p * (p + 1) / 2.0) / (p * neg)


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
    coin = (
        F.abs(F.xxhash64("src", "dst", F.lit(seed))) % F.lit(1_000_000_007)
    ) / 1_000_000_007.0
    test = canon.where(coin < fraction)
    train = canon.where(coin >= fraction)
    return train, test


def missing_links(graph: Graph, scores: DataFrame) -> DataFrame:
    """Filter a (u,v,score) table to NON-edges (MissingLinksFinder.cpp) —
    an anti-join against the canonical undirected edge set."""
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    return scores.join(canon, ["u", "v"], "left_anti")
