"""Edge-score toolkit — per-edge structural scores and transforms.

Reference parity: networkit/cpp/edgescores/{TriangleEdgeScore,
PrefixJaccardScore, SimmelianOverlapScore, GeometricMeanScore,
EdgeScoreNormalizer, EdgeScoreBlender, EdgeScoreAsWeight}.cpp.

All scores live on the canonical undirected edge list (src < dst) as
``(src, dst, score)`` DataFrames, so they compose: score → normalize →
blend → threshold-filter (sparsification) → as-weight. Every plan is the
wedge/neighbor-join family (partial-agg shuffles on vertex id + windows
partitioned by vertex) — no driver-side loops, no UDFs.

Pinned definitions (stated here because the reference's docs are terse):
- prefix_jaccard(k): per edge (u,v), Jaccard of the two endpoints' top-k
  neighbor prefixes, neighbors ranked by (degree desc, id asc);
- simmelian_overlap(max_rank): neighbors ranked per vertex by per-edge
  triangle count (desc, id asc); score = |top-r(u) ∩ top-r(v)|;
- geometric_mean: s(u,v) / sqrt(S(u)·S(v)), S(x) = Σ incident scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.algs.triangles import per_edge_triangles
from linkgraph.graph import Graph

triangle_edge_score = per_edge_triangles  # TriangleEdgeScore.cpp


def _neighbor_pairs(graph: Graph) -> DataFrame:
    """(id, nbr) over the simple symmetric graph."""
    return (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .distinct()
    )


def prefix_jaccard_score(graph: Graph, k: int = 5) -> DataFrame:
    """(src, dst, score) — Jaccard of degree-ranked top-k neighbor
    prefixes of the two endpoints."""
    nbrs = _neighbor_pairs(graph)
    deg = graph.degrees().select(F.col("id").alias("nbr"), "degree")
    ranked = nbrs.join(deg, "nbr").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.desc("degree"), F.asc("nbr"))
        ),
    )
    prefix = ranked.where(F.col("rn") <= k).select("id", "nbr")
    canon = (
        graph.symmetric_edges().where(F.col("src") < F.col("dst")).select("src", "dst")
    )
    inter = (
        canon.join(prefix.withColumnRenamed("id", "src"), "src")
        .join(
            prefix.withColumnRenamed("id", "dst").withColumnRenamed("nbr", "nbr2"),
            "dst",
        )
        .where(F.col("nbr") == F.col("nbr2"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("i"))
    )
    sizes = prefix.groupBy("id").agg(F.count("*").alias("sz"))
    return (
        canon.join(inter, ["src", "dst"], "left")
        .join(sizes.withColumnRenamed("id", "src").withColumnRenamed("sz", "su"), "src")
        .join(sizes.withColumnRenamed("id", "dst").withColumnRenamed("sz", "sv"), "dst")
        .select(
            "src",
            "dst",
            (
                F.coalesce("i", F.lit(0))
                / (F.col("su") + F.col("sv") - F.coalesce("i", F.lit(0)))
            ).alias("score"),
        )
    )


def simmelian_overlap_score(graph: Graph, max_rank: int = 10) -> DataFrame:
    """(src, dst, score) — overlap of the endpoints' strongest-tie
    prefixes, strength = per-edge triangle count (Simmelian backbones,
    Nick et al. 2013)."""
    tri = per_edge_triangles(graph)
    directed_tri = tri.select(
        F.col("src").alias("id"), F.col("dst").alias("nbr"), "triangles"
    ).unionByName(
        tri.select(F.col("dst").alias("id"), F.col("src").alias("nbr"), "triangles")
    )
    ranked = directed_tri.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.desc("triangles"), F.asc("nbr"))
        ),
    )
    prefix = ranked.where(F.col("rn") <= max_rank).select("id", "nbr")
    canon = tri.select("src", "dst")
    inter = (
        canon.join(prefix.withColumnRenamed("id", "src"), "src")
        .join(
            prefix.withColumnRenamed("id", "dst").withColumnRenamed("nbr", "nbr2"),
            "dst",
        )
        .where(F.col("nbr") == F.col("nbr2"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("i"))
    )
    return canon.join(inter, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("i", F.lit(0)).cast("double").alias("score")
    )


def geometric_mean_score(scores: DataFrame) -> DataFrame:
    """(src, dst, score) — normalize an edge score by the geometric mean
    of the endpoints' incident score sums."""
    incident = (
        scores.select(F.col("src").alias("id"), "score")
        .unionByName(scores.select(F.col("dst").alias("id"), "score"))
        .groupBy("id")
        .agg(F.sum("score").alias("s"))
    )
    return (
        scores.join(incident.withColumnRenamed("id", "src").withColumnRenamed("s", "su"), "src")
        .join(incident.withColumnRenamed("id", "dst").withColumnRenamed("s", "sv"), "dst")
        .select(
            "src",
            "dst",
            F.when(
                (F.col("su") > 0) & (F.col("sv") > 0),
                F.col("score") / F.sqrt(F.col("su") * F.col("sv")),
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )


def normalize_scores(scores: DataFrame, lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """EdgeScoreNormalizer: linear rescale of ``score`` onto [lo, hi]
    (degenerate all-equal input maps to ``lo``)."""
    row = scores.agg(F.min("score").alias("mn"), F.max("score").alias("mx")).collect()[0]
    mn, mx = float(row["mn"] or 0.0), float(row["mx"] or 0.0)
    if mx == mn:
        return scores.select("src", "dst", F.lit(lo).alias("score"))
    scale = (hi - lo) / (mx - mn)
    return scores.select(
        "src", "dst", (F.lit(lo) + (F.col("score") - mn) * scale).alias("score")
    )


def blend_scores(a: DataFrame, b: DataFrame, alpha: float = 0.5) -> DataFrame:
    """EdgeScoreBlender: α·a + (1−α)·b on the shared canonical edges
    (missing scores count as 0)."""
    return (
        a.withColumnRenamed("score", "sa")
        .join(b.withColumnRenamed("score", "sb"), ["src", "dst"], "full")
        .select(
            "src",
            "dst",
            (
                F.lit(alpha) * F.coalesce("sa", F.lit(0.0))
                + F.lit(1.0 - alpha) * F.coalesce("sb", F.lit(0.0))
            ).alias("score"),
        )
    )


def score_as_weight(graph: Graph, scores: DataFrame, offset: float = 0.0) -> Graph:
    """EdgeScoreAsWeight: replace edge weights with (score + offset) on
    the canonical edge list."""
    canon = graph.symmetric_edges().where(F.col("src") <= F.col("dst")).select("src", "dst")
    e = canon.join(scores, ["src", "dst"], "left").select(
        "src", "dst", (F.coalesce("score", F.lit(0.0)) + F.lit(offset)).alias("weight")
    )
    return Graph.from_edges(e, directed=False, weighted=True)


def linearize_scores(
    scores: DataFrame, score_col: str = "score", n_ranges: int = 64
) -> DataFrame:
    """edgescores/EdgeScoreLinearizer.cpp: replace each edge's score by
    its normalized global rank (rank−1)/(m−1) ∈ [0,1] — a
    distribution-free linearization.

    Scale shape: a single global-orderBy window would drag every edge
    into one partition (the classic rank scale-killer); instead the rows
    are range-partitioned on (score, src, dst), ranked per partition
    with a PARTITIONED window, and shifted by the per-partition counts
    (n_ranges scalars collected to the driver) — exact global ranks, no
    single-partition exchange."""
    from pyspark.sql import Window

    m = scores.count()
    denom = float(max(m - 1, 1))
    keyed = scores.repartitionByRange(
        n_ranges, F.asc(score_col), F.asc("src"), F.asc("dst")
    ).withColumn("_part", F.spark_partition_id())
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
    w = Window.partitionBy("_part").orderBy(
        F.asc(score_col), F.asc("src"), F.asc("dst")
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(off_df), "_part")
        .select(
            "src",
            "dst",
            ((F.col("_off") + F.col("_rk") - 1) / F.lit(denom)).alias("score"),
        )
    )
