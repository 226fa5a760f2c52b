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
