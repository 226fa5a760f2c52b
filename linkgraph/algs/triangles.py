"""Per-vertex / per-edge triangle counting and clustering coefficients.

Reference parity: networkit/cpp/edgescores/TriangleEdgeScore.cpp (per-edge
counts via sorted neighbor intersection on degree-ordered adjacency) and
centrality/LocalClusteringCoefficient.cpp, global/ClusteringCoefficient.cpp.

Spark plan (degree-orientation, SURVEY §2A): orient every undirected edge
from its (degree, id)-smaller endpoint to the larger; then

    wedges  = O e1 ⋈ O e2  ON e1.dst = e2.src          (a→b, b→c)
    closed  = wedges ⋈ O e3 ON (e3.src, e3.dst) = (e1.src, e2.dst)

Each triangle {a,b,c} (a<b<c in orientation order) is found exactly once.
Orientation bounds any vertex's oriented out-degree by O(√m), so the wedge
join cannot explode on hub vertices — the same trick that makes NetworKit's
sorted-intersection linear-ish, expressed as join authoring instead of data
structure choice. Pure SQL-expressible ⇒ exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def triangle_corners(graph: Graph) -> DataFrame:
    """(a, b, c) rows, one per triangle, a→b→c in degree orientation."""
    o = graph.orient_by_degree().persist()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def per_vertex_triangles(graph: Graph) -> DataFrame:
    """(id, triangles) — every vertex of every triangle gets +1; vertices in
    no triangle appear with 0 (left join against the node set)."""
    tri = triangle_corners(graph)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.nodes()
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def per_edge_triangles(graph: Graph) -> DataFrame:
    """(src, dst, triangles) per canonical (src<dst) edge — TriangleEdgeScore.
    Each triangle increments all three of its edges."""
    tri = triangle_corners(graph)
    pairs = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .select(F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst"))
    )
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("triangles"))
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return (
        canon.join(counts, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def local_clustering_coefficient(graph: Graph) -> DataFrame:
    """(id, lcc) = 2·tri(v) / (deg(v)·(deg(v)−1)) on the simple graph
    (self-loops excluded) — LocalClusteringCoefficient.cpp semantics."""
    simple = graph.remove_self_loops()
    tri = per_vertex_triangles(simple)
    deg = simple.degrees().select("id", "degree")
    return tri.join(deg, "id").select(
        "id",
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


def global_clustering_coefficient(graph: Graph) -> float:
    """3·triangles / wedges (ClusteringCoefficient::exactGlobal)."""
    simple = graph.remove_self_loops()
    tri_total = triangle_corners(simple).count()
    deg = simple.degrees()
    wedges = deg.agg(
        F.sum(F.col("degree") * (F.col("degree") - 1) / 2.0).alias("w")
    ).collect()[0]["w"]
    return 3.0 * tri_total / wedges if wedges else 0.0


def avg_local_clustering_coefficient(graph: Graph) -> float:
    row = local_clustering_coefficient(graph).agg(F.avg("lcc").alias("a")).collect()[0]
    return float(row["a"] or 0.0)


def approx_global_clustering_coefficient(
    graph: Graph, trials: int = 10_000, seed: int = 42
) -> float:
    """Wedge-sampling estimate of the global clustering coefficient
    (ClusteringCoefficient::approxGlobal, Schank/Wagner): sample wedges
    with probability ∝ deg·(deg−1)/2 per center, check closure, return the
    closed fraction. Distributed: per-vertex trial counts are computed
    from a deterministic multinomial-ish hash allocation, sampled wedge
    endpoints picked by seeded hash ranks — no driver-side loop, no RNG
    state; exact expectation, deterministic across partitioning."""
    simple = graph.remove_self_loops()
    nbr = (
        simple.symmetric_edges()
        .select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .distinct()
    )
    deg = nbr.groupBy("id").agg(F.count("*").alias("d")).where(F.col("d") >= 2)
    tot = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")).collect()[0]["w"]
    if not tot:
        return 0.0
    # trials per center ∝ its wedge count (deterministic rounding)
    alloc = deg.select(
        "id",
        F.greatest(
            F.round(F.lit(float(trials)) * (F.col("d") * (F.col("d") - 1) / 2.0) / F.lit(float(tot))),
            F.lit(1.0),
        ).cast("int").alias("t"),
        "d",
    )
    trials_df = alloc.select("id", "d", F.explode(F.sequence(F.lit(1), F.col("t"))).alias("trial"))
    # pick two distinct neighbor ranks per (id, trial) via seeded hashes
    r1 = F.pmod(F.xxhash64("id", "trial", F.lit(seed)), F.col("d")) + 1
    r2_raw = F.pmod(F.xxhash64("id", "trial", F.lit(seed + 1)), F.col("d") - 1) + 1
    picks = trials_df.select(
        "id", "trial", r1.alias("r1"),
        F.when(r2_raw >= r1, r2_raw + 1).otherwise(r2_raw).alias("r2"),
    )
    from pyspark.sql import Window

    ranked = nbr.withColumn(
        "rk", F.row_number().over(Window.partitionBy("id").orderBy("nbr"))
    )
    w1 = picks.join(
        ranked.withColumnRenamed("rk", "r1").withColumnRenamed("nbr", "a"), ["id", "r1"]
    )
    w2 = w1.join(
        ranked.withColumnRenamed("rk", "r2").withColumnRenamed("nbr", "b"), ["id", "r2"]
    )
    closed = w2.join(
        nbr.withColumnRenamed("id", "a").withColumnRenamed("nbr", "b"),
        ["a", "b"],
        "left_semi",
    )
    n_w = w2.count()
    return closed.count() / n_w if n_w else 0.0


def local_square_clustering(graph: Graph, max_center_degree: int | None = None) -> DataFrame:
    """(id, c4) — Lind–González–Herrmann square (4-cycle) clustering
    (centrality/LocalSquareClusteringCoefficient.cpp; same formula as
    networkx.square_clustering): for each wedge u–v–w (u < w) through v,

        q   = |N(u) ∩ N(w) ∖ {v}|            (squares closed over the wedge)
        degm = q + 1 + [u ~ w]
        C4(v) = Σ q  /  Σ [ (d_u − degm) + (d_w − degm) + q ]

    with 0 when the denominator is empty — vertices with < 2 neighbors
    score 0.

    Plan shape: ONE 2-path self-join through the center builds BOTH the
    wedge table and the common-neighbor-count table (same join keyed two
    ways), then wedges ⋈ CN ⋈ adjacency flag ⋈ degrees → per-v agg. All
    hash joins + partial-combine aggs. The 2-path fan-out is Σ d(x)² —
    the same bill every 4-cycle counter pays; ``max_center_degree``
    applies the heavy-hitter discipline (drop wedges through hubs above
    the cap, as in cocitation's max_pivot_degree) when exactness on hub
    squares is not worth the shuffle at corpus scale."""
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    center = sym.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    if max_center_degree is not None:
        small = deg.where(F.col("d") <= max_center_degree).select(
            F.col("id").alias("x")
        )
        center = center.join(F.broadcast(small), "x", "left_semi")
    two_path = (
        center.select("x", F.col("y").alias("u"))
        .join(center.select("x", F.col("y").alias("w")), "x")
        .where(F.col("u") < F.col("w"))
    )
    # same join, two readings: keyed by endpoints = common-neighbor counts;
    # keyed by center = the wedge list
    cn = two_path.groupBy("u", "w").agg(F.count("*").alias("cn"))
    wedges = two_path.select(F.col("x").alias("v"), "u", "w")
    half = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("w"), F.lit(1).alias("adj")
    )
    per_wedge = (
        wedges.join(cn, ["u", "w"])
        .join(half, ["u", "w"], "left")
        .join(deg.withColumnRenamed("id", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("id", "w").withColumnRenamed("d", "dw"), "w")
        .select(
            "v",
            (F.col("cn") - 1).alias("q"),
            (F.col("cn") + F.coalesce("adj", F.lit(0))).alias("degm"),
            "du",
            "dw",
        )
    )
    agg = per_wedge.groupBy("v").agg(
        F.sum("q").alias("sq"),
        F.sum(
            (F.col("du") - F.col("degm"))
            + (F.col("dw") - F.col("degm"))
            + F.col("q")
        ).alias("pot"),
    )
    out = (
        graph.nodes()
        .join(agg.withColumnRenamed("v", "id"), "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("pot", F.lit(0)) > 0,
                F.col("sq").cast("double") / F.col("pot").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("c4"),
        )
    )
    sym.unpersist()
    return out
