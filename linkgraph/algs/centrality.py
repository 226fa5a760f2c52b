"""Degree/eigenvector/Katz centrality, k-core decomposition, assortativity.

Reference parity:
- centrality/DegreeCentrality.cpp — one hash agg (optionally normalized).
- centrality/EigenvectorCentrality.cpp — power iteration on the adjacency,
  L2-normalized each superstep.
- centrality/KatzCentrality.cpp — iterate x' = α·Aᵀx + β until L2 tol.
- centrality/CoreDecomposition.cpp — peeling; expressed as the distributed
  iterative-peel: repeatedly delete vertices of degree < k, k ascending.
- correlation/Assortativity.cpp — Pearson correlation of endpoint degrees,
  one join + corr() agg.

Eigenvector/Katz reuse the PageRank superstep shape (ranks ⋈ edges →
groupBy(dst).sum) with a scalar normalization broadcast — same three
shuffles, same skew story (partial aggs + AQE; hub split not needed since
messages are not degree-normalized).
"""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import Superstep


def degree_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """(id, score): (weighted) degree; normalized divides by n-1."""
    deg = graph.degrees()
    col = F.col("weighted_degree") if graph.weighted else F.col("degree").cast("double")
    if normalized:
        n = graph.num_nodes()
        col = col / max(n - 1, 1)
    return deg.select("id", col.alias("score"))


def eigenvector_centrality(
    graph: Graph, tol: float = 1e-9, max_iter: int = 100, work_dir: str | None = None
) -> DataFrame:
    """(id, score), L2-normalized dominant eigenvector of the (symmetric)
    adjacency. Converges for connected non-bipartite graphs."""
    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_ev_")
    e = (graph.edges if graph.directed else graph.symmetric_edges()).persist()
    nodes = graph.nodes().persist()
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("score"))

    def init() -> DataFrame:
        return nodes.select(
            "id", F.lit(1.0 / math.sqrt(n)).alias("score"), F.lit(0.0).alias("delta")
        )

    def step(x: DataFrame, k: int) -> DataFrame:
        msgs = (
            e.join(x.select("id", "score").withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("weight")).alias("m"))
        )
        # materialize the expensive join/agg once: the norm is a scalar
        # action, and Superstep will materialize the returned frame — the
        # local checkpoint here keeps the plan from running twice
        raw = (
            nodes.join(msgs.withColumnRenamed("dst", "id"), "id", "left")
            .select("id", F.coalesce("m", F.lit(0.0)).alias("m"))
            .localCheckpoint(eager=True)
        )
        norm = raw.agg(F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("n")).collect()[0]["n"]
        norm = norm or 1.0
        return (
            raw.join(x.select("id", F.col("score").alias("old")), "id")
            .select(
                "id",
                (F.col("m") / F.lit(norm)).alias("score"),
                (F.col("m") / F.lit(norm) - F.col("old")).alias("delta"),
            )
        )

    res = Superstep(spark, work_dir, "eigenvector").run(
        init,
        step,
        tol=tol,
        max_iter=max_iter,
        metric_exprs=[F.sqrt(F.sum(F.col("delta") * F.col("delta"))).alias("r")],
    )
    e.unpersist()
    nodes.unpersist()
    return res.state.select("id", "score")


def katz_centrality(
    graph: Graph,
    alpha: float = 0.005,
    beta: float = 1.0,
    tol: float = 1e-9,
    max_iter: int = 100,
    work_dir: str | None = None,
    warm_start: DataFrame | None = None,
) -> DataFrame:
    """(id, score): x' = α·(messages along in-edges) + β, to L2 tol.

    ``warm_start`` (id, score) resumes iteration from a previous solution
    — the DynKatzCentrality addition path (centrality/DynKatzCentrality
    .cpp): after edge additions, restart from the stale scores and the
    fixed point is re-reached in a handful of supersteps instead of a
    cold run (the iteration map is a contraction for α < 1/λmax, so any
    start converges to the SAME fixed point — dyn equals recompute)."""
    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_katz_")
    e = (graph.edges if graph.directed else graph.symmetric_edges()).persist()
    nodes = graph.nodes().persist()

    def init() -> DataFrame:
        if warm_start is not None:
            return nodes.join(
                warm_start.select("id", "score"), "id", "left"
            ).select(
                "id",
                F.coalesce("score", F.lit(beta)).alias("score"),
                F.lit(0.0).alias("delta"),
            )
        return nodes.select("id", F.lit(beta).alias("score"), F.lit(0.0).alias("delta"))

    def step(x: DataFrame, k: int) -> DataFrame:
        msgs = (
            e.join(x.select("id", "score").withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("score") * F.col("weight")).alias("m"))
        )
        new_score = F.lit(alpha) * F.coalesce("m", F.lit(0.0)) + F.lit(beta)
        return (
            x.select("id", F.col("score").alias("old"))
            .join(msgs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                new_score.alias("score"),
                (new_score - F.col("old")).alias("delta"),
            )
        )

    res = Superstep(spark, work_dir, "katz").run(
        init,
        step,
        tol=tol,
        max_iter=max_iter,
        metric_exprs=[F.sqrt(F.sum(F.col("delta") * F.col("delta"))).alias("r")],
    )
    e.unpersist()
    nodes.unpersist()
    return res.state.select("id", "score")


def core_decomposition(graph: Graph, max_k: int | None = None) -> DataFrame:
    """(id, core): largest k such that the vertex survives k-core peeling.

    Distributed peel (CoreDecomposition.cpp's bucket queue re-expressed):
    for k = 1, 2, …: repeatedly drop vertices with degree < k in the
    remaining subgraph until stable; survivors have core ≥ k. Inner loop is
    a filter + semi-join fixpoint; edge set shrinks monotonically so later
    rounds get cheaper. O(max_core) outer rounds.
    """
    simple = graph.remove_self_loops()
    sym = simple.symmetric_edges().select("src", "dst").persist()
    nodes = simple.nodes()
    result = nodes.select("id", F.lit(0).alias("core"))
    k = 1
    while True:
        if max_k is not None and k > max_k:
            break
        # peel to the k-core of the current remaining graph
        while True:
            deg = sym.groupBy("src").agg(F.count("*").alias("d"))
            low = deg.where(F.col("d") < k).select(F.col("src").alias("id"))
            if low.isEmpty():
                break
            keep = deg.where(F.col("d") >= k).select(F.col("src").alias("id"))
            sym = (
                sym.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        survivors = sym.select(F.col("src").alias("id")).distinct()
        if survivors.isEmpty():
            break
        result = (
            result.join(survivors.withColumn("k", F.lit(k)), "id", "left")
            .select("id", F.coalesce("k", "core").alias("core"))
            .localCheckpoint(eager=True)
        )
        k += 1
    return result


def assortativity(graph: Graph) -> float:
    """Degree assortativity: Pearson corr of (deg(src), deg(dst)) over the
    symmetric edge list (correlation/Assortativity.cpp)."""
    deg = graph.degrees().select("id", "degree")
    e = (
        graph.symmetric_edges()
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    # explicit Pearson (sample) with a zero-variance guard: ANSI mode makes
    # corr() raise DIVIDE_BY_ZERO on regular graphs (all degrees equal)
    row = e.agg(
        F.covar_samp(F.col("ds").cast("double"), F.col("dd").cast("double")).alias("c"),
        F.stddev_samp(F.col("ds").cast("double")).alias("sa"),
        F.stddev_samp(F.col("dd").cast("double")).alias("sb"),
    ).collect()[0]
    if not row["c"] or not row["sa"] or not row["sb"]:
        return 0.0
    return float(row["c"] / (row["sa"] * row["sb"]))


def sfigality(graph: Graph) -> DataFrame:
    """(id, score) — fraction of a vertex's neighbors with STRICTLY higher
    degree (centrality/Sfigality.cpp): 1.0 = every neighbor dominates
    (the vertex is peripheral), 0.0 = a local hub."""
    simple = graph.remove_self_loops()
    nbr = (
        simple.symmetric_edges()
        .select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .distinct()
    )
    deg = simple.degrees().select("id", "degree")
    joined = (
        nbr.join(deg, "id")
        .join(
            deg.withColumnRenamed("id", "nbr").withColumnRenamed("degree", "ndeg"),
            "nbr",
        )
    )
    per = joined.groupBy("id").agg(
        (
            F.sum((F.col("ndeg") > F.col("degree")).cast("int"))
            / F.count("*")
        ).alias("score")
    )
    return (
        simple.nodes()
        .join(per, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def attribute_assortativity(graph: Graph, attrs) -> float:
    """Pearson correlation of a NUMERIC vertex attribute across edges
    (correlation/Assortativity.cpp's attribute mode). ``attrs`` is an
    (id, value) DataFrame; zero-variance guarded like degree
    assortativity."""
    a = attrs.select("id", F.col("value").cast("double").alias("value"))
    e = (
        graph.symmetric_edges()
        .join(a.withColumnRenamed("id", "src").withColumnRenamed("value", "va"), "src")
        .join(a.withColumnRenamed("id", "dst").withColumnRenamed("value", "vb"), "dst")
    )
    row = e.agg(
        F.covar_samp("va", "vb").alias("c"),
        F.stddev_samp("va").alias("sa"),
        F.stddev_samp("vb").alias("sb"),
    ).collect()[0]
    if not row["c"] or not row["sa"] or not row["sb"]:
        return 0.0
    return float(row["c"] / (row["sa"] * row["sb"]))


def laplacian_centrality(graph: Graph) -> DataFrame:
    """(id, score) — Laplacian centrality (centrality/Laplacian
    Centrality.cpp; Qi et al. 2012): the drop in graph Laplacian energy
    E = Σ w_deg² + 2Σ w_ij² when v is removed. Closed local form — no
    solver:

        LC(v) = w_deg(v)² + Σ_{u∈N(v)} (2·w_deg(u)·w_uv + w_uv²)

    One degree agg + one join + one agg; codegen arithmetic only."""
    simple = graph.remove_self_loops()
    sym = simple.symmetric_edges()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wdeg")
    )
    nbr = (
        sym.join(
            deg.withColumnRenamed("id", "dst").withColumnRenamed("wdeg", "wdeg_u"),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(
                2.0 * F.col("wdeg_u") * F.col("weight")
                + F.col("weight") * F.col("weight")
            ).alias("nsum")
        )
    )
    return (
        simple.nodes()
        .join(deg, "id", "left")
        .join(nbr, "id", "left")
        .select(
            "id",
            (
                F.coalesce("wdeg", F.lit(0.0)) * F.coalesce("wdeg", F.lit(0.0))
                + F.coalesce("nsum", F.lit(0.0))
            ).alias("score"),
        )
    )
