"""PivotMDS graph layout (viz/ module parity).

Reference parity: viz/PivotMDS.cpp (Brandes & Pich 2006, "Eigensolver
methods for progressive multidimensional scaling of large data"). The
reference solves it in-memory; the algorithm is nonetheless a natural
distributed fit — SURVEY §2A listed viz as P3 mainly on MaxentStress
(an iterative stress solver, still out of scope). PivotMDS is:

1. pick k pivots (deterministic hash sample — the reference samples
   randomly; hash keeps N-vs-4N identity);
2. D ∈ R^{k×n}: hop distances pivot→vertex, ONE multi-source BFS
   (``bfs.multi_source_bfs`` — the source id rides as a column, so k
   pivots cost one superstep loop, not k);
3. double-center the squared distances:
   C = −½ (D² − rowmean − colmean + grandmean);
4. positions = top-``dims`` right singular vectors of C scaled by their
   singular values, via power iteration on CᵀC with Gram–Schmidt
   deflation. Each iterate is two join+agg matvecs: w = C v collapses to
   k rows (broadcast-sized), u = Cᵀ w fans back to n rows — state is
   O(n·dims), per-iteration shuffles are keyed on vertex id, the same
   superstep shape as PageRank.

Disconnected inputs: unreached (pivot, vertex) pairs take the global
max finite distance + 1 (standard MDS practice; the reference assumes
connected input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.algs.bfs import multi_source_bfs
from linkgraph.graph import Graph


def pivot_mds(
    graph: Graph,
    k: int = 16,
    dims: int = 2,
    iters: int = 60,
    seed: int = 42,
) -> DataFrame:
    """(id, x0 .. x{dims-1}) — PivotMDS coordinates. Deterministic for a
    fixed seed and invariant across parallelism (hash pivot choice, hash
    power-iteration init, scalar-agg normalizations only)."""
    spark = graph.edges.sparkSession
    nodes = graph.nodes().persist()
    n = nodes.count()
    k = min(k, n)
    pivots = [
        r["id"]
        for r in nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(k)
        .collect()
    ]
    # distances: one multi-source BFS; missing pairs = unreachable
    dist = multi_source_bfs(graph, pivots).persist()
    dmax = dist.agg(F.max("dist")).collect()[0][0] or 0
    fill = float(dmax + 1)
    piv_df = spark.createDataFrame([(p,) for p in pivots], "source bigint")
    full = (
        nodes.crossJoin(piv_df)
        .join(dist, ["source", "id"], "left")
        .select(
            "source",
            "id",
            F.coalesce(F.col("dist").cast("double"), F.lit(fill)).alias("d"),
        )
    )
    d2 = full.select("source", "id", (F.col("d") * F.col("d")).alias("d2"))
    row_m = d2.groupBy("source").agg(F.avg("d2").alias("rm"))
    col_m = d2.groupBy("id").agg(F.avg("d2").alias("cm"))
    g_m = float(d2.agg(F.avg("d2")).collect()[0][0] or 0.0)
    c = (
        d2.join(row_m, "source")
        .join(col_m, "id")
        .select(
            "source",
            "id",
            (-0.5 * (F.col("d2") - F.col("rm") - F.col("cm") + F.lit(g_m))).alias(
                "c"
            ),
        )
        .persist()
    )
    c.count()
    dist.unpersist()

    def matvec_ctc(v: DataFrame) -> DataFrame:
        """u = Cᵀ(C v): first collapse to k pivot rows, then fan back."""
        w = (
            c.join(v.select(F.col("id"), F.col("val")), "id")
            .groupBy("source")
            .agg(F.sum(F.col("c") * F.col("val")).alias("w"))
        )
        return (
            c.join(F.broadcast(w), "source")
            .groupBy("id")
            .agg(F.sum(F.col("c") * F.col("w")).alias("val"))
        )

    def dot(a: DataFrame, b: DataFrame) -> float:
        row = (
            a.select("id", F.col("val").alias("_a"))
            .join(b.select("id", F.col("val").alias("_b")), "id")
            .agg(F.sum(F.col("_a") * F.col("_b")))
            .collect()[0][0]
        )
        return float(row or 0.0)

    comps: list[DataFrame] = []
    for d in range(dims):
        # hash init, deflated against previous components each iteration
        v = nodes.select(
            "id",
            (
                (F.pmod(F.xxhash64("id", F.lit(seed + 1 + d)), F.lit(10_000)) / 5_000.0)
                - 1.0
            ).alias("val"),
        ).localCheckpoint(eager=True)
        for _ in range(iters):
            u = matvec_ctc(v)
            for prev in comps:
                proj = dot(u, prev)
                u = u.join(
                    prev.select("id", F.col("val").alias("_p")), "id"
                ).select(
                    "id", (F.col("val") - F.lit(proj) * F.col("_p")).alias("val")
                )
            norm = dot(u, u) ** 0.5
            if norm == 0.0:
                break
            v = u.select("id", (F.col("val") / F.lit(norm)).alias("val")).localCheckpoint(
                eager=True
            )
        comps.append(v)

    out = nodes.select("id")
    for d, v in enumerate(comps):
        # coordinate = σ_d · v_d with σ = ‖C v‖ (right singular pair of C)
        w = (
            c.join(v, "id")
            .groupBy("source")
            .agg(F.sum(F.col("c") * F.col("val")).alias("w"))
        )
        sigma = float(
            (w.agg(F.sum(F.col("w") * F.col("w"))).collect()[0][0] or 0.0)
        ) ** 0.5
        out = out.join(
            v.select("id", (F.lit(sigma) * F.col("val")).alias(f"x{d}")), "id"
        )
    c.unpersist()
    nodes.unpersist()
    return out
