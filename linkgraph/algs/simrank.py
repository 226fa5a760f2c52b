"""SimRank — structural-context similarity on the link graph.

Public-knowledge anchor: Jeh & Widom, "SimRank: A Measure of
Structural-Context Similarity" (KDD 2002). Two pages are similar if they
are pointed to by similar pages:

    s(a, a) = 1
    s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i, j)

with in-neighbor sets I(·), decay C ∈ (0, 1), and s(a, b) = 0 when
either in-neighborhood is empty. NetworKit has no SimRank; it is an
engine extra for the web-IR family next to co-citation/HITS/SALSA
(first-iteration SimRank IS normalized co-citation).

Spark shape — one join pipeline per iteration. The paper's double sum
over (i, j) ∈ I(a)×I(b) factors through a single "kernel" table

    kernel_k = {(n, n, 1)} ∪ sim_k ∪ swap(sim_k)

so each iteration is: in-edges ⋈ kernel_k ⋈ in-edges → hash-agg on the
(a, b) pair → normalize by the broadcast in-degree table. The diagonal
rows reproduce the common-in-neighbor count and the off-diagonal rows
the Σ s_k(i, j) term — no separate passes, no driver data. State is the
sparse pair table (u, v, s) with u < v; pairs never touched by the join
are exactly 0 and never materialize.

Scale discipline: the fan-out of a kernel row (i, j, s) is
outdeg(i)·outdeg(j) (how many pages each side points TO), so hub pages
are the shuffle bomb, same as the co-citation pivot. ``max_fanout``
drops kernel rows whose endpoint out-degree exceeds the cap (standard
top-page damping — a page linked from a 10⁶-out-degree hub gains only
noise similarity); ``prune_eps`` drops pairs below a floor between
iterations, the classic sparse-SimRank truncation (Lizorkin et al.,
VLDB 2008 accuracy analysis). Both default off so the fixture-scale
result is exact; at corpus scale set both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin

__all__ = ["simrank"]


def simrank(
    graph: Graph,
    c: float = 0.8,
    max_iter: int = 3,
    prune_eps: float | None = None,
    max_fanout: int | None = None,
) -> DataFrame:
    """(u, v, sim) with u < v for every pair with nonzero SimRank after
    ``max_iter`` iterations from s₀ = I (the diagonal s(a,a)=1 is
    implicit and not returned). Exact fixed-iteration semantics when
    ``prune_eps``/``max_fanout`` are None — the defaults — so a DuckDB
    replay of the same unrolled joins is bit-comparable."""
    spark = graph.edges.sparkSession
    # in-neighbor lists: edge src→dst makes src an in-neighbor of dst
    ie = graph.edges.select(
        F.col("dst").alias("node"), F.col("src").alias("nb")
    ).distinct()
    if max_fanout is not None:
        out_deg = ie.groupBy("nb").agg(F.count("*").alias("_od"))
        ie = (
            ie.join(out_deg, "nb")
            .where(F.col("_od") <= max_fanout)
            .drop("_od")
        )
    ie = ie.persist()
    indeg = ie.groupBy("node").agg(F.count("*").alias("d")).persist()
    # diagonal endpoints = every node that appears as an in-neighbor
    # (a node with only out-edges, e.g. a star hub, still anchors s(n,n)=1)
    nodes = ie.select(F.col("nb").alias("i")).distinct()

    a_side = ie.select(F.col("node").alias("u"), F.col("nb").alias("i"))
    b_side = ie.select(F.col("node").alias("v"), F.col("nb").alias("j"))
    diag = nodes.select("i", F.col("i").alias("j"), F.lit(1.0).alias("s"))

    pin = Pin(spark, "simrank")
    sim = None  # sparse (u, v, s), u < v; None = s0 is the identity
    try:
        for _ in range(max_iter):
            kernel = diag
            if sim is not None:
                sym = sim.select(
                    F.col("u").alias("i"), F.col("v").alias("j"), "s"
                ).unionAll(
                    sim.select(F.col("v").alias("i"), F.col("u").alias("j"), "s")
                )
                kernel = kernel.unionAll(sym)
            raw = (
                a_side.join(kernel, "i")
                .join(b_side, "j")
                .where(F.col("u") < F.col("v"))
                .groupBy("u", "v")
                .agg(F.sum("s").alias("_num"))
            )
            nxt = (
                raw.join(indeg.select(F.col("node").alias("u"), F.col("d").alias("_du")), "u")
                .join(indeg.select(F.col("node").alias("v"), F.col("d").alias("_dv")), "v")
                .select(
                    "u",
                    "v",
                    (F.lit(c) * F.col("_num") / (F.col("_du") * F.col("_dv"))).alias("s"),
                )
            )
            if prune_eps is not None:
                nxt = nxt.where(F.col("s") >= prune_eps)
            sim = pin(nxt, "sim")
        out = sim if sim is not None else spark.createDataFrame([], "u long, v long, s double")
        # materialize BEFORE the finally below removes the Pin state dirs
        # (the result must not depend on the loop's parquet snapshots)
        return out.select("u", "v", F.col("s").alias("sim")).localCheckpoint(
            eager=True
        )
    finally:
        ie.unpersist()
        indeg.unpersist()
        pin.close()
