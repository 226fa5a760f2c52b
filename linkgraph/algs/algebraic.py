"""GraphBLAS-flavored algebraic backend — sparse matrices as DataFrames.

Reference parity: NetworKit's ``algebraic/`` module (REF⚠
algebraic/CSRMatrix.cpp, algebraic/GraphBLAS.hpp,
algebraic/algorithms/AlgebraicPageRank.hpp, AlgebraicBellmanFord.hpp,
AlgebraicTriangleCounting.hpp) expresses graph algorithms as semiring
matrix products over a CSR matrix. Here a sparse matrix IS a DataFrame
``(row BIGINT, col BIGINT, val DOUBLE)`` — mat-vec is a join + hash-agg
(partial+final combine, the same plan shape as one PageRank superstep)
and masked mat-mat is a two-join wedge plan, so Catalyst/AQE pick the
physical strategy exactly as they do for the dedicated operators.

Semirings are (aggregate, combine) pairs over Columns:
``plus_times`` (standard linear algebra), ``min_plus`` (shortest paths),
``max_times``, ``or_and`` (boolean reachability). Missing entries are the
semiring zero by construction — a join simply produces no row — so the
DataFrame sparsity IS the algebraic sparsity and no zero is ever stored,
matching CSRMatrix semantics.

Scale notes: mat_vec shuffles only the O(n) vector state against a
hash-partitioned matrix (persist the matrix and reuse it across
iterations, as algebraic_pagerank/bellman_ford below do). Masked mat-mat
bounds its wedge fan-out only as well as its inputs do — for triangle
counting use the degree-oriented matrix (as algebraic_triangle_count
does), the same O(sqrt(m)) fan-out bound as algs.triangles. The
dedicated operators remain the tuned scale path; this module is the
alternative formulation NetworKit ships them as, useful for composing
new algorithms without writing a new superstep loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.graph import Graph


@dataclass(frozen=True)
class Semiring:
    """(⊕ aggregate, ⊗ combine) pair; the ⊕-identity is 'row absent'."""

    add: Callable[[Column], Column]
    mul: Callable[[Column, Column], Column]


PLUS_TIMES = Semiring(add=F.sum, mul=lambda a, b: a * b)
MIN_PLUS = Semiring(add=F.min, mul=lambda a, b: a + b)
MAX_TIMES = Semiring(add=F.max, mul=lambda a, b: a * b)
OR_AND = Semiring(
    add=F.max, mul=lambda a, b: ((a != 0) & (b != 0)).cast("double")
)

_SEMIRINGS = {
    "plus_times": PLUS_TIMES,
    "min_plus": MIN_PLUS,
    "max_times": MAX_TIMES,
    "or_and": OR_AND,
}


def _ring(semiring) -> Semiring:
    if isinstance(semiring, Semiring):
        return semiring
    return _SEMIRINGS[semiring]


def adjacency_matrix(graph: Graph) -> DataFrame:
    """A(u,v) = weight for every stored (directed) or expanded
    (undirected) edge — CSRMatrix::adjacencyMatrix parity."""
    e = graph.edges if graph.directed else graph.symmetric_edges()
    return e.select(
        F.col("src").alias("row"), F.col("dst").alias("col"),
        F.col("weight").alias("val"),
    )


def laplacian_matrix(graph: Graph) -> DataFrame:
    """L = D − A over the undirected view (CSRMatrix::laplacianMatrix).
    Diagonal = weighted degree; off-diagonal = −weight."""
    a = adjacency_matrix(graph if not graph.directed else graph.to_undirected())
    deg = a.groupBy("row").agg(F.sum("val").alias("val")).select(
        "row", F.col("row").alias("col"), "val"
    )
    off = a.select("row", "col", (-F.col("val")).alias("val"))
    # aggregate the union: a self-loop vertex otherwise emits TWO rows at
    # (i, i) (degree and −w), violating the one-entry-per-coordinate
    # matrix contract the module docstring promises
    return (
        deg.unionByName(off)
        .groupBy("row", "col")
        .agg(F.sum("val").alias("val"))
        .where(F.col("val") != 0.0)
    )


def transpose_matrix(mat: DataFrame) -> DataFrame:
    """Column swap — no shuffle (CSRMatrix::transpose)."""
    return mat.select(
        F.col("col").alias("row"), F.col("row").alias("col"), "val"
    )


def mat_vec(mat: DataFrame, vec: DataFrame, semiring="plus_times") -> DataFrame:
    """y = M ⊕.⊗ x: for each row i, y_i = ⊕_k M[i,k] ⊗ x[k].

    ``vec`` is ``(id, val)``; absent ids are the semiring zero. One join
    (vector state shuffled to the matrix partitioning when ``mat`` is
    hash-partitioned/persisted) + one partial+final hash-agg — the
    GraphBLAS mxv and the engine's superstep are the same plan.
    """
    s = _ring(semiring)
    x = vec.select(F.col("id").alias("k"), F.col("val").alias("xval"))
    joined = mat.join(x, mat.col == x.k).select(
        F.col("row").alias("id"), s.mul(F.col("val"), F.col("xval")).alias("t")
    )
    return joined.groupBy("id").agg(s.add(F.col("t")).alias("val"))


def mat_mat(
    mat_a: DataFrame, mat_b: DataFrame, semiring="plus_times",
    mask: DataFrame | None = None,
) -> DataFrame:
    """C⟨mask⟩ = A ⊕.⊗ B (GraphBLAS masked mxm).

    Join on the inner dimension, optionally keep only (row,col) pairs
    present in ``mask`` (applied BEFORE the aggregate so masked-out
    products never shuffle into the agg), then ⊕-combine. Wedge fan-out
    is bounded by the inputs — orient/filter them first for skew safety
    (see algebraic_triangle_count).
    """
    s = _ring(semiring)
    b = mat_b.select(
        F.col("row").alias("k"), F.col("col").alias("c2"), F.col("val").alias("v2")
    )
    wedges = mat_a.join(b, mat_a.col == b.k).select(
        "row", F.col("c2").alias("col"), s.mul(F.col("val"), F.col("v2")).alias("t")
    )
    if mask is not None:
        wedges = wedges.join(
            mask.select("row", "col").distinct(), ["row", "col"], "left_semi"
        )
    return wedges.groupBy("row", "col").agg(s.add(F.col("t")).alias("val"))


def algebraic_pagerank(
    graph: Graph, damping: float = 0.85, max_iter: int = 50, tol: float = 1e-9
) -> DataFrame:
    """PageRank as a pure semiring recurrence (AlgebraicPageRank scope):
    r ← d·Pᵀr + (d·s + 1−d)/n, with P the out-degree-normalized
    adjacency and s the sink mass — the same fixed point as
    algs.pagerank(distribute_sinks=True) (parity-tested to 1e-9; that
    implementation remains the tuned scale path with checkpoint/resume).
    """
    spark = graph.edges.sparkSession
    nodes = graph.nodes().persist()
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("val"))
    a = adjacency_matrix(graph)
    outw = a.groupBy("row").agg(F.sum("val").alias("wdeg"))
    # P^T: transition mass flowing INTO each vertex; persist + repartition
    # once so every iteration shuffles only the O(n) rank vector
    pt = (
        a.join(outw, "row")
        .select(
            F.col("col").alias("row"), F.col("row").alias("col"),
            (F.col("val") / F.col("wdeg")).alias("val"),
        )
        .repartition("col")
        .persist()
    )
    pt.count()
    sinks = nodes.join(outw.select(F.col("row").alias("id")), "id", "left_anti").persist()
    # Pin, not naked localCheckpoint chains: per-round parquet rotation
    # truncates the plan AND bounds checkpoint storage (the Spark-4
    # plan-growth trap — see linkgraph/iterutil.py)
    from linkgraph.iterutil import Pin

    pin = Pin(spark, "alg_pr")
    r = pin(nodes.select("id", F.lit(1.0 / n).alias("val")), "r")
    try:
        for _ in range(max_iter):
            sink_mass = (
                r.join(sinks, "id", "left_semi").agg(F.sum("val")).collect()[0][0] or 0.0
            )
            base = (damping * sink_mass + (1.0 - damping)) / n
            flow = mat_vec(pt, r, "plus_times")
            nxt = pin(
                nodes.join(flow.withColumnRenamed("val", "f"), "id", "left")
                .select(
                    "id",
                    (F.lit(base) + damping * F.coalesce("f", F.lit(0.0))).alias("val"),
                ),
                "r",
            )
            delta = (
                nxt.join(r.withColumnRenamed("val", "p"), "id")
                .agg(F.sum(F.abs(F.col("val") - F.col("p"))))
                .collect()[0][0]
            )
            r = nxt
            if delta is not None and delta < tol:
                break
        # materialize independently of the Pin dirs removed below
        out = r.select("id", F.col("val").alias("rank")).localCheckpoint(
            eager=True
        )
    finally:
        pt.unpersist()
        sinks.unpersist()
        nodes.unpersist()
        pin.close()
    return out


def algebraic_bellman_ford(graph: Graph, source: int, max_iter: int = 10_000) -> DataFrame:
    """SSSP as min-plus mat-vec iteration (AlgebraicBellmanFord scope):
    d ← d ⊕ (Aᵀ min.+ d) until fixpoint. Missing vector entries are +∞
    (the min-plus zero) so the state stays O(reached). Same results as
    algs.bfs.sssp (parity-tested); the frontier-pruned sssp is the
    faster path — this one relaxes every reached vertex each round.
    """
    spark = graph.edges.sparkSession
    from linkgraph.iterutil import Pin

    at = transpose_matrix(adjacency_matrix(graph)).persist()
    pin = Pin(spark, "alg_bf")
    d = pin(
        spark.createDataFrame([(source, 0.0)], "id bigint, val double"), "d"
    )
    try:
        for _ in range(max_iter):
            relaxed = mat_vec(at, d, "min_plus")
            nxt = pin(
                d.unionByName(relaxed)
                .groupBy("id")
                .agg(F.min("val").alias("val")),
                "d",
            )
            changed = (
                nxt.join(d.withColumnRenamed("val", "p"), "id", "left")
                .where(F.col("p").isNull() | (F.col("val") < F.col("p")))
                .count()
            )
            d = nxt
            if changed == 0:
                break
        out = d.select("id", F.col("val").alias("dist")).localCheckpoint(
            eager=True
        )
    finally:
        at.unpersist()
        pin.close()
    return out


def algebraic_bfs_levels(graph: Graph, source: int, max_iter: int = 10_000) -> DataFrame:
    """Hop levels via min-plus over the unweighted matrix — the or_and
    reachability recurrence with the level recovered for free."""
    return algebraic_bellman_ford(graph.to_unweighted(), source, max_iter)


def algebraic_triangle_count(graph: Graph) -> int:
    """Global triangle count as a masked semiring product
    (AlgebraicTriangleCounting scope): with U the degree-oriented
    upper-triangular adjacency (each edge stored low→high by (deg,id)),
    every triangle is exactly one nonzero of C⟨U⟩ = U ⊕.⊗ U, so the
    count is plus-reduce(C). The orientation bounds wedge fan-out at
    O(sqrt(m)) per vertex — the same skew-safety argument as
    algs.triangles (which remains the per-vertex scale path).
    """
    und = graph if not graph.directed else graph.to_undirected()
    sym = und.symmetric_edges()
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    ranked = sym.join(deg, "src").select(
        "src", "dst", "deg",
    )
    dd = deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg2"))
    oriented = (
        ranked.join(dd, "dst")
        .where(
            (F.col("deg") < F.col("deg2"))
            | ((F.col("deg") == F.col("deg2")) & (F.col("src") < F.col("dst")))
        )
        .select(F.col("src").alias("row"), F.col("dst").alias("col"), F.lit(1.0).alias("val"))
    )
    c = mat_mat(oriented, oriented, "plus_times", mask=oriented)
    total = c.agg(F.sum("val")).collect()[0][0]
    return int(total or 0)
