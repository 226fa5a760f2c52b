"""Laplacian-solver centralities: effective resistance, electrical
closeness, spanning-edge centrality.

Reference parity: NetworKit ``SpanningEdgeCentrality`` / ``Electrical
Closeness`` (networkit/cpp/centrality/SpanningEdgeCentrality.cpp,
ApproxElectricalCloseness.cpp) solve Laplacian systems with an in-memory
CG/LAMG solver. The distributed-native translation keeps the same math
but expresses every Laplacian matvec as ONE join + ONE aggregate over
the edge DataFrame:

    (L x)_i = wdeg_i * x_i - sum_j w_ij x_j

so conjugate gradient runs as a driver loop of joins/aggs (vector state
pinned per iteration; dot products are scalar aggs). Solutions are
projected onto 1-perp each iteration, the standard treatment of the
Laplacian nullspace on a connected graph.

- ``effective_resistance(u, v)``: one CG solve of L x = e_u - e_v;
  r_eff = x_u - x_v.
- ``spanning_edge_centrality``: Spielman–Srivastava sketching — k =
  O(log m / eps^2) solves L z_i = B^T W^{1/2} q_i against random +-1
  projections of the incidence matrix; SEC(e) = w_e * ||z(u)-z(v)||^2
  across the k sketch columns. Exactly the approximation scheme the
  reference's Approx* classes use, with counter-hash projections so the
  sketch is deterministic and parallelism-independent.
- ``electrical_closeness``: n_v / sum_u r(v, u) for selected pivots
  (each pivot = one solve; exact-parity fixture use, like the
  reference's exact mode).

Scale: a CG iteration is O(m) work with the SAME co-partitioned shuffle
shape as a PageRank superstep; iteration counts follow sqrt(kappa(L)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph
from ..iterutil import Pin
from ..portable import phash


def _wdeg(sym: DataFrame) -> DataFrame:
    return sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wd"))


def _matvec(sym: DataFrame, wdeg: DataFrame, x: DataFrame) -> DataFrame:
    """(id, y) = L x via one join + one agg."""
    msg = (
        sym.join(x.select(F.col("id").alias("dst"), F.col("x").alias("xj")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum(F.col("weight") * F.col("xj")).alias("s"))
    )
    return (
        wdeg.join(x, "id")
        .join(msg, "id", "left")
        .select(
            "id", (F.col("wd") * F.col("x") - F.coalesce("s", F.lit(0.0))).alias("y")
        )
    )


def _dot(a: DataFrame, acol: str, b: DataFrame, bcol: str) -> float:
    row = (
        a.select("id", F.col(acol).alias("_a"))
        .join(b.select("id", F.col(bcol).alias("_b")), "id")
        .agg(F.sum(F.col("_a") * F.col("_b")).alias("d"))
        .collect()[0]
    )
    return float(row["d"] or 0.0)


def laplacian_solve(
    graph: Graph,
    b: DataFrame,
    tol: float = 1e-8,
    max_iter: int = 500,
) -> DataFrame:
    """Solve L x = b (b: (id, b) with sum(b) = 0, connected graph) by
    conjugate gradient; returns (id, x) with mean(x) = 0."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    wdeg = _wdeg(sym).persist()
    nodes = graph.nodes()
    pin = Pin(spark, "cg")
    try:
        x = pin(nodes.select("id", F.lit(0.0).alias("x")), "x")
        r = pin(
            nodes.join(b.select("id", F.col(b.columns[1]).alias("b")), "id", "left")
            .select("id", F.coalesce("b", F.lit(0.0)).alias("r")),
            "r",
        )
        p = pin(r.select("id", F.col("r").alias("p")), "p")
        rs = _dot(r, "r", r, "r")
        for _ in range(max_iter):
            if rs <= tol * tol:
                break
            ap = _matvec(sym, wdeg, p.select("id", F.col("p").alias("x"))).select(
                "id", F.col("y").alias("ap")
            )
            ap = pin(ap, "ap")
            denom = _dot(p, "p", ap, "ap")
            if abs(denom) < 1e-300:
                break
            alpha = rs / denom
            x = pin(
                x.join(p, "id").select(
                    "id", (F.col("x") + alpha * F.col("p")).alias("x")
                ),
                "x",
            )
            r = pin(
                r.join(ap, "id").select(
                    "id", (F.col("r") - alpha * F.col("ap")).alias("r")
                ),
                "r",
            )
            rs_new = _dot(r, "r", r, "r")
            beta = rs_new / rs
            p = pin(
                r.join(p, "id").select(
                    "id", (F.col("r") + beta * F.col("p")).alias("p")
                ),
                "p",
            )
            rs = rs_new
        # project onto 1-perp (fix the nullspace component)
        mean = x.agg(F.avg("x").alias("m")).collect()[0]["m"] or 0.0
        out = x.select("id", (F.col("x") - float(mean)).alias("x")).localCheckpoint(
            eager=True
        )
        return out
    finally:
        sym.unpersist()
        wdeg.unpersist()
        pin.close()


def effective_resistance(
    graph: Graph, u: int, v: int, tol: float = 1e-8, max_iter: int = 500
) -> float:
    """r_eff(u, v) = x_u - x_v where L x = e_u - e_v."""
    spark = graph.edges.sparkSession
    b = spark.createDataFrame(
        [(int(u), 1.0), (int(v), -1.0)], "id bigint, b double"
    )
    x = laplacian_solve(graph, b, tol=tol, max_iter=max_iter)
    vals = {r["id"]: r["x"] for r in x.where(F.col("id").isin(int(u), int(v))).collect()}
    return float(vals[int(u)] - vals[int(v)])


def resistance_sketch(
    graph: Graph,
    k: int = 16,
    seed: int = 42,
    tol: float = 1e-7,
    max_iter: int = 500,
) -> DataFrame:
    """(id, z0..z{k-1}) — the Spielman–Srivastava resistance sketch:
    column i solves L z_i = (W^{1/2} B)^T q_i for a counter-hash ±1
    projection q_i over the edges. For ANY pair,
    r_eff(u, v) ≈ ||z(u) - z(v)||² / k, and L+_uu ≈ ||z(u)||² / k
    (since L+ L L+ = L+ and the solves are mean-centered)."""
    canon = graph.symmetric_edges().where(F.col("src") < F.col("dst")).persist()
    try:
        sols = []
        for i in range(k):
            sigma = (
                F.pmod(phash(F.col("src"), F.col("dst"), F.lit(seed + i)), F.lit(2)) * 2
                - 1
            ).cast("double")
            contrib = canon.select("src", "dst", (sigma * F.sqrt("weight")).alias("c"))
            b = (
                contrib.select(F.col("src").alias("id"), F.col("c"))
                .unionByName(
                    contrib.select(F.col("dst").alias("id"), (-F.col("c")).alias("c"))
                )
                .groupBy("id")
                .agg(F.sum("c").alias("b"))
            )
            x = laplacian_solve(graph, b, tol=tol, max_iter=max_iter)
            sols.append(x.select("id", F.col("x").alias(f"z{i}")))
        z = sols[0]
        for s in sols[1:]:
            z = z.join(s, "id")
        return z.localCheckpoint(eager=True)
    finally:
        canon.unpersist()


def spanning_edge_centrality(
    graph: Graph,
    k: int = 16,
    seed: int = 42,
    tol: float = 1e-7,
    max_iter: int = 500,
) -> DataFrame:
    """(src, dst, sec) per canonical edge — SEC(e) = w_e * r_eff(e),
    JL-approximated from the resistance sketch (error O(1/sqrt(k)))."""
    z = resistance_sketch(graph, k=k, seed=seed, tol=tol, max_iter=max_iter)
    canon = graph.symmetric_edges().where(F.col("src") < F.col("dst"))
    zu = z.select(
        F.col("id").alias("src"), *[F.col(f"z{i}").alias(f"u{i}") for i in range(k)]
    )
    zv = z.select(
        F.col("id").alias("dst"), *[F.col(f"z{i}").alias(f"v{i}") for i in range(k)]
    )
    diff2 = sum(
        (F.col(f"u{i}") - F.col(f"v{i}")) * (F.col(f"u{i}") - F.col(f"v{i}"))
        for i in range(k)
    )
    return (
        canon.join(zu, "src")
        .join(zv, "dst")
        .select("src", "dst", (F.col("weight") * diff2 / k).alias("sec"))
    )


def electrical_closeness(
    graph: Graph,
    k: int = 16,
    seed: int = 42,
    tol: float = 1e-7,
    max_iter: int = 500,
) -> DataFrame:
    """(id, score) for EVERY vertex from k solves total:
    score(v) = (n-1) / sum_u r(v, u) with
    sum_u r(v, u) = n·L+_vv + tr(L+), both read off the sketch
    (L+_vv ≈ ||z_v||²/k, tr(L+) = sum of those). The reference's
    ApproxElectricalCloseness uses the same sketch identity plus a
    diagonal refinement; accuracy here is the plain JL O(1/sqrt(k))."""
    z = resistance_sketch(graph, k=k, seed=seed, tol=tol, max_iter=max_iter)
    n = graph.num_nodes()
    sq = sum(F.col(f"z{i}") * F.col(f"z{i}") for i in range(k))
    diag = z.select("id", (sq / k).alias("lvv"))
    tr = float(diag.agg(F.sum("lvv").alias("t")).collect()[0]["t"] or 0.0)
    return diag.select(
        "id", ((n - 1) / (n * F.col("lvv") + F.lit(tr))).alias("score")
    )


def commute_time_distance(
    graph: Graph, u: int, v: int, tol: float = 1e-8, max_iter: int = 500
) -> float:
    """Commute-time distance C(u, v) = 2W · r_eff(u, v) (expected
    round-trip steps of the random walk; distance/CommuteTimeDistance.cpp
    parity — the reference solves the same Laplacian system)."""
    two_w = float(
        graph.symmetric_edges().agg(F.sum("weight")).collect()[0][0] or 0.0
    )
    return two_w * effective_resistance(graph, u, v, tol=tol, max_iter=max_iter)
