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


def laplacian_solve_block(
    graph: Graph,
    b: DataFrame,
    k: int,
    tol: float = 1e-7,
    max_iter: int = 500,
) -> DataFrame:
    """Solve L x_i = b_i for k right-hand sides AT ONCE — ``b`` is
    (id, b0..b{k-1}); returns (id, x0..x{k-1}), each column mean-centered.

    Blocked CG: the k systems share every shuffle. State is ONE
    DataFrame carrying (x_i, r_i, p_i) columns; per iteration the matvec
    is one join + one agg computing all k ap_i columns, the 2k scalars
    (p·Ap, r·r per column) come from ONE aggregation action, and column
    updates are literal-coefficient projections. A column whose residual
    has converged freezes (alpha_i = beta_i = 0) — its trajectory is
    exactly what the scalar :func:`laplacian_solve` would have produced.
    Driver cost per iteration is O(1) actions instead of O(k): the
    difference between 6k and ~3 jobs per CG step, which is the whole
    bill at sketch sizes (k = 16–64)."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    wdeg = _wdeg(sym).persist()
    nodes = graph.nodes()
    pin = Pin(spark, "cgblk")
    cols = list(range(k))
    try:
        state = pin(
            nodes.join(b, "id", "left").select(
                "id",
                *[F.lit(0.0).alias(f"x{i}") for i in cols],
                *[F.coalesce(f"b{i}", F.lit(0.0)).alias(f"r{i}") for i in cols],
                *[F.coalesce(f"b{i}", F.lit(0.0)).alias(f"p{i}") for i in cols],
            ),
            "state",
        )
        rs = [
            float(v or 0.0)
            for v in state.agg(
                *[F.sum(F.col(f"r{i}") * F.col(f"r{i}")).alias(f"s{i}") for i in cols]
            ).collect()[0]
        ]
        for _ in range(max_iter):
            active = [i for i in cols if rs[i] > tol * tol]
            if not active:
                break
            msg = (
                sym.join(
                    state.select(
                        F.col("id").alias("dst"),
                        *[F.col(f"p{i}").alias(f"pj{i}") for i in active],
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"))
                .agg(
                    *[
                        F.sum(F.col("weight") * F.col(f"pj{i}")).alias(f"m{i}")
                        for i in active
                    ]
                )
            )
            withap = pin(
                state.join(wdeg, "id").join(msg, "id", "left").select(
                    state["*"],
                    *[
                        (
                            F.col("wd") * F.col(f"p{i}")
                            - F.coalesce(f"m{i}", F.lit(0.0))
                        ).alias(f"ap{i}")
                        for i in active
                    ],
                ),
                "state",
            )
            scal = withap.agg(
                *[
                    F.sum(F.col(f"p{i}") * F.col(f"ap{i}")).alias(f"d{i}")
                    for i in active
                ]
            ).collect()[0]
            alpha = {}
            for i in active:
                denom = float(scal[f"d{i}"] or 0.0)
                alpha[i] = rs[i] / denom if abs(denom) > 1e-300 else 0.0
            upd = pin(
                withap.select(
                    "id",
                    *[
                        (
                            (F.col(f"x{i}") + alpha[i] * F.col(f"p{i}")).alias(f"x{i}")
                            if i in active
                            else F.col(f"x{i}")
                        )
                        for i in cols
                    ],
                    *[
                        (
                            (F.col(f"r{i}") - alpha[i] * F.col(f"ap{i}")).alias(f"r{i}")
                            if i in active
                            else F.col(f"r{i}")
                        )
                        for i in cols
                    ],
                    *[F.col(f"p{i}") for i in cols],
                ),
                "state",
            )
            rs_new_row = upd.agg(
                *[F.sum(F.col(f"r{i}") * F.col(f"r{i}")).alias(f"s{i}") for i in active]
            ).collect()[0]
            beta = {}
            for i in active:
                nv = float(rs_new_row[f"s{i}"] or 0.0)
                beta[i] = nv / rs[i] if rs[i] > 0 else 0.0
                rs[i] = nv
            state = pin(
                upd.select(
                    "id",
                    *[F.col(f"x{i}") for i in cols],
                    *[F.col(f"r{i}") for i in cols],
                    *[
                        (
                            (F.col(f"r{i}") + beta[i] * F.col(f"p{i}")).alias(f"p{i}")
                            if i in active
                            else F.col(f"p{i}")
                        )
                        for i in cols
                    ],
                ),
                "state",
            )
        means = state.agg(
            *[F.avg(f"x{i}").alias(f"m{i}") for i in cols]
        ).collect()[0]
        return state.select(
            "id",
            *[
                (F.col(f"x{i}") - float(means[f"m{i}"] or 0.0)).alias(f"x{i}")
                for i in cols
            ],
        ).localCheckpoint(eager=True)
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
        def sigma(i):
            return (
                F.pmod(phash(F.col("src"), F.col("dst"), F.lit(seed + i)), F.lit(2)) * 2
                - 1
            ).cast("double")

        contrib = canon.select(
            "src", "dst", *[(sigma(i) * F.sqrt("weight")).alias(f"c{i}") for i in range(k)]
        )
        b = (
            contrib.select(F.col("src").alias("id"), *[F.col(f"c{i}") for i in range(k)])
            .unionByName(
                contrib.select(
                    F.col("dst").alias("id"),
                    *[(-F.col(f"c{i}")).alias(f"c{i}") for i in range(k)],
                )
            )
            .groupBy("id")
            .agg(*[F.sum(f"c{i}").alias(f"b{i}") for i in range(k)])
        )
        # ALL k systems ride one blocked CG — one matvec join per
        # iteration for the whole sketch instead of per column
        z = laplacian_solve_block(graph, b, k, tol=tol, max_iter=max_iter)
        return z.select(
            "id", *[F.col(f"x{i}").alias(f"z{i}") for i in range(k)]
        ).localCheckpoint(eager=True)
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


def forest_centrality(
    graph: Graph,
    k: int = 16,
    seed: int = 42,
    tol: float = 1e-7,
    max_iter: int = 500,
) -> DataFrame:
    """(id, score) — forest closeness centrality (centrality/
    ForestCentrality.cpp; van der Grinten et al. 2021 "forest closeness
    for disconnected graphs"): score(v) = (n−1) / Σ_u d_f(v, u) with
    d_f the FOREST distance (I+L)-based metric — finite across
    components, which is its advantage over electrical closeness.

    Reduction (Chebotarev): forest distances of G are the effective
    resistances of the AUGMENTED graph G* = G + a universal vertex u*
    tied to every vertex with weight 1 (grounding u* gives exactly
    I + L). So the operator reuses :func:`resistance_sketch` on G*:

        Σ_{u∈V} d_f(v,u) = (n+1)·L*+_vv + tr(L*+) − Ω*(v, u*)

    (the all-V* resistance-sum identity minus the u* term), everything
    read off ONE k-column sketch — k Laplacian solves total, not n.
    The reference approximates the same quantities with uniform
    spanning-tree sampling (Wilson's algorithm), which is inherently
    sequential random-walk work; the sketch is the distributed-native
    estimator with the same O(1/√k) error decay.

    Scale: the augmentation adds n unit edges (one extra row per vertex
    — same order as the node set); each CG matvec stays one join + one
    agg over edges ∪ star."""
    spark = graph.edges.sparkSession
    nodes = graph.nodes()
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("score"))
    root = int(nodes.agg(F.max("id")).collect()[0][0]) + 1
    star = nodes.select(
        F.lit(root).cast("bigint").alias("src"),
        F.col("id").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    half = graph.symmetric_edges().where(F.col("src") < F.col("dst")).select(
        "src", "dst", "weight"
    )
    aug = Graph.from_edges(half.unionByName(star), directed=False, weighted=True)
    z = resistance_sketch(aug, k=k, seed=seed, tol=tol, max_iter=max_iter)
    zr = z.where(F.col("id") == root).collect()[0]
    sq = sum(F.col(f"z{i}") * F.col(f"z{i}") for i in range(k))
    r_root = sum(
        (F.col(f"z{i}") - F.lit(float(zr[f"z{i}"])))
        * (F.col(f"z{i}") - F.lit(float(zr[f"z{i}"])))
        for i in range(k)
    )
    diag = z.select("id", (sq / k).alias("lvv"), (r_root / k).alias("rr"))
    tr = float(diag.agg(F.sum("lvv")).collect()[0][0] or 0.0)
    return (
        diag.where(F.col("id") != root)
        .select(
            "id",
            (
                F.lit(float(n - 1))
                / ((n + 1) * F.col("lvv") + F.lit(tr) - F.col("rr"))
            ).alias("score"),
        )
    )
