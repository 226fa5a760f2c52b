"""MaxentStress graph layout — distributed stress majorization with a
sampled maximum-entropy repulsion term.

Reference parity: REF⚠ viz/MaxentStress.{hpp,cpp} (Gansner, Hu & North
2013, "A maxent-stress model for graph layout"): minimize
Σ_{(u,v)∈E} w_uv·(‖x_u−x_v‖ − d_uv)² − α·Σ_{(u,v)∉E} ln‖x_u−x_v‖ — stress
pins known (edge) distances, the entropy term spreads everything else.
The reference solves the induced linear systems with an algebraic solver
(LAMG) and approximates the non-edge sum; the distributed formulation is
the paper's local iteration (its eq. 2):

  x_u ← [ Σ_{v∈N(u)} w_uv·(x_v + d_uv·(x_u−x_v)/‖x_u−x_v‖)
          + α · Σ_{a∈S(u)} (x_u−x_a)/‖x_u−x_a‖^q ] / Σ_{v∈N(u)} w_uv

with the non-edge sum approximated by a per-iteration deterministic
ANCHOR SAMPLE S(u) (hash-chosen vertices, the same sample for every u —
a broadcast join, so the repulsion term costs O(n·s) rows, never n²).
All hash draws use the portable md5 hash, so a numpy replica reproduces
the run bit-for-bit up to float-summation order (tests/test_maxent.py).

Scale: per iteration — one position⋈edges join + groupBy(u) agg for the
attraction term (keyed on vertex id, the PageRank superstep shape) and
one broadcast anchor join; state is O(n·dims). Anchors are a tiny
collect (s rows). Positions rotate through Pin to keep the plan flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin
from linkgraph.portable import phash

EPS = 1e-9


def _init_positions(nodes: DataFrame, dims: int, seed: int) -> DataFrame:
    cols = [
        (
            (phash(F.col("id"), F.lit(seed), F.lit(c)) % 1_000_000) / 1_000_000.0
        ).alias(f"x{c}")
        for c in range(dims)
    ]
    return nodes.select("id", *cols)


def maxent_stress(
    graph: Graph,
    dims: int = 2,
    iters: int = 30,
    alpha: float = 0.01,
    q: float = 2.0,
    n_anchors: int = 8,
    seed: int = 42,
    distances: DataFrame | None = None,
) -> DataFrame:
    """(id, x0 .. x{dims-1}) — MaxentStress coordinates. ``distances``
    optionally overrides the per-edge target (columns src, dst, d;
    symmetric pairs); default target is the edge weight (1.0 when
    unweighted), the reference's k-neighborhood-distance input reduced
    to the graph's own metric."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst"))
    if distances is not None:
        # symmetrize the override and keep it total: a caller-supplied
        # one-directional (u,v) row must pull BOTH endpoints (an inner
        # join on raw pairs silently broke symmetry), and edges absent
        # from the table keep their default weight instead of vanishing
        # from the stress term
        dsym = (
            distances.select("src", "dst", F.col("d").alias("_d"))
            .unionByName(
                distances.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"),
                    F.col("d").alias("_d"),
                )
            )
            .groupBy("src", "dst")
            .agg(F.max("_d").alias("_d"))
        )
        sym = sym.join(dsym, ["src", "dst"], "left").select(
            "src", "dst", F.coalesce("_d", "weight").alias("weight")
        )
    sym = sym.select("src", "dst", F.col("weight").alias("d")).persist()
    nodes = graph.nodes().select("id").persist()
    pin = Pin(spark, "maxent")
    pos = pin(_init_positions(nodes, dims, seed), "pos")
    xs = [f"x{c}" for c in range(dims)]
    try:
        for it in range(iters):
            anchors = [
                r["id"]
                for r in nodes.orderBy(
                    phash(F.col("id"), F.lit(seed), F.lit(1000 + it)), F.asc("id")
                )
                .limit(n_anchors)
                .collect()
            ]
            adf = F.broadcast(
                pos.where(F.col("id").isin(anchors)).select(
                    F.col("id").alias("aid"), *[F.col(c).alias(f"a{c}") for c in xs]
                )
            )
            # attraction: v's pull on u along each edge (u = dst side)
            pu = pos.select(F.col("id").alias("dst"), *[F.col(c).alias(f"u{c}") for c in xs])
            pv = pos.select(F.col("id").alias("src"), *[F.col(c).alias(f"v{c}") for c in xs])
            ed = sym.join(pv, "src").join(pu, "dst")
            # squares as products (not pow): bit-portable vs the SQL oracle
            norm = F.sqrt(
                sum(
                    (F.col(f"u{c}") - F.col(f"v{c}")) * (F.col(f"u{c}") - F.col(f"v{c}"))
                    for c in xs
                )
                + F.lit(0.0)
            )
            norm = F.greatest(norm, F.lit(EPS))
            attr = ed.groupBy(F.col("dst").alias("id")).agg(
                F.sum("d").alias("wsum"),
                *[
                    F.sum(
                        F.col("d")
                        * (
                            F.col(f"v{c}")
                            + F.col("d") * (F.col(f"u{c}") - F.col(f"v{c}")) / norm
                        )
                    ).alias(f"s{c}")
                    for c in xs
                ],
            )
            # repulsion: anchors push u away (maxent gradient sample)
            rj = pos.crossJoin(adf).where(F.col("id") != F.col("aid"))
            rnorm = F.sqrt(
                sum(
                    (F.col(c) - F.col(f"a{c}")) * (F.col(c) - F.col(f"a{c}"))
                    for c in xs
                )
                + F.lit(0.0)
            )
            rnorm = F.greatest(rnorm, F.lit(EPS))
            # q=2 as a product, not pow: Math.pow and C pow may differ in
            # the last ulp, and the gate oracle replays this arithmetic
            rdenom = rnorm * rnorm if q == 2.0 else rnorm ** q
            rep = rj.groupBy("id").agg(
                *[
                    F.sum((F.col(c) - F.col(f"a{c}")) / rdenom).alias(f"r{c}")
                    for c in xs
                ]
            )
            new = (
                pos.join(attr, "id", "left")
                .join(rep, "id", "left")
                .select(
                    "id",
                    *[
                        F.when(
                            F.col("wsum").isNotNull(),
                            (
                                F.col(f"s{c}")
                                + F.lit(alpha) * F.coalesce(F.col(f"r{c}"), F.lit(0.0))
                            )
                            / F.col("wsum"),
                        )
                        .otherwise(F.col(c))
                        .alias(c)
                        for c in xs
                    ],
                )
            )
            pos = pin(new, "pos")
        return pos.localCheckpoint(eager=True)
    finally:
        sym.unpersist()
        nodes.unpersist()
        pin.close()


def edge_stress(graph: Graph, pos: DataFrame) -> float:
    """Σ_{(u,v)∈E} w_uv·(‖x_u−x_v‖ − d_uv)² over the symmetrized edges —
    the pinned half of the maxent objective (diagnostic)."""
    xs = [c for c in pos.columns if c != "id"]
    sym = graph.symmetric_edges().where(F.col("src") < F.col("dst"))
    pu = pos.select(F.col("id").alias("src"), *[F.col(c).alias(f"u{c}") for c in xs])
    pv = pos.select(F.col("id").alias("dst"), *[F.col(c).alias(f"v{c}") for c in xs])
    norm = F.sqrt(sum((F.col(f"u{c}") - F.col(f"v{c}")) ** 2 for c in xs) + F.lit(0.0))
    val = (
        sym.join(pu, "src")
        .join(pv, "dst")
        .agg(F.sum(F.col("weight") * (norm - F.col("weight")) ** 2))
        .collect()[0][0]
    )
    return float(val or 0.0)
