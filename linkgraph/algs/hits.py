"""HITS — Kleinberg's hubs & authorities (JACM 1999) — and SALSA
(Lempel & Moran, WWW 2000).

The other canonical web link-analysis fixed points next to PageRank:
authority(i) = Σ_{j→i} hub(j), hub(i) = Σ_{i→j} authority(j), each
vector normalized per half-step; good hubs point at good authorities
and vice versa.

Spark shape: exactly two PageRank-style half-supersteps per iteration —
the static edge table (persisted, hash-partitioned on the join key once)
joins the O(n) score state, aggregates by the other endpoint. Both
normalizations are SCALE-INVARIANT (h_{k+1} ∝ A·Aᵀh_k regardless of
where the division happens), so the per-half-step norms are folded into
one lazy crossJoin scalar at the end of the iteration: one pinned
materialization per iteration is the ONLY action (plus one delta agg
when ``tol`` > 0). State rotates through :class:`linkgraph.iterutil.Pin`
(durable parquet) — naked localCheckpoint chains hit the Spark-4
plan-growth trap at high iteration counts. ``max_iter`` with ``tol=0``
gives the exact fixed-iteration run the DuckDB gate unrolls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin


def _iterate(
    e: DataFrame,
    nodes: DataFrame,
    max_iter: int,
    tol: float,
    fwd_div: F.Column | None,
    bwd_div: F.Column | None,
    l2: bool,
    init: float,
) -> DataFrame:
    """Shared HITS/SALSA loop. ``fwd_div``/``bwd_div`` divide the pushed
    mass (SALSA's degree normalization; None → HITS). ``l2`` picks the
    norm. One pin write per iteration; norms ride as lazy scalars."""
    spark = e.sparkSession
    pin = Pin(spark, "hits")
    state = pin(
        nodes.select("id", F.lit(init).alias("hub"), F.lit(init).alias("authority")),
        "state",
    )
    for _ in range(max_iter):
        # authority half-step: pull hub mass along in-edges (unnormalized)
        msg_a = F.col("hub") * F.col("w")
        if fwd_div is not None:
            msg_a = msg_a / fwd_div
        a_u = (
            e.join(state.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum(msg_a).alias("au"))
            .withColumnRenamed("dst", "id")
        )
        # hub half-step over the FRESH (unnormalized) authorities —
        # normalization cancels, folded into the end-of-iteration scalars
        msg_h = F.col("au") * F.col("w")
        if bwd_div is not None:
            msg_h = msg_h / bwd_div
        h_u = (
            e.join(a_u.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum(msg_h).alias("hu"))
            .withColumnRenamed("src", "id")
        )
        vec = (
            nodes.join(a_u, "id", "left")
            .join(h_u, "id", "left")
            .select(
                "id",
                F.coalesce("au", F.lit(0.0)).alias("au"),
                F.coalesce("hu", F.lit(0.0)).alias("hu"),
            )
        )
        if l2:
            norms = vec.agg(
                F.sqrt(F.sum(F.col("au") * F.col("au"))).alias("an"),
                F.sqrt(F.sum(F.col("hu") * F.col("hu"))).alias("hn"),
            )
        else:
            norms = vec.agg(
                F.sum(F.abs(F.col("au"))).alias("an"),
                F.sum(F.abs(F.col("hu"))).alias("hn"),
            )
        safe = lambda c: F.when(  # noqa: E731
            (c.isNull()) | (c == 0.0), F.lit(1.0)
        ).otherwise(c)
        new_state = pin(
            vec.crossJoin(F.broadcast(norms)).select(
                "id",
                (F.col("hu") / safe(F.col("hn"))).alias("hub"),
                (F.col("au") / safe(F.col("an"))).alias("authority"),
            ),
            "state",
        )
        if tol > 0:
            delta = (
                new_state.join(
                    state.select(
                        "id",
                        F.col("hub").alias("ph"),
                        F.col("authority").alias("pa"),
                    ),
                    "id",
                )
                .agg(
                    F.sum(
                        F.abs(F.col("hub") - F.col("ph"))
                        + F.abs(F.col("authority") - F.col("pa"))
                    )
                )
                .collect()[0][0]
            )
            state = new_state
            if delta is not None and delta < tol:
                break
        else:
            state = new_state

    out = state.localCheckpoint(eager=True)
    pin.close()
    return out


def hits(
    graph: Graph,
    max_iter: int = 50,
    tol: float = 1e-9,
    weighted: bool = False,
) -> DataFrame:
    """(id, hub, authority) after power iteration from the all-ones
    vector, L2-normalized per half-step. ``tol`` stops early when the L1
    change of both vectors drops below it (0 disables — exact
    ``max_iter`` rounds for the oracle). Directed graphs use stored
    edges; undirected graphs symmetrize (hub ≡ authority there, both are
    reported)."""
    spark = graph.edges.sparkSession
    e = graph.edges if graph.directed else graph.symmetric_edges()
    e = e.select(
        "src",
        "dst",
        (F.col("weight") if (weighted and graph.weighted) else F.lit(1.0)).alias("w"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(n_parts, "src").persist()
    e.count()
    nodes = graph.nodes().persist()
    out = _iterate(e, nodes, max_iter, tol, None, None, l2=True, init=1.0)
    e.unpersist()
    nodes.unpersist()
    return out


def salsa(
    graph: Graph,
    max_iter: int = 50,
    tol: float = 1e-9,
) -> DataFrame:
    """(id, hub, authority) — SALSA: HITS with the two half-steps
    degree-normalized, i.e. alternating random walks on the bipartite
    hub/authority view:

        authority(i) = Σ_{j→i} hub(j) / outdeg(j)
        hub(i)       = Σ_{i→j} authority(j) / indeg(j)

    L1-normalized per half-step from the uniform 1/n start (the scores
    are walk distributions). Less spam-amplifying than HITS:
    tightly-knit communities no longer dominate, since each page divides
    — not multiplies — its influence. Same superstep shape and cost as
    :func:`hits`."""
    spark = graph.edges.sparkSession
    e = graph.edges if graph.directed else graph.symmetric_edges()
    e = e.select("src", "dst", F.lit(1.0).alias("w"))
    outd = e.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    ind = e.groupBy("dst").agg(F.count("*").cast("double").alias("idg"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = (
        e.join(outd, "src")
        .join(ind, "dst")
        .repartition(n_parts, "src")
        .persist()
    )
    e.count()
    nodes = graph.nodes().persist()
    n = nodes.count()
    out = _iterate(
        e, nodes, max_iter, tol,
        fwd_div=F.col("od"), bwd_div=F.col("idg"),
        l2=False, init=1.0 / (n or 1),
    )
    e.unpersist()
    nodes.unpersist()
    return out
