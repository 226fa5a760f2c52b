"""OPIC — On-line Page Importance Computation (Abiteboul, Preda &
Cobéna, WWW 2003): the crawl-prioritization importance estimate.

Every page holds CASH; each (synchronous, batch) step a page distributes
its cash equally over its out-links and accumulates what flowed through
it as HISTORY. A VIRTUAL ROOT page — linked from every page and linking
to every page — guarantees strong connectivity (sinks bank their cash
with the root, which redistributes uniformly), so no damping factor is
needed. Importance after T steps is (history + cash) normalized over
pages; unlike PageRank it is well-defined mid-crawl and updates online
as new pages arrive — the reason crawlers use it for frontier ordering.

Spark shape: identical superstep discipline to PageRank — static edge
table joined once with the (out-degree + 1) denominator and persisted
hash-partitioned on src; O(n) state (id, cash, hist) with the root's
cash/history riding as constant columns; the two scalars each step
(page→root flow, root redistribution) are lazy crossJoin aggregates, so
the ONE action per iteration is the Pin write. Fixed ``iters`` is
exactly unrollable to SQL for the DuckDB gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin

__all__ = ["opic"]


def opic(graph: Graph, iters: int = 12) -> DataFrame:
    """(id, cash, hist, importance) after ``iters`` synchronous OPIC
    steps from the uniform 1/(n+1) split (the virtual root holds the
    remaining share). importance = (hist + cash) / Σ_pages (hist + cash);
    the root's share is excluded from the normalization, matching the
    estimate a crawler ranks pages by."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").distinct()
    od = e.groupBy("src").agg((F.count("*") + 1).cast("double").alias("odp"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = e.repartition(n_parts, "src").persist()
    e.count()

    nodes = graph.nodes().persist()
    n = nodes.count()
    init = 1.0 / (n + 1)
    pin = Pin(spark, "opic")
    # odp: out-degree + 1 (the implicit link to the virtual root); sinks
    # have odp = 1 — their whole balance banks with the root each step
    state = pin(
        nodes.join(od.withColumnRenamed("src", "id"), "id", "left").select(
            "id",
            F.lit(init).alias("cash"),
            F.lit(0.0).alias("hist"),
            F.coalesce("odp", F.lit(1.0)).alias("odp"),
            F.lit(init).alias("root_cash"),
            F.lit(0.0).alias("root_hist"),
        ),
        "state",
    )

    for _ in range(iters):
        inflow = (
            e.join(
                state.select(F.col("id").alias("src"), "cash", "odp"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("cash") / F.col("odp")).alias("inf"))
            .withColumnRenamed("dst", "id")
        )
        # scalars: every page sends one share to the root; the root
        # redistributes its whole balance uniformly over the n pages
        scal = state.agg(
            F.sum(F.col("cash") / F.col("odp")).alias("to_root"),
            F.first("root_cash").alias("rc"),
            F.first("root_hist").alias("rh"),
        )
        state = pin(
            state.join(inflow, "id", "left")
            .crossJoin(F.broadcast(scal))
            .select(
                "id",
                (
                    F.coalesce("inf", F.lit(0.0)) + F.col("rc") / F.lit(float(n))
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
                "odp",
                F.col("to_root").alias("root_cash"),
                (F.col("rh") + F.col("rc")).alias("root_hist"),
            ),
            "state",
        )

    total = state.agg(F.sum(F.col("hist") + F.col("cash"))).collect()[0][0] or 1.0
    out = state.select(
        "id",
        "cash",
        "hist",
        ((F.col("hist") + F.col("cash")) / F.lit(float(total))).alias("importance"),
    ).localCheckpoint(eager=True)
    pin.close()
    e.unpersist()
    nodes.unpersist()
    return out
