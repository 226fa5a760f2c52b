"""Seeded (semi-supervised) label propagation — spread a partial labeling
to the whole graph.

The webgraph use: a few thousand hand-labeled hosts (spam/news/shop/…)
propagate over the link structure to label every page; same machinery
serves entity resolution and topic spreading. Classic label spreading
(Zhu & Ghahramani 2002 hard-label variant): seeds are CLAMPED, every
other vertex adopts the weight-majority label among its labeled
neighbors each synchronous round, until no label changes.

Adoption is FIRST-ARRIVAL-MONOTONE: a vertex locks its label the round a
labeled neighbor first reaches it (weight-majority among the labeled
neighbors at that round; ties on (weight desc, hash, label) with the
stationary per-(node,label) hash PLP pins). Re-voting every round — the
textbook synchronous update — can oscillate on bipartite structure;
first-arrival cannot (labels only spread, never flip), terminates within
the seed eccentricity, and matches the multi-source-BFS intuition of
"label by nearest seed mass". Vertices unreachable from every seed stay
null (the honest answer).

Plan per round (the PLP discipline, linkgraph/algs/plp.py): one
labels⋈sym_edges join restricted to the still-unlabeled frontier + one
(dst, label) weight agg + one max_by hash-agg; portable=True swaps the
md5 hash in so the run unrolls to an exact DuckDB oracle. State is
O(n); loop state rotates through Pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin


def seeded_label_propagation(
    graph: Graph,
    seeds: DataFrame,
    max_iter: int = 100,
    portable: bool = False,
) -> DataFrame:
    """(id, label) for every vertex; ``seeds`` is (id, label) — those
    rows come back unchanged (clamped), others carry the first-arrival
    majority label or null if unreachable from every seed."""
    from linkgraph.portable import phash

    spark = graph.edges.sparkSession
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .persist()
    )
    seed_df = seeds.select("id", F.col("label").cast("bigint").alias("label"))
    tie = (
        (lambda: phash(F.col("dst"), F.col("label")))
        if portable
        else (lambda: F.xxhash64("dst", "label"))
    )
    pin = Pin(spark, "seededlp")
    state = pin(
        graph.nodes()
        .join(seed_df.withColumn("_seed", F.lit(1)), "id", "left")
        .select("id", "label", F.coalesce("_seed", F.lit(0)).alias("_seed")),
        "state",
    )
    try:
        for _ in range(max_iter):
            frontier = state.where(F.col("label").isNull()).select("id")
            votes = (
                sym.join(frontier.withColumnRenamed("id", "dst"), "dst", "leftsemi")
                .join(
                    state.where(F.col("label").isNotNull()).select(
                        F.col("id").alias("src"), "label"
                    ),
                    "src",
                )
                .groupBy("dst", "label")
                .agg(F.sum("weight").alias("w"))
            )
            winner = votes.groupBy(F.col("dst").alias("id")).agg(
                F.max_by(
                    F.col("label"),
                    F.struct(F.col("w"), tie(), F.col("label")),
                ).alias("new_label")
            )
            nxt = pin(
                state.join(winner, "id", "left")
                .select(
                    "id",
                    F.coalesce("label", "new_label").alias("label"),
                    "_seed",
                    (F.col("label").isNull() & F.col("new_label").isNotNull())
                    .cast("int")
                    .alias("_chg"),
                ),
                "state",
            )
            changed = nxt.agg(F.sum("_chg")).collect()[0][0] or 0
            state = nxt.select("id", "label", "_seed")
            if changed == 0:
                break
        out = state.select("id", "label").localCheckpoint(eager=True)
    finally:
        sym.unpersist()
        pin.close()
    return out
