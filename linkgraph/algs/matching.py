"""Suitor matching — ½-approximate maximum-weight matching.

Reference parity: matching/SuitorMatcher.cpp (Manne/Halappanavar suitor
algorithm). The suitor algorithm is message passing — each unmatched
vertex proposes to its best available neighbor; mutual proposals lock in —
which distributes directly (unlike PathGrowing's sequential paths):

round: every unmatched vertex picks its best (weight desc, id asc)
unmatched neighbor → pairs where u picks v AND v picks u are matched →
matched vertices leave the pool → repeat until no proposals. Produces the
same matching as sequential greedy-by-weight under the total order, hence
weight ≥ ½ · optimum.

Plan per round: one join (proposals) + one self-join (mutuality) + two
anti-joins (pool shrink); state pinned via iterutil (window-bearing loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin


def suitor_matching(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """(u, v, weight) matched pairs, u < v; each vertex in ≤ 1 pair."""
    spark = graph.edges.sparkSession
    pin = Pin(spark, "suitor")
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
    )
    avail = pin(sym, "avail")
    matched = spark.createDataFrame([], "u bigint, v bigint, weight double")
    for _ in range(max_rounds):
        if avail.isEmpty():
            break
        # best proposal per vertex via lexicographic max_by (desc weight,
        # asc dst) — hash-agg with map-side combine, no per-vertex sort
        prop = (
            avail.groupBy("src")
            .agg(
                F.max_by(
                    F.struct(F.col("dst"), F.col("weight")),
                    F.struct(F.col("weight"), F.bitwise_not(F.col("dst"))),
                ).alias("p")
            )
            .select("src", F.col("p.dst").alias("dst"), F.col("p.weight").alias("weight"))
        )
        mutual = (
            prop.alias("a")
            .join(
                prop.alias("b"),
                (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
            )
            .where(F.col("a.src") < F.col("a.dst"))
            .select(
                F.col("a.src").alias("u"),
                F.col("a.dst").alias("v"),
                F.col("a.weight").alias("weight"),
            )
        )
        mutual = pin(mutual, "mutual")
        if mutual.isEmpty():
            break
        matched = pin(matched.unionByName(mutual), "matched")
        taken = mutual.select(F.col("u").alias("id")).unionByName(
            mutual.select(F.col("v").alias("id"))
        )
        avail = pin(
            avail.join(taken.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(taken.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight"),
            "avail",
        )
    return matched


def b_suitor_matching(graph: Graph, b=2, max_rounds: int = 64) -> DataFrame:
    """(u, v, weight) — b-matching (matching/BSuitorMatcher.cpp; Khan et
    al. b-suitor): every vertex may be matched to up to b partners
    (uniform int or per-vertex (id, b) DataFrame). Same message-passing
    shape as suitor_matching, generalized: a vertex with remaining
    capacity c proposes to its TOP-c available neighbors (one ranked
    window, rn ≤ c instead of rn = 1); mutual proposals lock, capacities
    decrement, saturated vertices leave the pool. ½-approximation of the
    maximum-weight b-matching."""
    spark = graph.edges.sparkSession
    pin = Pin(spark, "bsuitor")
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
    )
    if isinstance(b, DataFrame):
        caps = b.select("id", F.col("b").cast("int").alias("cap"))
    else:
        caps = graph.nodes().select("id", F.lit(int(b)).alias("cap"))
    caps = pin(caps, "caps")
    avail = pin(sym, "avail")
    matched = spark.createDataFrame([], "u bigint, v bigint, weight double")
    for _ in range(max_rounds):
        if avail.isEmpty():
            break
        w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
        prop = (
            avail.join(caps.withColumnRenamed("id", "src"), "src")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= F.col("cap"))
            .select("src", "dst", "weight")
        )
        mutual = (
            prop.alias("a")
            .join(
                prop.alias("b"),
                (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
            )
            .where(F.col("a.src") < F.col("a.dst"))
            .select(
                F.col("a.src").alias("u"),
                F.col("a.dst").alias("v"),
                F.col("a.weight").alias("weight"),
            )
        )
        mutual = pin(mutual, "mutual")
        if mutual.isEmpty():
            break
        matched = pin(matched.unionByName(mutual), "matched")
        used = (
            mutual.select(F.col("u").alias("id"))
            .unionByName(mutual.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("n"))
        )
        caps = pin(
            caps.join(used, "id", "left")
            .select(
                "id",
                (F.col("cap") - F.coalesce("n", F.lit(0))).cast("int").alias("cap"),
            ),
            "caps",
        )
        zero = caps.where(F.col("cap") <= 0).select("id")
        me = mutual.select("u", "v")
        avail = pin(
            avail.join(
                me.withColumnRenamed("u", "src").withColumnRenamed("v", "dst"),
                ["src", "dst"],
                "left_anti",
            )
            .join(
                me.select(F.col("v").alias("src"), F.col("u").alias("dst")),
                ["src", "dst"],
                "left_anti",
            )
            .join(zero.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(zero.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst", "weight"),
            "avail",
        )
    return matched
