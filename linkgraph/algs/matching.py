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


def suitor_matching(graph: Graph, max_rounds: int = 10_000) -> DataFrame:
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
    # materialize off the Pin's parquet state, then release it
    out = matched.localCheckpoint(eager=True)
    pin.close()
    return out


def b_suitor_matching(graph: Graph, b=2, max_rounds: int = 10_000) -> DataFrame:
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
    out = matched.localCheckpoint(eager=True)
    pin.close()
    return out


def path_growing_matching(graph: Graph, max_rounds: int = 10_000) -> DataFrame:
    """(u, v, weight) — ½-approximate maximum-weight matching by PATH
    GROWING (matching/PathGrowingMatcher.cpp; Drake & Hougardy 2003):
    grow vertex-disjoint paths along locally-heaviest edges, 2-color the
    edges of each path alternately into M1/M2 (each is a matching since
    paths are vertex-disjoint and alternate per step), return the heavier.

    The reference grows ONE path to completion at a time (sequential).
    The distributed formulation grows ALL paths simultaneously, one edge
    per path per round, with conflicts resolved by a locally-dominant
    rule: every active path head proposes its heaviest edge to a FREE
    vertex (one that is still a trivial, never-extended path); a proposal
    is taken only if it is the highest-priority proposal at BOTH of its
    endpoints (priority = weight desc, then src asc, dst asc — a global
    total order), so the selected edges of a round are vertex-disjoint.
    The Drake–Hougardy charging argument is per-move local — when a head
    leaves vertex u it takes the heaviest edge still incident to u, so
    the (unique) optimal edge at u charges into an edge of >= weight —
    and therefore survives the interleaving: w(M1) + w(M2) >= w(M*).

    Plan per round: proposal join (heads x free-filtered edges) + one
    max_by per walker + one max_by per endpoint (local-max) + two
    verification joins; all hash-keyed, no per-path sequential state on
    the driver. Rounds are bounded by the longest grown path plus
    contention retries, the same frontier profile as suitor_matching.
    """
    spark = graph.edges.sparkSession
    pin = Pin(spark, "pathgrow")
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .persist()
    )
    # walkers: active path heads; wid is the start vertex of the path.
    walkers = pin(
        graph.nodes().select(
            F.col("id").alias("wid"),
            F.col("id").alias("cur"),
            F.lit(0).alias("parity"),
        ),
        "walkers",
    )
    free = pin(graph.nodes().select("id"), "free")
    matched = spark.createDataFrame([], "u bigint, v bigint, weight double, color int")
    for _ in range(max_rounds):
        usable = (
            walkers.join(sym, walkers.cur == sym.src)
            .join(free.withColumnRenamed("id", "dst"), "dst")
            .select("wid", "parity", F.col("cur").alias("u"), F.col("dst").alias("t"), "weight")
        )
        prop = (
            usable.groupBy("wid", "parity", "u")
            .agg(
                F.max_by(
                    F.struct(F.col("t"), F.col("weight")),
                    F.struct(F.col("weight"), F.bitwise_not(F.col("t"))),
                ).alias("p")
            )
            .select(
                "wid",
                "parity",
                "u",
                F.col("p.t").alias("t"),
                F.col("p.weight").alias("weight"),
                F.struct(
                    F.col("p.weight").alias("w"),
                    F.bitwise_not(F.col("u")).alias("nu"),
                    F.bitwise_not(F.col("p.t")).alias("nt"),
                ).alias("prio"),
            )
        )
        prop = pin(prop, "prop")
        if prop.isEmpty():
            break
        inc = prop.select(F.col("u").alias("vertex"), "prio").unionByName(
            prop.select(F.col("t").alias("vertex"), "prio")
        )
        winner = inc.groupBy("vertex").agg(F.max("prio").alias("best"))
        selected = (
            prop.join(
                winner.withColumnRenamed("vertex", "u").withColumnRenamed("best", "bu"),
                "u",
            )
            .join(
                winner.withColumnRenamed("vertex", "t").withColumnRenamed("best", "bt"),
                "t",
            )
            .where((F.col("prio") == F.col("bu")) & (F.col("prio") == F.col("bt")))
            .select("wid", "parity", "u", "t", "weight")
        )
        selected = pin(selected, "selected")
        matched = pin(
            matched.unionByName(
                selected.select(
                    F.col("u"),
                    F.col("t").alias("v"),
                    "weight",
                    F.col("parity").alias("color"),
                )
            ),
            "matched",
        )
        # heads advance; trivial walkers at absorbed targets die; walkers
        # that made no proposal have no free neighbor left - path ends.
        moved = selected.select(
            "wid", F.col("t").alias("cur"), (F.lit(1) - F.col("parity")).alias("parity")
        )
        absorbed = selected.select(F.col("t").alias("cur"))
        walkers = pin(
            walkers.join(prop.select("wid"), "wid", "semi")
            .join(moved.select("wid"), "wid", "left_anti")
            .join(absorbed, "cur", "left_anti")
            .unionByName(moved),
            "walkers",
        )
        gone = selected.select(F.col("u").alias("id")).unionByName(
            selected.select(F.col("t").alias("id"))
        )
        free = pin(free.join(gone, "id", "left_anti"), "free")
    w1 = matched.where(F.col("color") == 0).agg(F.sum("weight")).collect()[0][0] or 0.0
    w2 = matched.where(F.col("color") == 1).agg(F.sum("weight")).collect()[0][0] or 0.0
    keep = 0 if w1 >= w2 else 1
    out = matched.where(F.col("color") == keep).select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"), "weight"
    )
    result = out.localCheckpoint(eager=True)
    sym.unpersist()
    pin.close()
    return result
