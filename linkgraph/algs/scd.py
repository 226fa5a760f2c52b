"""Selective community detection — seed-set expansion via personalized
PageRank + conductance sweep.

Reference parity: scd/PageRankNibble.cpp (Andersen–Chung–Lang style: run
(approximate) personalized PageRank from the seed, order vertices by
rank/degree, take the prefix minimizing conductance). The reference's
push-based APR is a sequential priority loop; the distributed twin runs
PPR as teleport-to-seed power iteration (same fixed point), and the sweep
is a window over the PPR SUPPORT — the localized non-zero set, thousands
of rows even on a web graph, never the full vertex table. The support is
explicitly capped (``max_support``) so the sweep's sort is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def personalized_pagerank(
    graph: Graph,
    seeds: list,
    alpha: float = 0.15,
    tol: float = 1e-8,
    max_iter: int = 60,
) -> DataFrame:
    """(id, rank) — PageRank with teleport restricted to ``seeds``
    (uniform over the seed set). Sparse state: only vertices with nonzero
    rank appear (the PPR support), so supersteps cost O(support·deg), not
    O(n) — the distributed analogue of push-based locality."""
    spark = graph.edges.sparkSession
    sym = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    )
    out_w = sym.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    e = (
        sym.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
        .persist()
    )
    s = 1.0 / len(seeds)
    seed_df = spark.createDataFrame(
        [(int(v), s) for v in seeds], "id bigint, teleport double"
    ).persist()
    rank = seed_df.select("id", F.col("teleport").alias("rank"))
    for it in range(max_iter):
        spread = (
            rank.join(e, rank.id == e.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("frac") * (1.0 - alpha)).alias("m"))
        )
        new = (
            spread.join(seed_df, "id", "full")
            .select(
                "id",
                (
                    F.coalesce("m", F.lit(0.0))
                    + F.lit(alpha) * F.coalesce("teleport", F.lit(0.0))
                ).alias("rank"),
            )
            .where(F.col("rank") > 0)
            .localCheckpoint(eager=True)
        )
        # convergence scan every 4th iteration only — the scan is a full
        # join + driver collect, 4x the cost of the superstep itself at
        # small support; the geometric (1-alpha) contraction means at most
        # 3 extra cheap iterations past the tol crossing
        if tol > 0 and (it % 4 == 3 or it == max_iter - 1):
            delta = (
                new.join(rank.withColumnRenamed("rank", "old"), "id", "full")
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce("rank", F.lit(0.0))
                            - F.coalesce("old", F.lit(0.0))
                        )
                    )
                )
                .collect()[0][0]
            )
            rank = new
            if delta is not None and delta < tol:
                break
        else:  # fixed-iteration mode (tol=0): no per-iter convergence scan
            rank = new
    e.unpersist()
    return rank


def pagerank_nibble(
    graph: Graph,
    seeds: list,
    alpha: float = 0.15,
    max_support: int = 10_000,
    tol: float = 1e-8,
    max_iter: int = 60,
    round_rank: int | None = None,
) -> DataFrame:
    """(id,) — the community around ``seeds``: the prefix of the
    rank/degree-ordered PPR support with minimum conductance
    (scd/PageRankNibble.cpp). The sweep's running sums are a window over
    at most ``max_support`` rows (top support by rank), explicitly
    bounded — never a full-table sort.

    ``tol=0`` + ``max_iter`` runs the PPR at a fixed iteration count and
    ``round_rank`` quantizes ranks before the sweep key — together they
    make the whole sweep (exact integer-weight vol/cut arithmetic over
    rounded ranks) bit-replayable by the DuckDB gate oracle
    (gate_sql.nibble_sql). Defaults keep the converged float path."""
    ppr = personalized_pagerank(
        graph, seeds, alpha=alpha, tol=tol, max_iter=max_iter
    )
    if round_rank is not None:
        ppr = ppr.select("id", F.round("rank", round_rank).alias("rank"))
    # WEIGHTED degree throughout: vol, cut and 2m must share one unit or
    # the sweep denominators disagree on weighted graphs
    deg = graph.remove_self_loops().degrees().select(
        "id", F.col("weighted_degree").alias("wdeg")
    )
    two_m = float(
        graph.symmetric_edges().agg(F.sum("weight")).collect()[0][0] or 0.0
    )
    support = (
        ppr.join(deg, "id")
        .where(F.col("wdeg") > 0)
        .select("id", (F.col("rank") / F.col("wdeg")).alias("key"), "wdeg")
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(max_support)
        .localCheckpoint(eager=True)
    )
    # prefix volume: running sum of weighted degree in sweep order
    w = Window.orderBy(F.desc("key"), F.asc("id"))
    pref = support.select(
        "id",
        F.row_number().over(w).alias("pos"),
        F.sum("wdeg").over(w).alias("vol"),
    ).persist()
    # cut(prefix) = vol(prefix) − 2·internal_edges(prefix): count internal
    # edges per prefix via the LATER endpoint's position.
    sym = graph.symmetric_edges().where(F.col("src") < F.col("dst"))
    pe = (
        sym.join(pref.select(F.col("id").alias("src"), F.col("pos").alias("pu")), "src")
        .join(pref.select(F.col("id").alias("dst"), F.col("pos").alias("pv")), "dst")
        .select(F.greatest("pu", "pv").alias("pos"), "weight")
        .groupBy("pos")
        .agg(F.sum("weight").alias("closed"))
    )
    # internal(prefix k) = Σ_{pos ≤ k} closed — another bounded window
    sweep = (
        pref.join(pe, "pos", "left")
        .withColumn(
            "internal",
            F.sum(F.coalesce("closed", F.lit(0.0))).over(
                Window.orderBy("pos")
            ),
        )
        .select(
            "id",
            "pos",
            "vol",
            (F.col("vol") - 2.0 * F.col("internal")).alias("cut"),
        )
    )
    denom = F.least(F.col("vol"), F.lit(two_m) - F.col("vol"))
    sweep = sweep.withColumn(
        "cond",
        F.when(denom > 0, F.col("cut") / denom).otherwise(F.lit(1.0)),
    )
    best = (
        sweep.orderBy(F.asc("cond"), F.asc("pos")).limit(1).collect()
    )
    pref.unpersist()
    if not best:
        return graph.nodes().select("id").limit(0)
    k = best[0]["pos"]
    return sweep.where(F.col("pos") <= k).select("id")


def conductance_of(graph: Graph, members: DataFrame) -> float:
    """Scalar conductance of a vertex set (scd quality helper)."""
    sym = graph.symmetric_edges()
    m = members.select("id")
    lab = sym.join(
        m.withColumnRenamed("id", "src").withColumn("in_s", F.lit(1)), "src", "left"
    ).join(
        m.withColumnRenamed("id", "dst").withColumn("in_t", F.lit(1)), "dst", "left"
    )
    row = lab.agg(
        F.sum(F.when(F.col("in_s").isNotNull(), F.col("weight")).otherwise(0.0)).alias("vol"),
        F.sum(
            F.when(
                F.col("in_s").isNotNull() & F.col("in_t").isNull(), F.col("weight")
            ).otherwise(0.0)
        ).alias("cut"),
        F.sum("weight").alias("two_m"),
    ).collect()[0]
    vol, cut, two_m = row["vol"] or 0.0, row["cut"] or 0.0, row["two_m"] or 0.0
    denom = min(vol, two_m - vol)
    return float(cut / denom) if denom > 0 else 1.0
