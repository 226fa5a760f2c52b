"""LouvainMapEquation — community detection minimizing the map equation.

Reference parity: community/LouvainMapEquation.cpp (Infomap objective
inside a Louvain-style move/coarsen loop). The two-level map equation for
an undirected graph with visit rates p_i = k_i/2W, community exit rates
q_c = cut(c)/2W and p_c = vol(c)/2W is

    L(M) = plogp(q_T) − 2·Σ_c plogp(q_c) + Σ_c plogp(q_c + p_c)
           − Σ_i plogp(p_i),        q_T = Σ_c q_c,  plogp(x) = x·log2(x)

(the Σ_i term is partition-independent). The move phase mirrors
linkgraph/algs/plm.py — synchronous rounds, hash-parity dampening with
complementary-half termination, lexicographic tie-breaks — but scores
each candidate move by the EXACT ΔL it induces, which needs only the
same per-round aggregates PLM already computes plus per-community cut:

    moving i (degree k_i, self-degree 0) from d to c changes
      cut(d') = cut(d) − k_i + 2·w(i→d\\{i}),  vol(d') = vol(d) − k_i
      cut(c') = cut(c) + k_i − 2·w(i→c),       vol(c') = vol(c) + k_i

so ΔL is a closed form over (w(i→c), w(i→d), k_i, vol/cut of c and d,
q_T). Everything stays one wedge join + hash aggs per round; coarsening
and multi-level recursion reuse linkgraph.algs.community.coarsen.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from linkgraph.algs.community import coarsen
from linkgraph.algs.plp import canonicalize_labels
from linkgraph.graph import Graph


def _plogp(col):
    return F.when(col > 0, col * F.log2(col)).otherwise(F.lit(0.0))


def map_equation(graph: Graph, labels: DataFrame) -> float:
    """Two-level map-equation code length L(M) in bits (lower is better);
    labels: (id, label). Scalar quality twin of Modularity.getQuality."""
    sym = graph.symmetric_edges().persist()
    two_w = float(sym.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if two_w == 0.0:
        sym.unpersist()
        return 0.0
    lab = labels.select("id", "label")
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(
                F.col("weight")
            )
        ).alias("k")
    )
    vols = (
        lab.join(deg, "id").groupBy("label").agg(F.sum("k").alias("vol"))
    )
    # internal weight per community (both directions counted => 2·w_in)
    internal2 = (
        sym.where(F.col("src") != F.col("dst"))
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "ld"), "dst")
        .where(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.sum("weight").alias("w2"))
    )
    self_w = (
        sym.where(F.col("src") == F.col("dst"))
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "ls"), "src")
        .groupBy(F.col("ls").alias("label"))
        .agg((2.0 * F.sum("weight")).alias("sw"))
    )
    comm = (
        vols.join(internal2, "label", "left")
        .join(self_w, "label", "left")
        .select(
            "label",
            (F.col("vol") / two_w).alias("p"),
            (
                (
                    F.col("vol")
                    - F.coalesce("w2", F.lit(0.0))
                    - F.coalesce("sw", F.lit(0.0))
                )
                / two_w
            ).alias("q"),
        )
    )
    row = comm.agg(
        F.sum("q").alias("qt"),
        F.sum(_plogp(F.col("q"))).alias("sq"),
        F.sum(_plogp(F.col("q") + F.col("p"))).alias("sqp"),
    ).collect()[0]
    qt, sq, sqp = (float(row[c] or 0.0) for c in ("qt", "sq", "sqp"))
    pv = deg.select((F.col("k") / two_w).alias("p"))
    spi = float(pv.agg(F.sum(_plogp(F.col("p")))).collect()[0][0] or 0.0)
    sym.unpersist()
    qt_term = qt * math.log2(qt) if qt > 0 else 0.0
    return qt_term - 2.0 * sq + sqp - spi


def _move_phase_mapeq(
    graph: Graph, max_rounds: int, two_w: float, portable: bool
) -> DataFrame:
    """One map-equation move phase; returns (id, community). Same round
    structure as plm._local_move, ΔL candidate scoring."""
    from linkgraph.iterutil import Pin

    pin = Pin(graph.edges.sparkSession, "mapeq_move")
    sym = graph.symmetric_edges().persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(
                F.col("weight")
            )
        ).alias("k")
    ).persist()
    labels = deg.select("id", F.col("id").alias("community")).localCheckpoint(
        eager=True
    )
    tw = float(two_w)
    for t in range(max_rounds):
        lab = labels.select("id", "community")
        stats = (
            lab.join(deg, "id").groupBy("community").agg(F.sum("k").alias("vol"))
        )
        internal2 = (
            sym.where(F.col("src") != F.col("dst"))
            .join(lab.withColumnRenamed("id", "src").withColumnRenamed("community", "cs"), "src")
            .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("community", "cd"), "dst")
            .where(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("community"))
            .agg(F.sum("weight").alias("w2"))
        )
        self2 = (
            sym.where(F.col("src") == F.col("dst"))
            .join(lab.withColumnRenamed("id", "src").withColumnRenamed("community", "cs"), "src")
            .groupBy(F.col("cs").alias("community"))
            .agg((2.0 * F.sum("weight")).alias("sw"))
        )
        cstat = (
            stats.join(internal2, "community", "left")
            .join(self2, "community", "left")
            .select(
                "community",
                "vol",
                (
                    F.col("vol")
                    - F.coalesce("w2", F.lit(0.0))
                    - F.coalesce("sw", F.lit(0.0))
                ).alias("cut"),
            )
        )
        qt = float(
            cstat.agg(F.sum("cut")).collect()[0][0] or 0.0
        ) / tw
        w_ic = (
            sym.where(F.col("src") != F.col("dst"))
            .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("community", "c"), "dst")
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("weight").alias("w"))
        )
        own = lab.select("id", F.col("community").alias("c")).withColumn(
            "w0", F.lit(0.0)
        )
        cands = (
            w_ic.join(own.select("id", "c", "w0"), ["id", "c"], "full")
            .select("id", "c", F.coalesce("w", "w0", F.lit(0.0)).alias("w"))
        )
        # candidate rows joined with: own community d stats, w(i→d), target
        # c stats, k_i — everything ΔL needs
        w_own = (
            cands.join(lab, "id")
            .where(F.col("c") == F.col("community"))
            .select("id", F.col("w").alias("wd"))
        )
        plogp = _plogp
        base = (
            cands.join(lab, "id")
            .join(deg, "id")
            .join(w_own, "id", "left")
            .join(
                cstat.withColumnRenamed("community", "c")
                .withColumnRenamed("vol", "vol_c")
                .withColumnRenamed("cut", "cut_c"),
                "c",
            )
            .join(
                cstat.withColumnRenamed("community", "community")
                .withColumnRenamed("vol", "vol_d")
                .withColumnRenamed("cut", "cut_d"),
                "community",
            )
            .withColumn("wd", F.coalesce("wd", F.lit(0.0)))
        )
        # post-move community terms (normalized by 2W); moving i out of d
        # and into c (no-op candidates c == d yield delta exactly 0)
        is_own = F.col("c") == F.col("community")
        cut_c2 = F.when(is_own, F.col("cut_c")).otherwise(
            F.col("cut_c") + F.col("k") - 2.0 * F.col("w")
        )
        vol_c2 = F.when(is_own, F.col("vol_c")).otherwise(F.col("vol_c") + F.col("k"))
        cut_d2 = F.when(is_own, F.col("cut_d")).otherwise(
            F.col("cut_d") - F.col("k") + 2.0 * F.col("wd")
        )
        vol_d2 = F.when(is_own, F.col("vol_d")).otherwise(F.col("vol_d") - F.col("k"))
        q_c, p_c = F.col("cut_c") / tw, F.col("vol_c") / tw
        q_d, p_d = F.col("cut_d") / tw, F.col("vol_d") / tw
        q_c2, p_c2 = cut_c2 / tw, vol_c2 / tw
        q_d2, p_d2 = cut_d2 / tw, vol_d2 / tw
        qt2 = F.lit(qt) - q_c - q_d + q_c2 + q_d2
        old_terms = (
            -2.0 * (plogp(q_c) + plogp(q_d))
            + plogp(q_c + p_c)
            + plogp(q_d + p_d)
        )
        new_terms = (
            -2.0 * (plogp(q_c2) + plogp(q_d2))
            + plogp(q_c2 + p_c2)
            + plogp(q_d2 + p_d2)
        )
        qt_old = plogp(F.lit(qt))
        qt_new = plogp(qt2)
        scored = base.select(
            "id",
            "c",
            "community",
            (-(qt_new - qt_old + new_terms - old_terms)).alias("gain"),
        )
        best = scored.groupBy("id").agg(
            F.max_by(
                "c",
                F.struct(
                    F.col("gain"),
                    (F.col("c") == F.col("community")).cast("int"),
                    F.bitwise_not(F.col("c")),
                ),
            ).alias("target"),
            F.max("community").alias("community"),
            F.max(F.when(F.col("c") != F.col("community"), F.col("gain"))).alias(
                "best_gain"
            ),
        )
        if portable:
            from linkgraph.portable import phash

            gate = F.pmod(phash(F.col("id"), F.lit(t)), F.lit(2))
        else:
            gate = F.pmod(F.xxhash64("id", F.lit(t)), F.lit(2))
        pending = pin(
            best.where(
                (F.col("target") != F.col("community"))
                & (F.col("best_gain") > 1e-12)
            ).select("id", "target", gate.alias("g")),
            "pending",
        )
        movers = pending.where(F.col("g") == 0)
        if movers.isEmpty():
            movers = pending.where(F.col("g") == 1)
            if movers.isEmpty():
                break
        labels = pin(
            labels.join(movers.select("id", "target"), "id", "left")
            .select("id", F.coalesce("target", "community").alias("community"))
        )
    sym.unpersist()
    deg.unpersist()
    labels = labels.localCheckpoint(eager=True)
    pin.close()
    return labels


def louvain_map_equation(
    graph: Graph,
    max_levels: int = 8,
    max_rounds: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(id, label) — canonical (min-member-id) map-equation communities
    via the Louvain loop (move → coarsen → recurse → prolong)."""
    g = Graph(
        graph.symmetric_edges().where(F.col("src") <= F.col("dst")),
        directed=False,
        weighted=True,
    )
    row = g.symmetric_edges().agg(F.sum("weight")).collect()[0]
    two_w = float(row[0] or 0.0)
    if two_w == 0.0:
        return graph.nodes().select("id", F.col("id").alias("label"))
    mapping = graph.nodes().select("id", F.col("id").alias("label"))
    for _level in range(max_levels):
        comm = _move_phase_mapeq(g, max_rounds, two_w, portable)
        n_before = comm.count()
        n_after = comm.select("community").distinct().count()
        mapping = (
            mapping.join(
                comm.withColumnRenamed("id", "label").withColumnRenamed(
                    "community", "new_label"
                ),
                "label",
            )
            .select("id", F.col("new_label").alias("label"))
            .localCheckpoint(eager=True)
        )
        if n_after == n_before:
            break
        g = coarsen(g, comm.select("id", F.col("community").alias("label")))
        g = Graph(g.edges.localCheckpoint(eager=True), directed=False, weighted=True)
    return canonicalize_labels(mapping)
