"""PLM — parallel Louvain method (modularity maximization).

Reference parity: community/PLM.cpp::PLM::run — move phase (each node
greedily joins the neighboring community with the best modularity gain) →
coarsen communities (coarsening/ParallelPartitionCoarsening) → recurse on
the coarse graph → prolong labels back down. The reference's move phase is
asynchronous OpenMP with atomic flips; the distributed formulation is
synchronous rounds with TWO determinism/oscillation guards:

1. parity dampening — in round t only the pseudo-random half with
   pmod(xxhash64(id, t), 2) == 0 may move (synchronous Louvain without
   this oscillates on symmetric structures, the same pathology as sync
   label propagation); when that half has no move, the COMPLEMENTARY
   half of the same round is checked (and moved) — both halves empty is
   a sound convergence proof, with no probabilistic stall window;
2. total-order tie-breaks — (gain desc, community asc) under a window.

Gain of moving i (degree k_i) from community d to c:
    ΔQ ∝ w(i→c) − w(i→d\\{i}) − γ·k_i·(vol(c) − vol(d\\{i}))/(2W)
Comparing candidates for a fixed i, the d-terms are constant, so ranking
maximizes w(i→c) − γ·k_i·vol(c\\{i})/(2W) — one wedge-shaped join +
window per round (the PLP plan plus a community-volume broadcast).

Levels: move-phase fixpoint → coarsen (parallel edge contraction) →
recurse; label prolongation composes the per-level mappings. Coarse
graphs shrink geometrically, so level cost is dominated by level 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.algs.community import coarsen
from linkgraph.algs.plp import canonicalize_labels
from linkgraph.graph import Graph


def _local_move(
    graph: Graph, gamma: float, max_rounds: int, two_w: float,
    init_labels: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """One Louvain move phase on ``graph``; returns (id, community).
    ``init_labels`` (id, community) seeds non-singleton starting labels —
    Leiden's aggregate levels start from the parent community assignment
    rather than singletons. ``portable=True`` swaps the xxhash64 parity
    gate for the md5 portable hash so the whole phase unrolls to DuckDB
    SQL (gate_sql.louvain_sql); xxhash64 stays the cheap default."""
    from linkgraph.iterutil import Pin

    pin = Pin(graph.edges.sparkSession, "plm_move")
    sym = graph.symmetric_edges().persist()
    # volume convention: a self-loop (coarse graphs: contracted intra-
    # community weight) contributes TWICE to its vertex's degree, keeping
    # Σk = 2W invariant across coarsening levels
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(
                F.col("weight")
            )
        ).alias("k")
    ).persist()
    if init_labels is not None:
        labels = (
            deg.select("id")
            .join(init_labels.select("id", "community"), "id", "left")
            .select("id", F.coalesce("community", "id").alias("community"))
            .localCheckpoint(eager=True)
        )
    else:
        labels = deg.select("id", F.col("id").alias("community")).localCheckpoint(eager=True)
    for t in range(max_rounds):
        lab = labels.select("id", "community")
        vol = (
            lab.join(deg, "id")
            .groupBy("community")
            .agg(F.sum("k").alias("vol"))
        )
        # w(i → c): weight from i to each neighboring community
        w_ic = (
            sym.where(F.col("src") != F.col("dst"))
            .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("community", "c"), "dst")
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.sum("weight").alias("w"))
        )
        # candidate set = neighboring communities ∪ own (w=0 if no edge)
        own = lab.select("id", F.col("community").alias("c")).withColumn("w0", F.lit(0.0))
        cands = (
            w_ic.join(own.select("id", "c", "w0"), ["id", "c"], "full")
            .select("id", "c", F.coalesce("w", "w0", F.lit(0.0)).alias("w"))
        )
        scored = (
            cands.join(lab, "id")
            .join(deg, "id")
            .join(vol.withColumnRenamed("community", "c"), "c")
            .select(
                "id",
                "c",
                "community",
                (
                    F.col("w")
                    - F.lit(gamma)
                    * F.col("k")
                    * (F.col("vol") - F.when(F.col("c") == F.col("community"), F.col("k")).otherwise(0.0))
                    / F.lit(two_w)
                ).alias("gain"),
            )
        )
        # same pick order as the former row_number window (desc gain,
        # prefer-current on ties, asc c) as a lexicographic max_by hash-agg
        # — map-side partial combine, no per-vertex sort shuffle.
        # ``community`` is constant per id, so max() carries it through.
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
        )
        # parity dampening: only a pseudo-random half of the vertices move
        # per round (fresh hash per round — a FIXED alternating split can
        # sustain A↔B oscillation on symmetric structures). Termination is
        # made sound (ADVICE r1) by checking the COMPLEMENTARY half of the
        # SAME round when the gated half has no move: the two halves of one
        # round provably cover every vertex, so "both empty" ⇒ converged —
        # no probabilistic stall window.
        if portable:
            from linkgraph.portable import phash

            gate = F.pmod(phash(F.col("id"), F.lit(t)), F.lit(2))
        else:
            gate = F.pmod(F.xxhash64("id", F.lit(t)), F.lit(2))
        # materialize the (small) pending-move set ONCE per round — Pin, not
        # localCheckpoint: the window-bearing plan above regrows per round
        # under localCheckpoint on Spark 4 (analysis-time blowup), and the
        # two isEmpty probes + the label join would each recompute it.
        pending = pin(
            best.where(F.col("target") != F.col("community"))
            .select("id", "target", gate.alias("g")),
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
    # one final durable copy: labels currently reads from the Pin dir,
    # which rotates old generations away — localCheckpoint detaches it.
    labels = labels.localCheckpoint(eager=True)
    pin.close()
    return labels


def louvain(
    graph: Graph,
    gamma: float = 1.0,
    max_levels: int = 8,
    max_rounds: int = 32,
    portable: bool = False,
) -> DataFrame:
    """(id, label) — canonical (min-member-id) Louvain communities."""
    g = Graph(
        graph.symmetric_edges().where(F.col("src") <= F.col("dst")),
        directed=False,
        weighted=True,
    )
    two_w = 0.0
    row = g.symmetric_edges().agg(F.sum("weight")).collect()[0]
    two_w = float(row[0] or 0.0)
    if two_w == 0.0:
        return graph.nodes().select("id", F.col("id").alias("label"))

    mapping = graph.nodes().select("id", F.col("id").alias("label"))
    for _level in range(max_levels):
        comm = _local_move(g, gamma, max_rounds, two_w, portable=portable)
        n_before = comm.count()
        n_after = comm.select("community").distinct().count()
        mapping = (
            mapping.join(
                comm.withColumnRenamed("id", "label").withColumnRenamed("community", "new_label"),
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
