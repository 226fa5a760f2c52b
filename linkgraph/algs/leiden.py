"""ParallelLeiden — Louvain move phase + connectivity-guaranteeing
refinement (Traag/Waltman/van Eck 2019; reference parity:
community/ParallelLeiden.cpp).

Louvain's known defect is arbitrarily badly-connected (even disconnected)
communities: the move phase can hollow out a community's interior while
its id lives on. Leiden inserts a REFINEMENT phase between move and
coarsen: within each move-phase community, vertices re-cluster from
singletons, a vertex only ever joining a refined sub-community it has
positive edge weight into — every refined community is therefore
connected by construction. Coarsening contracts the REFINED partition
(not the move partition), and the next level's move phase starts from the
move-phase communities instead of singletons.

Distributed formulation (deterministic, synchronous — same guards as
linkgraph/algs/plm.py):
- refinement rounds: only vertices still in a SINGLETON refined community
  may merge (the standard parallel-Leiden simplification: merges only
  grow non-singleton targets, preserving the connectivity invariant and
  making rounds commutative), into the best positive-gain sub-community
  of their move-phase community (gain = w(i→S) − γ·k_i·vol(S)/2W under a
  (gain desc, target asc) total order with alternating hash-parity
  dampening);
- plan per round: labels⋈edges wedge join filtered to same parent
  community → candidate agg → window pick — the PLP/PLM plan family, all
  partial-agg shuffles on vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.algs.community import coarsen
from linkgraph.algs.plm import _local_move
from linkgraph.algs.plp import canonicalize_labels
from linkgraph.graph import Graph


def _refine(
    graph: Graph, comm: DataFrame, gamma: float, two_w: float, max_rounds: int = 16,
    portable: bool = False,
) -> DataFrame:
    """(id, ref) — refined partition; every refined community is a
    connected subset of one move-phase community.

    Loop state is pinned with a parquet round-trip (linkgraph.iterutil):
    localCheckpoint does not truncate this window-bearing plan on Spark
    4.1 and per-round cost grows ~5× (measured) without it."""
    from linkgraph.iterutil import Pin

    pin = Pin(graph.edges.sparkSession, "leiden_refine")
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    deg = graph.symmetric_edges().groupBy(F.col("src").alias("id")).agg(
        F.sum(
            F.when(F.col("src") == F.col("dst"), 2.0 * F.col("weight")).otherwise(
                F.col("weight")
            )
        ).alias("k")
    ).persist()
    base = comm.select("id", F.col("community").alias("parent"))
    ref = pin(base.select("id", F.col("id").alias("ref"), "parent"), "ref")
    for t in range(max_rounds):
        sizes = ref.groupBy("ref").agg(F.count("*").alias("sz"))
        state = ref.join(sizes, "ref")
        # candidate targets: refined communities of neighbors in the SAME
        # parent community, with positive connection weight (w > 0 is what
        # guarantees every refined community stays connected)
        cand = (
            sym.join(
                state.select(F.col("id").alias("dst"), F.col("ref").alias("tref"),
                             F.col("parent").alias("tparent")),
                "dst",
            )
            .join(
                state.select(F.col("id").alias("src"), F.col("ref").alias("sref"),
                             F.col("parent").alias("sparent"), F.col("sz").alias("ssz")),
                "src",
            )
            .where(
                (F.col("sparent") == F.col("tparent"))
                & (F.col("sref") != F.col("tref"))
                & (F.col("ssz") == 1)  # only singleton vertices move
            )
            .groupBy(F.col("src").alias("id"), F.col("tref").alias("target"))
            .agg(F.sum("weight").alias("w"))
        )
        vol = (
            ref.join(deg, "id").groupBy("ref").agg(F.sum("k").alias("vol"))
        )
        scored = (
            cand.join(deg, "id")
            .join(vol.withColumnRenamed("ref", "target"), "target")
            .select(
                "id",
                "target",
                (
                    F.col("w")
                    - F.lit(gamma) * F.col("k") * F.col("vol") / F.lit(two_w)
                ).alias("gain"),
            )
            .where(F.col("gain") > 0)
        )
        # lexicographic max_by replaces the row_number window (same pick
        # order: desc gain, asc target via order-reversing bitwise_not) —
        # hash-agg with map-side combine, no per-vertex sort shuffle
        ranked = pin(
            scored.groupBy("id").agg(
                F.max_by(
                    "target",
                    F.struct(F.col("gain"), F.bitwise_not(F.col("target"))),
                ).alias("target")
            ),
            "ranked",
        )
        if portable:
            from linkgraph.portable import phash

            gate = F.pmod(phash(F.col("id")), F.lit(2))
        else:
            gate = F.pmod(F.xxhash64("id"), F.lit(2))
        movers = ranked.where(gate == F.lit(t % 2)).select("id", "target")
        if movers.isEmpty():
            # complementary parity: the two halves of one round cover all
            movers = ranked.where(gate == F.lit((t + 1) % 2)).select("id", "target")
            if movers.isEmpty():
                break
        ref = pin(
            ref.join(movers, "id", "left").select(
                "id", F.coalesce("target", "ref").alias("ref"), "parent"
            ),
            "ref",
        )
    sym.unpersist()
    deg.unpersist()
    # NOTE: the Pin dir is left for the OS tempdir cleanup — the returned
    # frame still scans its parquet lazily, so deleting it here would race
    return ref.select("id", "ref")


def leiden(
    graph: Graph,
    gamma: float = 1.0,
    max_levels: int = 8,
    max_rounds: int = 32,
    refine_rounds: int = 16,
    portable: bool = False,
) -> DataFrame:
    """(id, label) — canonical (min-member-id) Leiden communities.
    ``portable=True`` swaps both parity gates (move + refine) to the md5
    portable hash so the run replays as unrolled DuckDB SQL
    (gate_sql.leiden_sql); xxhash64 stays the cheap default."""
    g = Graph(
        graph.symmetric_edges().where(F.col("src") <= F.col("dst")),
        directed=False,
        weighted=True,
    )
    row = g.symmetric_edges().agg(F.sum("weight")).collect()[0]
    two_w = float(row[0] or 0.0)
    if two_w == 0.0:
        return graph.nodes().select("id", F.col("id").alias("label"))

    # mapping: original id → current coarse vertex; comm_of: coarse vertex
    # → current community (the final labels once the loop stops)
    mapping = graph.nodes().select("id", F.col("id").alias("v"))
    init = None
    for _level in range(max_levels):
        comm = _local_move(g, gamma, max_rounds, two_w, init_labels=init, portable=portable)
        ref = _refine(g, comm, gamma, two_w, max_rounds=refine_rounds, portable=portable)
        n_before = ref.count()
        n_after = ref.select("ref").distinct().count()
        final = mapping.join(
            comm.withColumnRenamed("id", "v"), "v"
        ).select("id", F.col("community").alias("label"))
        if n_after == n_before:
            return canonicalize_labels(final)
        # contract the REFINED partition; carry the move-phase community of
        # each refined block as the next level's initial assignment
        ref_lab = ref.select("id", F.col("ref").alias("label"))
        g = coarsen(g, ref_lab)
        g = Graph(g.edges.localCheckpoint(eager=True), directed=False, weighted=True)
        init = (
            ref.join(comm, "id")
            .groupBy(F.col("ref").alias("id"))
            .agg(F.min("community").alias("community"))
            .localCheckpoint(eager=True)
        )
        mapping = (
            mapping.join(ref.withColumnRenamed("id", "v"), "v")
            .select("id", F.col("ref").alias("v"))
            .localCheckpoint(eager=True)
        )
    final = mapping.join(
        _local_move(g, gamma, max_rounds, two_w, init_labels=init, portable=portable)
        .withColumnRenamed("id", "v"),
        "v",
    ).select("id", F.col("community").alias("label"))
    return canonicalize_labels(final)
