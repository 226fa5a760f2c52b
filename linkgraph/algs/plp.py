"""PLP — label-propagation community detection (synchronous, deterministic).

Reference parity: networkit/cpp/community/PLP.cpp::PLP::run — every node
adopts the (weight-)most-frequent label among its neighbors; iteration stops
when the number of label updates drops below ``update_threshold``. The
reference is ASYNCHRONOUS under OpenMP (in-place updates, run-to-run
nondeterministic). This engine is deliberately synchronous + deterministic
(SURVEY §2A "semantic gap"): acceptance is "exact up to canonical
relabeling" on LP-stable fixtures, plus modularity parity and
parallelism-invariance everywhere else (SURVEY §5.2).

Determinism rules (N-vs-4N result identity, BASELINE.json:14):
- tie-break = highest neighbor-label weight, then current-label preference
  (a node KEEPS its label whenever tied for the max — the synchronous
  stand-in for async "no change if already dominant" and the oscillation
  damper), then ``xxhash64(label, iteration)``, then label id. The hash
  term replaces the reference's random tie-breaking with a seeded,
  partition-independent pseudo-random pick: a plain smallest-label rule
  would flood minimum ids through the graph and collapse every component
  into one community (observed on karate); hashing breaks that bias while
  keeping the order total and deterministic.

Plan per superstep: labels ⋈ sym_edges → groupBy(dst,label).sum(weight)
(partial agg soaks hub skew) → window row_number over (dst) ordered by
(keep-current desc, weight desc, label asc) → changed count.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import Superstep


def label_propagation(
    graph: Graph,
    max_iter: int = 100,
    update_threshold: int | None = None,
    work_dir: str | None = None,
    resume: bool = False,
    tie_hash: str = "xxhash64",
    active_frontier_frac: float = 0.25,
) -> DataFrame:
    """Return ``(id, label)``; labels are canonicalized to the min member id
    of each community so output is comparable across runs.

    ``update_threshold=None`` applies the reference default θ = n/1e5
    (community/PLP.cpp::run — below 100k nodes that truncates to 0, i.e.
    run to stability, exactly the reference's behavior at that size).

    Active-frontier restriction (the reference's ``activeNodes`` set):
    once fewer than ``active_frontier_frac``·n labels changed in the
    previous superstep, votes are recomputed ONLY for nodes with a changed
    in-neighbor — everyone else provably keeps their label, because with
    an unchanged vote table the previous winner still has maximal weight
    and the keep-current tie-break re-elects it independent of the
    per-iteration hash term. Late supersteps therefore join a
    frontier-sized edge subset (semi-join on the changed set, broadcast
    when small) instead of all m edges. Set the frac to 0 to disable.

    ``tie_hash="portable"`` swaps the xxhash64 tie-break for the md5-based
    portable hash (linkgraph.portable) so the run unrolls to an EXACT
    DuckDB SQL oracle — identical labels, ~10× slower hash; the default
    stays xxhash64 for production runs."""
    from linkgraph.portable import phash

    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_plp_")
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    n = graph.nodes().count()
    if update_threshold is None:
        update_threshold = int(n / 1e5)
    last_changed: list = [None]  # set by metric(); None until round 1 done
    tie = (
        (lambda k: phash(F.col("label"), F.lit(k)))
        if tie_hash == "portable"
        else (lambda k: F.xxhash64(F.col("label"), F.lit(k)))
    )

    def init() -> DataFrame:
        return graph.nodes().select(
            "id", F.col("id").alias("label"), F.lit(1).alias("changed")
        )

    def step(state: DataFrame, k: int) -> DataFrame:
        labels = state.select("id", "label")
        edges_k = sym
        if (
            last_changed[0] is not None
            and last_changed[0] < active_frontier_frac * n
        ):
            chg = state.where(F.col("changed") == 1).select("id")
            active = (
                sym.join(chg.withColumnRenamed("id", "src"), "src", "semi")
                .select("dst")
                .distinct()
            )
            edges_k = sym.join(active, "dst", "semi")
        votes = (
            labels.join(edges_k, labels.id == edges_k.src)
            .groupBy(F.col("dst").alias("id"), "label")
            .agg(F.sum("weight").alias("w"))
        )
        cur = labels.select("id", F.col("label").alias("cur_label"))
        ranked = votes.join(cur, "id").withColumn(
            "is_cur", (F.col("label") == F.col("cur_label")).cast("int")
        )
        # vote selection = lexicographic MAX of (w, is_cur, ~tie, ~label):
        # identical tie-break order as the unrolled-SQL oracle (desc w,
        # desc is_cur, asc tie, asc label — bitwise_not is order-reversing
        # on BIGINT), but as a max_by HASH-AGG with map-side partial
        # aggregation instead of a row_number window — one shuffle of the
        # partially-combined vote table, no sort. Measured 1.2x on the
        # overhead-bound sf0.1 doc graph (88 s -> 71 s warm full run);
        # the sort it removes is the part that grows with data, so the
        # gap widens at scale.
        best = ranked.groupBy("id").agg(
            F.max_by(
                "label",
                F.struct(
                    F.col("w"),
                    F.col("is_cur"),
                    F.bitwise_not(tie(k)),
                    F.bitwise_not(F.col("label")),
                ),
            ).alias("best")
        )
        # isolated nodes (no votes) keep their label
        return (
            state.select("id", F.col("label").alias("old"))
            .join(best, "id", "left")
            .select(
                "id",
                F.coalesce("best", "old").alias("label"),
                (F.coalesce("best", "old") != F.col("old")).cast("int").alias("changed"),
            )
        )

    def metric(state: DataFrame) -> float:
        m = float(state.agg(F.sum("changed")).collect()[0][0] or 0)
        last_changed[0] = m
        return m

    result = Superstep(spark, work_dir, "plp").run(
        init,
        step,
        metric,
        tol=float(update_threshold),
        max_iter=max_iter,
        resume=resume,
    )
    sym.unpersist()
    return canonicalize_labels(result.state)


def canonicalize_labels(labels: DataFrame) -> DataFrame:
    """Relabel every community to its minimum member id (the canonical form
    used by tests, oracles, and partition comparison — FIXTURES.md §3)."""
    canon = labels.groupBy("label").agg(F.min("id").alias("canon"))
    return labels.join(canon, "label").select("id", F.col("canon").alias("label"))
