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
  damper), then ``xxhash64(id, label)``, then label id. The hash term
  replaces the reference's random tie-breaking with a partition-independent
  pseudo-random pick: a plain smallest-label rule would flood minimum ids
  through the graph and collapse every component into one community
  (observed on karate); a per-NODE hash order breaks that bias with no
  globally preferred label, and being STATIONARY across iterations it
  cannot re-roll settled ties (a per-iteration hash term churned ~100% of
  tie-boundary nodes every superstep without converging).

Plan per superstep (two exchanges): labels ⋈ src-partitioned cached
sym_edges (no edge shuffle) ∪ zero-weight self-votes → groupBy(id,label)
.sum(weight) (partial agg soaks hub skew) → groupBy(id) lexicographic
max_by — the self-vote row carries the node's current label through both
aggregates, so no separate current-label join and no winners-to-state
re-join. Positive edge weights are assumed (a w=0 self-vote must lose to
any real vote), matching the reference's weighted-PLP precondition.
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
    min_frontier_edges: int = 1_000_000,
) -> DataFrame:
    """Return ``(id, label)``; labels are canonicalized to the min member id
    of each community so output is comparable across runs.

    ``update_threshold=None`` applies the reference default θ = n/1e5
    (community/PLP.cpp::run — below 100k nodes that truncates to 0, i.e.
    run to stability, exactly the reference's behavior at that size).

    Active-frontier restriction (the reference's ``activeNodes`` set):
    once fewer than ``active_frontier_frac``·n labels changed in the
    previous superstep, votes are recomputed ONLY for nodes with a moved
    in-neighbor plus nodes whose pending move the parity gate blocked —
    everyone else provably keeps their label, because with an unchanged
    vote table the previous winner still has maximal weight and the
    stationary keep-current/hash tie-break re-elects it. Late supersteps
    therefore join a frontier-sized edge subset (semi-join on the changed
    set, broadcast when small) instead of all m edges. Set the frac to 0
    to disable. The restriction only engages above ``min_frontier_edges``
    stored edges: below that the two extra semi-join stages cost more
    than the row reduction saves (measured 2.2× slower on a 15k-edge
    fixture), while at scale the frontier join is the whole point.

    ``tie_hash="portable"`` swaps the xxhash64 tie-break for the md5-based
    portable hash (linkgraph.portable) so the run unrolls to an EXACT
    DuckDB SQL oracle — identical labels, ~10× slower hash; the default
    stays xxhash64 for production runs."""
    from linkgraph.portable import phash

    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_plp_")
    # hash-partition the static edge table on the join key ONCE (the
    # pagerank.py:39 discipline): every superstep's labels ⋈ edges then
    # reuses the cached partitioning instead of re-shuffling all m edges
    # per round — per-superstep shuffle volume is O(n) state, not O(m).
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .repartition("src")
        .persist()
    )
    n = graph.nodes().count()
    if active_frontier_frac > 0 and graph.edges.count() < min_frontier_edges:
        active_frontier_frac = 0.0
    if update_threshold is None:
        update_threshold = int(n / 1e5)
    last_changed: list = [None]  # set by metric(); None until round 1 done
    # STATIONARY per-node tie order: hash(id, label), NOT hash(label,
    # iteration). A per-iteration hash re-rolls every tied vote each
    # superstep — on tie-dense graphs (boundary nodes with equal-weight
    # neighbor communities) that re-roll churned thousands of labels per
    # round forever (observed: 4992/5000 nodes changing at iteration 20 on
    # the sf0.1 doc graph). With a fixed per-(node,label) order, a node
    # that adopts its tie-winner re-elects it next round via the
    # keep-current term (same vote table → same max), so tie churn is
    # impossible; and because the order is node-local, no label is
    # globally tie-preferred — the min-id/global-permutation flooding
    # bias the hash was introduced to prevent stays prevented.
    tie = (
        (lambda: phash(F.col("id"), F.col("label")))
        if tie_hash == "portable"
        else (lambda: F.xxhash64("id", "label"))
    )

    gate_hash = (
        (lambda k: F.pmod(phash(F.col("id"), F.lit(k)), F.lit(2)))
        if tie_hash == "portable"
        else (lambda k: F.pmod(F.xxhash64("id", F.lit(k)), F.lit(2)))
    )

    def init() -> DataFrame:
        return graph.nodes().select(
            "id",
            F.col("id").alias("label"),
            F.lit(1).alias("changed"),
            F.lit(0).alias("blocked"),
        )

    def step(state: DataFrame, k: int) -> DataFrame:
        labels = state.select("id", "label")
        edges_k = sym
        if (
            last_changed[0] is not None
            and last_changed[0] < active_frontier_frac * n
        ):
            # recompute votes for: nodes with a moved in-neighbor, plus
            # nodes whose pending move the parity gate blocked last round
            chg = state.where(F.col("changed") == 1).select("id")
            blocked = state.where(F.col("blocked") == 1).select(
                F.col("id").alias("dst")
            )
            # no distinct: a left-semi probe side needs no dedup, and
            # skipping it saves one shuffle per superstep
            active = (
                sym.join(chg.withColumnRenamed("id", "src"), "src", "semi")
                .select("dst")
                .unionByName(blocked)
            )
            edges_k = sym.join(active, "dst", "semi")
        # Self-vote trick: instead of joining the current-label table into
        # the vote rows (one n-row join per superstep) and left-joining
        # the winners back onto the state (another), every node unions ONE
        # zero-weight vote for its own current label into the message
        # stream. After the (id, label) aggregation the self row makes the
        # current label a candidate carrying is_cur=1, so the same
        # lexicographic max key applies — and the old label rides the same
        # aggregate out via max(label where is_cur). Two exchanges per
        # superstep total (groupBy (id,label), groupBy id) instead of
        # five; the two joins this removes are the ones that grew with n.
        # Semantics are identical for POSITIVE edge weights (the engine's
        # invariant, as in the reference): a w=0 self-vote can only win
        # when the node has no real votes at all — exactly the old
        # coalesce(best, old) keep-label path (frontier-restricted and
        # isolated nodes).
        msgs = (
            labels.join(edges_k, labels.id == edges_k.src)
            .select(
                F.col("dst").alias("id"),
                "label",
                F.col("weight").alias("w"),
                F.lit(0).alias("self"),
            )
            .unionByName(
                labels.select(
                    "id",
                    "label",
                    F.lit(0.0).alias("w"),
                    F.lit(1).alias("self"),
                )
            )
        )
        votes = msgs.groupBy("id", "label").agg(
            F.sum("w").alias("w"), F.max("self").alias("is_cur")
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
        best = votes.groupBy("id").agg(
            F.max_by(
                "label",
                F.struct(
                    F.col("w"),
                    F.col("is_cur"),
                    F.bitwise_not(tie()),
                    F.bitwise_not(F.col("label")),
                ),
            ).alias("win"),
            # the node's current label rides the same aggregate out (its
            # self row is the unique is_cur group) — no state re-join
            F.max(F.when(F.col("is_cur") == 1, F.col("label"))).alias("old"),
        )
        # parity dampening (the PLM discipline, plm.py:124): only the
        # gate==0 pseudo-random half applies its pending move per round —
        # synchronous all-at-once application 2-cycles on symmetric
        # structures (an isolated edge swaps labels forever; observed as
        # 100% churn on the doc graph). The gate hash is FRESH per round
        # (a fixed split can sustain A<->B oscillation); gate-BLOCKED
        # pending moves are counted in the convergence metric alongside
        # applied moves, so metric==0 provably means no node anywhere
        # wants to move — no same-round complementary pass, no extra
        # aggregate, single-scan superstep plan.
        pre = best.select(
            "id",
            "old",
            F.col("win"),
            gate_hash(k).alias("g"),
        ).withColumn("pend", (F.col("win") != F.col("old")).cast("int"))
        moved = (F.col("pend") == 1) & (F.col("g") == 0)
        return pre.select(
            "id",
            F.when(moved, F.col("win")).otherwise(F.col("old")).alias("label"),
            F.when(moved, 1).otherwise(0).alias("changed"),
            F.when((F.col("pend") == 1) & ~moved, 1).otherwise(0).alias("blocked"),
        )

    # applied moves + gate-deferred pending moves: 0 ⇔ fully stable
    # (every pending node gets gate==0 with fresh hashes within a couple of
    # rounds, so deferral cannot stall convergence). Observed during the
    # superstep materialization job itself — one action per superstep.
    metric_exprs = [F.sum("changed").alias("c"), F.sum("blocked").alias("b")]

    def metric_of(row: dict) -> float:
        m = float((row["c"] or 0) + (row["b"] or 0))
        last_changed[0] = m
        return m

    result = Superstep(spark, work_dir, "plp").run(
        init,
        step,
        tol=float(update_threshold),
        max_iter=max_iter,
        resume=resume,
        metric_exprs=metric_exprs,
        metric_of=metric_of,
    )
    sym.unpersist()
    return canonicalize_labels(result.state)


def canonicalize_labels(labels: DataFrame) -> DataFrame:
    """Relabel every community to its minimum member id (the canonical form
    used by tests, oracles, and partition comparison — FIXTURES.md §3)."""
    canon = labels.groupBy("label").agg(F.min("id").alias("canon"))
    return labels.join(canon, "label").select("id", F.col("canon").alias("label"))
