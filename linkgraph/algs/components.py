"""Connected components via iterative label-min propagation (hash-to-min).

Reference parity: networkit/cpp/components/ConnectedComponents.cpp (BFS per
component, sequential) and ParallelConnectedComponents.cpp (shared-memory
label propagation). The reference's *parallel* formulation IS the Spark
formulation: every vertex starts labeled with its own id; each superstep
every vertex takes the min label over itself and its neighbors; fixpoint in
O(diameter) supersteps (BASELINE.json:14 names exactly this algorithm).

Plan per superstep (one exchange): changed-vertex labels ⋈ src-partitioned
cached sym_edges (co-partitioned, no edge shuffle) ∪ every vertex's own
(label, self-marker) row → groupBy(id).agg(min(label), old=label of the
self row) → changed flag from old vs new. The delta frontier is exact,
not heuristic: hash-to-min labels only decrease and the per-vertex min is
cumulative, so a neighbor whose label did NOT change this round was
already absorbed in an earlier round — re-delivering it cannot lower
anything. Late supersteps (the long tail on high-diameter graphs)
therefore touch only the edges incident to still-moving vertices.

Scale: state is (id, label) — 16 bytes a vertex. Web-scale diameters are
small (~tens); for pathological high-diameter graphs the large-star/
small-star variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) halves round count; plain hash-to-min is the default
because the oracle (recursive-CTE min-label) matches it exactly.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import Superstep


def connected_components(
    graph: Graph,
    work_dir: str | None = None,
    max_iter: int = 200,
    resume: bool = False,
    method: str = "hash-to-min",
) -> DataFrame:
    """Return ``(id, component)`` where component = min vertex id reachable.

    Canonical labeling (min member id) makes results directly comparable
    across runs, parallelism levels, and the DuckDB oracle — the
    "exact up to canonical relabeling" contract is free.

    ``method="star"`` switches to the alternating large-star/small-star
    algorithm (:func:`connected_components_star`) — O(log² n) rounds
    independent of diameter, for pathological high-diameter graphs;
    identical labels. ``"hash-to-min"`` (default) is O(diameter) rounds
    with an exact delta frontier and wins on low-diameter web graphs.
    """
    if method == "star":
        return connected_components_star(
            graph, work_dir=work_dir, max_iter=max_iter, resume=resume
        )
    if method != "hash-to-min":
        raise ValueError(f"unknown method {method!r}")
    spark = graph.edges.sparkSession
    # hash-partition the static edge table on the join key once (the
    # pagerank.py discipline): the per-superstep frontier join reuses the
    # cached partitioning instead of re-shuffling the edges every round.
    sym = (
        graph.symmetric_edges().select("src", "dst").repartition("src").persist()
    )
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_cc_")

    def init() -> DataFrame:
        return graph.nodes().select(
            "id", F.col("id").alias("label"), F.lit(1).alias("changed")
        )

    def step(state: DataFrame, k: int) -> DataFrame:
        # Exact delta frontier: only vertices whose label changed last
        # round send it to their neighbors (see module docstring for the
        # monotonicity argument). Every vertex also contributes one
        # self-marker row carrying its current label, so min(label) and
        # the old label come out of ONE aggregation — no state re-join,
        # and isolated / frontier-quiet vertices keep their label for
        # free.
        chg = state.where(F.col("changed") == 1).select("id", "label")
        msgs = (
            chg.join(sym, chg.id == sym.src)
            .select(
                F.col("dst").alias("id"), "label", F.lit(0).alias("self")
            )
            .unionByName(
                state.select("id", "label", F.lit(1).alias("self"))
            )
        )
        agg = msgs.groupBy("id").agg(
            F.min("label").alias("label"),
            F.max(F.when(F.col("self") == 1, F.col("label"))).alias("old"),
        )
        return agg.select(
            "id",
            "label",
            (F.col("label") != F.col("old")).cast("int").alias("changed"),
        )

    result = Superstep(spark, work_dir, "cc").run(
        init,
        step,
        tol=0.0,
        max_iter=max_iter,
        resume=resume,
        # changed-count observed during the materialization job itself —
        # one driver action per superstep (see superstep.py)
        metric_exprs=[F.sum("changed").alias("c")],
    )
    sym.unpersist()
    return result.state.select("id", F.col("label").alias("component"))


def connected_components_star(
    graph: Graph,
    work_dir: str | None = None,
    max_iter: int = 60,
    resume: bool = False,
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the documented
    low-round-count alternative for HIGH-DIAMETER graphs: O(log² n)
    rounds independent of diameter, vs hash-to-min's O(diameter)
    supersteps. On web graphs (diameter ~tens) hash-to-min's exact delta
    frontier wins on per-round cost, so this stays behind
    ``connected_components(method="star")``.

    State is the evolving pair list (u, v). Each superstep applies one
    large-star pass (every strictly-larger neighbor of u links to
    m(u) = min(Γ(u) ∪ {u})) then one small-star pass (every
    not-larger neighbor plus u itself links to m(u)), both over the
    symmetrized view. At the fixpoint every component is a star centered
    at its minimum id; convergence is detected by two consecutive rounds
    with identical (count, xor-fold fingerprint) of the pair list —
    observed on the materialization job, one action per round.
    Returns ``(id, component)``, identical labels to
    :func:`connected_components`.
    """
    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_ccstar_")
    edges0 = (
        graph.symmetric_edges()
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
    )

    def init() -> DataFrame:
        # symmetric input: both orientations present already
        return edges0.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ).distinct()

    def _sym(p: DataFrame) -> DataFrame:
        return p.unionByName(
            p.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    def _star(p: DataFrame, large: bool) -> DataFrame:
        g = _sym(p)
        m = (
            g.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        j = g.join(m, "u")
        if large:
            out = j.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            out = (
                j.where(F.col("v") <= F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(
                    m.select(F.col("u"), F.col("m").alias("v"))
                )
            )
        return out.where(F.col("u") != F.col("v")).distinct()

    def step(state: DataFrame, k: int) -> DataFrame:
        return _star(_star(state, large=True), large=False)

    # fingerprint-stability convergence: the pair list is a fixpoint of
    # both operators exactly when (count, xor-hash) repeats
    last_fp: list = [None]

    def metric_of(row: dict) -> float:
        fp = (row["n"], row["fp"])
        changed = 0.0 if fp == last_fp[0] else 1.0
        last_fp[0] = fp
        return changed

    result = Superstep(spark, work_dir, "ccstar").run(
        init,
        step,
        tol=0.0,
        max_iter=max_iter,
        resume=resume,
        metric_exprs=[
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("fp"),
        ],
        metric_of=metric_of,
    )
    pairs = result.state  # (v → component min) star edges
    centers_and_isolated = (
        graph.nodes()
        .join(pairs.select(F.col("u").alias("id")), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return (
        pairs.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(centers_and_isolated)
    )


def weakly_connected_components(graph: Graph, **kw) -> DataFrame:
    """WCC of a directed graph — direction is already ignored by
    ``symmetric_edges``, so this is the same computation (free, as SURVEY
    §2A notes for components/WeaklyConnectedComponents.cpp)."""
    return connected_components(graph, **kw)


def strongly_connected_components(
    graph: Graph, max_rounds: int = 100, work_dir: str | None = None
) -> DataFrame:
    """SCC via iterative forward-backward coloring (the distributed
    formulation of components/StronglyConnectedComponents.cpp's Tarjan —
    Tarjan's DFS stack does not distribute; FB-coloring does):

    repeat until no vertices remain: pick pivot = min remaining id per
    color; F = forward-reachable(pivot), B = backward-reachable(pivot);
    F∩B is an SCC; the three remainders (F−B, B−F, rest) recurse, tracked
    with a color column so ALL current subproblems advance in the same
    DataFrame pass (no driver-side recursion per component).
    """
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").distinct().persist()
    remaining = graph.nodes().select("id", F.lit(0).alias("color")).persist()
    result = spark.createDataFrame([], "id bigint, component bigint")

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        # trim: vertices with no in- or no out-edge INSIDE their remaining
        # subgraph are singleton SCCs — resolving them wholesale avoids one
        # pivot round each (dominant on sparse random graphs)
        ids = remaining.select("id")
        induced = (
            e.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        has_out = induced.select(F.col("src").alias("id")).distinct()
        has_in = induced.select(F.col("dst").alias("id")).distinct()
        both = has_out.join(has_in, "id", "left_semi")
        trivial = remaining.join(both, "id", "left_anti").select(
            "id", F.col("id").alias("component")
        )
        result = result.unionByName(trivial).localCheckpoint(eager=True)
        remaining = remaining.join(both, "id", "left_semi").localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
        pivots = remaining.groupBy("color").agg(F.min("id").alias("pivot"))
        state = remaining.join(pivots, "color").select(
            "id", "color", "pivot",
            (F.col("id") == F.col("pivot")).alias("fwd"),
            (F.col("id") == F.col("pivot")).alias("bwd"),
        ).localCheckpoint(eager=True)
        # propagate reachability within each color simultaneously; the
        # grew-probe is ONE sum-aggregate per level against running totals
        # (was two counts on new + two on state = 4 actions/level)
        prev = state.agg(
            F.sum(F.col("fwd").cast("long")).alias("nf"),
            F.sum(F.col("bwd").cast("long")).alias("nb"),
        ).collect()[0]
        prev_nf, prev_nb = prev["nf"] or 0, prev["nb"] or 0
        while True:
            fwd_next = (
                state.where("fwd").join(e, state.id == e.src)
                .select(F.col("dst").alias("id"), "color")
                .distinct()
            )
            bwd_next = (
                state.where("bwd").join(e, state.id == e.dst)
                .select(F.col("src").alias("id"), "color")
                .distinct()
            )
            new = (
                state.alias("s")
                .join(fwd_next.withColumn("nf", F.lit(True)), ["id", "color"], "left")
                .join(bwd_next.withColumn("nb", F.lit(True)), ["id", "color"], "left")
                .select(
                    "id", "color", "pivot",
                    (F.col("fwd") | F.coalesce("nf", F.lit(False))).alias("fwd"),
                    (F.col("bwd") | F.coalesce("nb", F.lit(False))).alias("bwd"),
                )
                .localCheckpoint(eager=True)
            )
            cur = new.agg(
                F.sum(F.col("fwd").cast("long")).alias("nf"),
                F.sum(F.col("bwd").cast("long")).alias("nb"),
            ).collect()[0]
            nf, nb = cur["nf"] or 0, cur["nb"] or 0
            grew = nf > prev_nf or nb > prev_nb
            prev_nf, prev_nb = nf, nb
            state = new
            if not grew:
                break
        scc = state.where(F.col("fwd") & F.col("bwd")).select(
            "id", F.col("pivot").alias("component")
        )
        result = result.unionByName(scc).localCheckpoint(eager=True)
        # split remainders into fresh colors: hash-fold (color, branch) so
        # (F−B), (B−F) and (neither) get disjoint colors without the
        # exponential growth of an arithmetic encoding (3^rounds overflows)
        remaining = (
            state.where(~(F.col("fwd") & F.col("bwd")))
            .select(
                "id",
                F.xxhash64(
                    F.col("color"),
                    F.when(F.col("fwd"), 1).when(F.col("bwd"), 2).otherwise(0),
                ).alias("color"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return result


def component_sizes(components: DataFrame) -> DataFrame:
    """(component, size) — ConnectedComponents::getComponentSizes."""
    return components.groupBy("component").agg(F.count("*").alias("size"))


def largest_component_nodes(components: DataFrame) -> DataFrame:
    """Node ids of the largest component
    (ConnectedComponents::extractLargestConnectedComponent)."""
    top = (
        component_sizes(components)
        .orderBy(F.desc("size"), F.asc("component"))
        .limit(1)
        .select("component")
    )
    return components.join(F.broadcast(top), "component").select("id")
