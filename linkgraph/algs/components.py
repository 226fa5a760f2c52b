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
) -> DataFrame:
    """Return ``(id, component)`` where component = min vertex id reachable.

    Canonical labeling (min member id) makes results directly comparable
    across runs, parallelism levels, and the DuckDB oracle — the
    "exact up to canonical relabeling" contract is free.
    """
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
