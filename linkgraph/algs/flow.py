"""Max s-t flow — synchronous distributed push-relabel.

Reference parity: NetworKit ``EdmondsKarp`` (networkit/cpp/flow/
EdmondsKarp.cpp) computes max flow by sequential BFS augmenting paths —
a poor fit for BSP execution (one path per pass). The distributed-native
equivalent is Goldberg–Tarjan push-relabel in synchronous rounds (Hong's
lock-free scheme restated as dataflow): every active vertex discharges
in parallel against a snapshot of heights/residuals, then relabels.
Simultaneous opposite pushes on one edge are impossible (they would need
h(u) = h(v)+1 = h(u)+2), so per-round residual updates commute and each
round is a valid block of sequential push/relabel operations — the
classic correctness argument carries over unchanged.

Round = 4 joins + 1 window + 2 aggs, all keyed on vertex/edge ids:
- admissible = residual ⋈ heights (h(u) = h(v) + 1) ⋈ excess
- discharge: running-sum window over each u's admissible edges allocates
  min(excess, residual) across MULTIPLE edges at once (vectorized
  "discharge", far fewer rounds than single-push variants)
- relabel: active vertices with no admissible edge lift to
  1 + min residual-neighbor height (one agg)

Loop state (flows, heights, excess) is pinned via iterutil.Pin — the
window in the discharge makes localCheckpoint regrow plans on Spark 4.

Termination: no active vertices AND t residual-unreachable from s — the
second half certifies optimality (Ford–Fulkerson); if t is still
reachable when the active set empties, one shortest-path augmentation
restores progress (see _augment_once). The flow value is then t's excess. O(V²·E) pushes worst case, as for every
push-relabel — exact parity use is fixture/subgraph scale, same as the
reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..graph import Graph
from ..iterutil import Pin


def _residual_of(flows: DataFrame) -> DataFrame:
    """(u, v, rescap, dir) — forward leftovers + undo arcs, positive only."""
    return (
        flows.select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            (F.col("cap") - F.col("flow")).alias("rescap"),
            F.lit(1).alias("dir"),
        )
        .unionByName(
            flows.select(
                F.col("dst").alias("u"),
                F.col("src").alias("v"),
                F.col("flow").alias("rescap"),
                F.lit(-1).alias("dir"),
            )
        )
        .where(F.col("rescap") > 1e-12)
    )


def _residual_dists(residual: DataFrame, target: int, pin: Pin, max_rounds: int) -> DataFrame:
    """(id, dist) — hop distance to ``target`` along residual arcs
    (reverse frontier propagation: d(u) = 1 + min d(v) over arcs u→v)."""
    spark = residual.sparkSession
    # key is per-target: the caller runs this twice (to t, then to s) and a
    # shared key would let the second call's pin rotation delete the first
    # call's still-referenced final slot
    key = f"gr_d_{target}"
    d = pin(
        spark.createDataFrame([(int(target), 0)], "id bigint, dist int"), key
    )
    arcs = residual.select("u", "v")
    for r in range(max_rounds):
        # frontier = last round's additions, re-read from the materialized
        # slot (a lazy chain of per-round frontiers would reference every
        # past pin slot, which Pin has already rotated away)
        frontier = d.where(F.col("dist") == r)
        nxt = (
            arcs.join(
                frontier.select(F.col("id").alias("v"), F.col("dist").alias("dv")),
                "v",
            )
            .select(F.col("u").alias("id"), (F.col("dv") + 1).alias("dist"))
            .join(d, "id", "left_anti")
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        if nxt.isEmpty():
            break
        d = pin(d.unionByName(nxt), key)
    return d


def _global_relabel(
    flows: DataFrame, nodes: DataFrame, s: int, t: int, n: int, pin: Pin
) -> DataFrame:
    """Exact distance labels (the global-relabeling heuristic): h(u) =
    residual distance to t; for vertices that cannot reach t, n +
    residual distance to s; 2n for vertices touched by neither (provably
    inactive and validity-safe — see max_flow docstring). Exact distances
    dominate any valid labeling, so assignment never lowers a label."""
    residual = _residual_of(flows)
    dt = _residual_dists(residual, t, pin, n)
    ds = _residual_dists(residual, s, pin, n)
    return (
        nodes.join(dt.withColumnRenamed("dist", "dt"), "id", "left")
        .join(ds.withColumnRenamed("dist", "ds"), "id", "left")
        .select(
            "id",
            F.when(F.col("id") == s, F.lit(n))
            .when(F.col("dt").isNotNull(), F.col("dt"))
            .when(F.col("ds").isNotNull(), F.col("ds") + n)
            .otherwise(F.lit(2 * n))
            .alias("h"),
        )
    )


def _augment_once(flows: DataFrame, s: int, t: int, pin: Pin, n: int):
    """One Edmonds–Karp augmentation along a shortest residual s→t path,
    or None when t is residual-unreachable from s — which is exactly the
    max-flow certificate (Ford–Fulkerson). Called when the active set
    empties: synchronous same-round push+relabel can transiently break
    the height invariant, so 'no active vertices' alone does not prove
    optimality; a sub-maximal valid flow has no excess anywhere and the
    push loop cannot make progress on it, so the recovery step must
    augment directly. Each call strictly increases the flow value, so the
    outer loop terminates (EK bound). Rare path — the walk is one small
    driver-filtered lookup per hop, fine at the documented fixture scale."""
    spark = flows.sparkSession
    residual = _residual_of(flows).localCheckpoint(eager=True)
    d = _residual_dists(residual, t, pin, n).localCheckpoint(eager=True)
    drow = d.where(F.col("id") == s).collect()
    if not drow:
        return None
    dv = d.select(F.col("id").alias("v"), F.col("dist").alias("dv"))
    path = []
    cur, dcur = s, int(drow[0]["dist"])
    while cur != t:
        step = (
            residual.where(F.col("u") == cur)
            .join(dv, "v")
            .where(F.col("dv") == dcur - 1)
            .orderBy("v", "dir")
            .limit(1)
            .collect()[0]
        )
        path.append((cur, int(step["v"]), int(step["dir"]), float(step["rescap"])))
        cur, dcur = int(step["v"]), dcur - 1
    bottleneck = min(p[3] for p in path)
    delta = spark.createDataFrame(
        [
            (u, v, bottleneck) if direc == 1 else (v, u, -bottleneck)
            for u, v, direc, _ in path
        ],
        "src bigint, dst bigint, d double",
    ).groupBy("src", "dst").agg(F.sum("d").alias("d"))
    return flows.join(delta, ["src", "dst"], "left").select(
        "src",
        "dst",
        "cap",
        (F.col("flow") + F.coalesce("d", F.lit(0.0))).alias("flow"),
    )


def max_flow(
    graph: Graph,
    source: int,
    sink: int,
    max_iter: int = 10_000,
    relabel_every: int = 6,
) -> tuple[float, DataFrame]:
    """Returns (flow_value, flows) where flows = (src, dst, cap, flow) on
    the original directed edges. Edge capacities are the weights;
    undirected graphs are treated as two opposing directed capacities
    (standard flow semantics for symmetric graphs)."""
    spark = graph.edges.sparkSession
    s, t = int(source), int(sink)
    edges = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("cap"))
    )
    n = graph.num_nodes()
    pin = Pin(spark, "maxflow")
    try:
        # saturate source out-edges
        flows = pin(
            edges.withColumn(
                "flow",
                F.when(F.col("src") == s, F.col("cap")).otherwise(F.lit(0.0)),
            ),
            "flows",
        )
        nodes = graph.nodes().localCheckpoint(eager=True)
        heights = pin(_global_relabel(flows, nodes, s, t, n, pin), "heights")
        for it in range(max_iter):
            if it > 0 and it % relabel_every == 0:
                heights = pin(_global_relabel(flows, nodes, s, t, n, pin), "heights")
            excess = (
                flows.groupBy(F.col("dst").alias("id"))
                .agg(F.sum("flow").alias("inn"))
                .join(
                    flows.groupBy(F.col("src").alias("id")).agg(
                        F.sum("flow").alias("out")
                    ),
                    "id",
                    "outer",
                )
                .select(
                    "id",
                    (F.coalesce("inn", F.lit(0.0)) - F.coalesce("out", F.lit(0.0))).alias("e"),
                )
            )
            active = excess.where(
                (F.col("e") > 1e-12) & ~F.col("id").isin(s, t)
            )
            if active.isEmpty():
                # certify before terminating: if t is still residual-
                # reachable the flow is valid but sub-maximal (transient
                # height-invariant breakage) — augment and keep going
                aug = _augment_once(flows, s, t, pin, n)
                if aug is None:
                    break
                flows = pin(aug, "flows")
                heights = pin(_global_relabel(flows, nodes, s, t, n, pin), "heights")
                continue
            residual = _residual_of(flows)
            res_act = residual.join(
                active.select(F.col("id").alias("u"), "e"), "u"
            ).join(heights.select(F.col("id").alias("u"), F.col("h").alias("hu")), "u")
            res_act = res_act.join(
                heights.select(F.col("id").alias("v"), F.col("h").alias("hv")), "v"
            )
            adm = res_act.where(F.col("hu") == F.col("hv") + 1)
            # vectorized discharge: allocate excess across admissible arcs
            w = Window.partitionBy("u").orderBy("v", "dir")
            cum = F.coalesce(
                F.sum("rescap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            )
            pushes = adm.select(
                "u",
                "v",
                "dir",
                F.least(
                    F.col("rescap"), F.greatest(F.col("e") - cum, F.lit(0.0))
                ).alias("amt"),
            ).where(F.col("amt") > 1e-12)
            # relabel: active vertices with NO admissible arc
            relabel = (
                res_act.groupBy("u")
                .agg(
                    F.max((F.col("hu") == F.col("hv") + 1).cast("int")).alias("any_adm"),
                    F.min("hv").alias("minhv"),
                )
                .where(F.col("any_adm") == 0)
                .select(F.col("u").alias("id"), (F.col("minhv") + 1).alias("new_h"))
            )
            d_fwd = pushes.where(F.col("dir") == 1).select(
                F.col("u").alias("src"), F.col("v").alias("dst"), F.col("amt")
            )
            d_bwd = pushes.where(F.col("dir") == -1).select(
                F.col("v").alias("src"), F.col("u").alias("dst"), (-F.col("amt")).alias("amt")
            )
            delta = (
                d_fwd.unionByName(d_bwd).groupBy("src", "dst").agg(F.sum("amt").alias("d"))
            )
            flows = pin(
                flows.join(delta, ["src", "dst"], "left").select(
                    "src",
                    "dst",
                    "cap",
                    (F.col("flow") + F.coalesce("d", F.lit(0.0))).alias("flow"),
                ),
                "flows",
            )
            heights = pin(
                heights.join(relabel, "id", "left").select(
                    "id", F.coalesce("new_h", "h").alias("h")
                ),
                "heights",
            )
        value_row = (
            flows.where(F.col("dst") == t).agg(F.sum("flow").alias("inn")).collect()[0]
        )
        out_row = (
            flows.where(F.col("src") == t).agg(F.sum("flow").alias("out")).collect()[0]
        )
        value = float(value_row["inn"] or 0.0) - float(out_row["out"] or 0.0)
        # detach from the pin directory before close() deletes it (the
        # pinned frame is a lazy parquet read of that path)
        return value, flows.localCheckpoint(eager=True)
    finally:
        pin.close()


def min_cut_value(graph: Graph, source: int, sink: int) -> float:
    """Max-flow = min-cut value (the quantity EdmondsKarp users usually
    want; the cut side is recoverable as the residual-reachable set)."""
    value, _ = max_flow(graph, source, sink)
    return value


def cut_clustering(graph: Graph, alpha: float, max_iter: int = 10_000) -> DataFrame:
    """(id, label) — Flake–Tarjan cut clustering (community/
    CutClustering.cpp): augment the graph with an artificial sink t
    connected to every vertex with capacity alpha; each unassigned vertex
    v (ascending id — deterministic) claims the source side of its min
    v-t cut as one community. alpha interpolates singletons (large) to
    one cluster (tiny).

    The outer loop is sequential per community, as in the reference —
    each iteration is one distributed max-flow + one residual-BFS; the
    documented use is fixture/subgraph scale.
    """
    spark = graph.edges.sparkSession
    nodes = [int(r["id"]) for r in graph.nodes().collect()]
    sink = max(nodes) + 1
    aug_edges = (
        graph.symmetric_edges()
        .unionByName(
            graph.nodes().select(
                F.col("id").alias("src"),
                F.lit(sink).alias("dst"),
                F.lit(float(alpha)).alias("weight"),
            )
        )
        .localCheckpoint(eager=True)
    )
    aug = Graph.from_edges(aug_edges, directed=True, weighted=True)
    labels: dict[int, int] = {}
    pin = Pin(spark, "cutcluster")
    try:
        for v in sorted(nodes):
            if v in labels:
                continue
            _, flows = max_flow(aug, v, sink, max_iter=max_iter)
            # source side = vertices that v reaches in the residual graph
            # (distance-to-v on transposed residual arcs)
            residual_t = _residual_of(flows).select(
                F.col("v").alias("u"), F.col("u").alias("v"), "rescap", "dir"
            )
            d = _residual_dists(residual_t, v, pin, len(nodes) + 1)
            side = {int(r["id"]) for r in d.collect()} - {sink}
            for u in side:
                if u not in labels:
                    labels[u] = v
            labels[v] = v
    finally:
        pin.close()
    return spark.createDataFrame(
        sorted(labels.items()), "id bigint, label bigint"
    )
