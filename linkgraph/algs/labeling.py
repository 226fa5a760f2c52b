"""Pruned landmark labeling — 2-hop hub labels for exact distance queries.

Reference parity: REF⚠ distance/PrunedLandmarkLabeling.{hpp,cpp} (Akiba,
Iwata, Yoshida, SIGMOD'13): vertices are processed in degree-descending
order; a BFS from landmark h labels vertex v with (h, d(h,v)) unless the
distance is already covered by earlier labels (query(h, v) <= d), in
which case the search is pruned at v. Queries answer
dist(u, v) = min over common hubs w of d(u, w) + d(w, v), exactly when
every vertex is eventually processed as a landmark.

The reference's loop is inherently sequential (each BFS prunes against
all earlier labels). The distributed formulation processes landmarks in
RANK-ORDERED BATCHES: one pair-keyed multi-source BFS per batch, pruning
against the labels of strictly earlier batches only. Intra-batch pruning
is dropped — pruning with stale (smaller) label sets prunes less, so
labels are a superset of the reference's and queries remain exact (the
canonical cover argument: if (h2, v) is pruned because an earlier-batch
hub h1 gives d(h2,h1)+d(h1,v) <= d(h2,v), then for any u the h1 label
pair covers u-v at least as well as h2 would have).

Directed graphs keep two label sets (forward: hub reaches v; backward:
v reaches hub) built by the same machinery over the edge table and its
transpose; both sides of a batch prune against the same prior-batch
snapshot, so the rank order of the prune set is well-defined.
Undirected graphs build one set.

Scale: full PLL indexes all n vertices as landmarks — n/B multi-source
BFS rounds and an index that is label-size-bound, the same regime as the
reference (hub labeling is an index-heavy preprocessing trade). At web
scale one caps landmarks at the top-k by degree (``k=...``): queries then
return the exact length of the shortest path THROUGH the top-k hub set
(an upper bound on the true distance, exact when some shortest path
crosses a hub — the standard landmark-approximation mode).

Plan per BFS level: frontier ⋈ edges → groupBy(hub, id) → anti-join
visited → prune join against prior labels (two hash joins + one agg) —
all shuffles keyed on vertex ids; no driver-side per-landmark loop below
the batch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin


def _ranked_landmarks(graph: Graph, k: int | None) -> DataFrame:
    """(hub, rank) — degree-descending, id-ascending total order; the
    reference's vertex ordering heuristic (PrunedLandmarkLabeling.cpp
    sorts by degree before indexing). Ranked with the range-partitioned
    linearization (stats.distributed_row_number, the roc_auc pattern),
    so the ordering of all n vertices never funnels through a
    SinglePartition window (plan-asserted in tests/test_plans.py)."""
    from linkgraph.stats import distributed_row_number

    ranked = distributed_row_number(
        graph.degrees().select(F.col("id").alias("hub"), "degree"),
        [F.desc("degree"), F.asc("hub")],
        rank_col="rank",
    ).select("hub", "rank")
    if k is not None:
        ranked = ranked.where(F.col("rank") <= int(k))
    return ranked


def _pruned_batch_bfs(
    edges: DataFrame,
    roots: DataFrame,
    hub_side_labels: DataFrame | None,
    node_side_labels: DataFrame | None,
    pin: Pin,
    tag: str,
    max_iter: int,
) -> DataFrame:
    """Pair-keyed BFS from every root simultaneously, pruning a frontier
    candidate (hub, id, dist) when the prior-batch labels already answer
    query(hub -> id) <= dist. Returns (id, hub, dist) label rows."""
    frontier = roots.select("hub", F.col("hub").alias("id"), F.lit(0).alias("dist"))
    labels = pin(frontier, f"{tag}_labels")
    frontier = labels
    for _ in range(max_iter):
        cand = (
            frontier.join(edges, frontier.id == edges.src)
            .select("hub", F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .groupBy("hub", "id")
            .agg(F.min("dist").alias("dist"))
            .join(labels.select("hub", "id"), ["hub", "id"], "left_anti")
        )
        if hub_side_labels is not None:
            hs = hub_side_labels.select(
                F.col("id").alias("hub"),
                F.col("hub").alias("w"),
                F.col("dist").alias("dh"),
            )
            ns = node_side_labels.select(
                "id", F.col("hub").alias("w"), F.col("dist").alias("dv")
            )
            q = (
                cand.join(hs, "hub")
                .join(ns, ["id", "w"])
                .groupBy("hub", "id")
                .agg(F.min(F.col("dh") + F.col("dv")).alias("q"))
            )
            cand = (
                cand.join(q, ["hub", "id"], "left")
                .where(F.col("q").isNull() | (F.col("q") > F.col("dist")))
                .select("hub", "id", "dist")
            )
        cand = pin(cand, f"{tag}_frontier")
        if cand.isEmpty():
            break
        labels = pin(labels.unionByName(cand), f"{tag}_labels")
        frontier = cand
    return labels.select("id", "hub", "dist")


def pruned_landmark_labeling(
    graph: Graph,
    k: int | None = None,
    batch_size: int = 64,
    max_iter: int = 10_000,
) -> tuple[DataFrame, DataFrame]:
    """Build hub labels; returns (forward, backward) label tables, each
    (id, hub, dist). For undirected graphs the two are the same object.

    forward:  dist is d(hub -> id) (the hub reaches the vertex)
    backward: dist is d(id -> hub) (the vertex reaches the hub)

    ``k=None`` indexes every vertex (exact queries); ``k`` caps landmarks
    to the top-k by degree (exact-through-hubs upper bound)."""
    spark = graph.edges.sparkSession
    fwd_edges = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .distinct()
        .persist()
    )
    bwd_edges = None
    if graph.directed:
        bwd_edges = fwd_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ).persist()
    ranked = _ranked_landmarks(graph, k).persist()
    n_hubs = ranked.count()
    pin = Pin(spark, "pll")
    try:
        empty = spark.createDataFrame([], "id bigint, hub bigint, dist int")
        fwd_acc = pin(empty, "fwd_acc")
        bwd_acc = pin(empty, "bwd_acc") if graph.directed else None
        start = 1
        while start <= n_hubs:
            roots = ranked.where(
                (F.col("rank") >= start) & (F.col("rank") < start + batch_size)
            ).select("hub")
            prior = start > 1
            # both sides of the batch prune against the SAME prior-batch
            # snapshot (fwd_snap/bwd_snap), keeping the prune set's rank
            # order strictly below the batch — the condition the
            # exactness cover argument needs.
            fwd_snap, bwd_snap = fwd_acc, (bwd_acc if graph.directed else fwd_acc)
            batch_fwd = _pruned_batch_bfs(
                fwd_edges,
                roots,
                bwd_snap if prior else None,  # d(hub -> w)
                fwd_snap if prior else None,  # d(w -> id)
                pin,
                "fwd",
                max_iter,
            )
            if graph.directed:
                batch_bwd = _pruned_batch_bfs(
                    bwd_edges,
                    roots,
                    fwd_snap if prior else None,  # d(w -> hub)
                    bwd_snap if prior else None,  # d(id -> w)
                    pin,
                    "bwd",
                    max_iter,
                )
                bwd_acc = pin(bwd_acc.unionByName(batch_bwd), "bwd_acc")
            fwd_acc = pin(fwd_acc.unionByName(batch_fwd), "fwd_acc")
            start += batch_size
        fwd = fwd_acc.localCheckpoint(eager=True)
        bwd = bwd_acc.localCheckpoint(eager=True) if graph.directed else fwd
        return fwd, bwd
    finally:
        ranked.unpersist()
        fwd_edges.unpersist()
        if bwd_edges is not None:
            bwd_edges.unpersist()
        pin.close()


def pll_query(forward: DataFrame, backward: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, dist) for each row of ``pairs`` (columns u, v):
    min over common hubs w of d(u -> w) + d(w -> v); null when the label
    sets share no hub (disconnected pair, or a pair not covered by a
    k-capped hub set). One label join per side + one agg — the
    reference's query(u, v) merge over sorted label arrays, as a
    relational plan."""
    lu = backward.select(
        F.col("id").alias("u"), F.col("hub").alias("w"), F.col("dist").alias("du")
    )
    lv = forward.select(
        F.col("id").alias("v"), F.col("hub").alias("w"), F.col("dist").alias("dv")
    )
    return (
        pairs.select("u", "v")
        .join(lu, "u")
        .join(lv, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.min(F.col("du") + F.col("dv")).alias("dist"))
        .join(pairs.select("u", "v"), ["u", "v"], "right")
        .select("u", "v", "dist")
    )
