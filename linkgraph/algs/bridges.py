"""Bridges and 2-edge-connected components — distributed XOR-covering.

Reference adjacency: NetworKit ships vertex-biconnectivity
(components/BiconnectedComponents.cpp) via sequential DFS low-links — a
poor distributed fit (SURVEY §2A P3). The distributed-feasible relative
implemented here is EDGE-biconnectivity: bridge finding and
2-edge-connected components, via the classic randomized XOR trick
(Pritchard 2006-style): give every non-tree edge a random 64-bit value,
charge it to both endpoints, and bottom-up-XOR over a BFS forest — a
tree edge (parent,child) is covered by some cycle iff the XOR over
child's subtree is non-zero (a non-tree edge with both endpoints inside
the subtree cancels itself; one endpoint inside contributes once).
Bridge ⟺ subtree XOR = 0, with failure probability ≤ m·2⁻⁶⁴.

Plan shape: one BFS-forest build (O(diameter) frontier supersteps, min-
parent tie-break → deterministic forest), one XOR hash-agg for charges,
O(depth) level-synchronous bottom-up XOR rounds (per round: one filter +
one groupBy(parent) partial agg), then connected_components on the
bridge-free edge set. Everything partitions on vertex id; no windows, no
driver loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def bfs_forest(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, parent, depth, root) — deterministic BFS forest: each
    component is rooted at its minimum vertex id; frontier expansion
    picks the minimum eligible parent."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    from linkgraph.algs.components import connected_components

    cc = connected_components(graph)
    state = cc.select(
        "id",
        F.when(F.col("id") == F.col("component"), F.lit(-1)).alias("parent"),
        F.when(F.col("id") == F.col("component"), F.lit(0)).alias("depth"),
        F.col("component").alias("root"),
    )
    settled = state.where(F.col("parent").isNotNull()).localCheckpoint(eager=True)
    frontier = settled
    for d in range(1, max_iter):
        cand = (
            frontier.join(sym, frontier.id == sym.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("src")).alias("parent"))
        )
        new = (
            cand.join(settled.select("id"), "id", "left_anti")
            .withColumn("depth", F.lit(d))
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        new = new.join(
            settled.select(F.col("id").alias("parent"), "root"), "parent"
        ).select("id", "parent", "depth", "root")
        settled = settled.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    sym.unpersist()
    return settled


def bridges(graph: Graph, seed: int = 42, max_iter: int = 10_000) -> DataFrame:
    """(src, dst) canonical bridge edges (src < dst)."""
    forest = bfs_forest(graph, max_iter=max_iter).persist()
    tree = forest.where(F.col("parent") >= 0).select(
        F.least("parent", "id").alias("src"),
        F.greatest("parent", "id").alias("dst"),
        F.col("id").alias("child"),
        "depth",
    ).persist()
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    non_tree = canon.join(tree.select("src", "dst"), ["src", "dst"], "left_anti")
    # random 64-bit value per non-tree edge, XOR-charged to both endpoints
    val = non_tree.withColumn("r", F.xxhash64("src", "dst", F.lit(seed)))
    charges = (
        val.select(F.col("src").alias("id"), "r")
        .unionByName(val.select(F.col("dst").alias("id"), "r"))
        .groupBy("id")
        .agg(F.bit_xor("r").alias("v"))
    )
    state = (
        forest.join(charges, "id", "left")
        .select(
            "id",
            "parent",
            "depth",
            F.coalesce("v", F.lit(0)).alias("acc"),
        )
        .localCheckpoint(eager=True)
    )
    max_depth = state.agg(F.max("depth")).collect()[0][0] or 0
    # bottom-up: level d sends its accumulated subtree XOR to its parent
    for d in range(int(max_depth), 0, -1):
        up = (
            state.where(F.col("depth") == d)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.bit_xor("acc").alias("up"))
        )
        state = (
            state.join(up, "id", "left")
            .select(
                "id",
                "parent",
                "depth",
                (
                    F.col("acc").bitwiseXOR(F.coalesce("up", F.lit(0)))
                ).alias("acc"),
            )
            .localCheckpoint(eager=True)
        )
    out = (
        state.where((F.col("parent") >= 0) & (F.col("acc") == 0))
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
        )
    )
    forest.unpersist()
    tree.unpersist()
    return out


def two_edge_connected_components(graph: Graph, seed: int = 42) -> DataFrame:
    """(id, component) — 2-edge-connected components: connected
    components of the graph with bridges removed (bridge endpoints that
    become isolated keep their own id as component)."""
    from linkgraph.algs.components import connected_components

    br = bridges(graph, seed=seed)
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    rest = canon.join(br, ["src", "dst"], "left_anti").withColumn(
        "weight", F.lit(1.0)
    )
    cc = connected_components(Graph.from_edges(rest, directed=False))
    return (
        graph.nodes()
        .join(cc, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )
