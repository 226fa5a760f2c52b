"""Vertex-biconnected components — distributed Tarjan–Vishkin.

Reference parity: NetworKit components/BiconnectedComponents.cpp computes
blocks with a sequential DFS low-link stack — inherently serial. The
distributed-native equivalent is the Tarjan–Vishkin (1985) reduction,
which works over ANY rooted spanning tree (no DFS needed):

1. BFS spanning forest (``bridges.bfs_forest`` — O(diameter) supersteps,
   deterministic min-parent ties).
2. Subtree sizes nd(v): level-synchronous bottom-up sum, O(depth) rounds
   of one filter + one groupBy(parent) partial agg each.
3. Preorder numbering: top-down, pre(v) = pre(p) + 1 + Σ nd(earlier
   siblings); the sibling prefix sum is a window partitioned by PARENT
   (fan-in bounded by degree — same hub caveat as PLP votes).
   Numbering is per-root; every comparison below carries the root, so no
   global ordering (and no un-partitioned window) is ever needed.
4. low/high(v): min/max preorder reachable from v's subtree via one
   non-tree edge — non-tree neighbor min/max agg, then the same bottom-up
   min/max rounds as step 2.
5. Auxiliary graph on tree edges (edge (p(v), v) ≡ vertex v ≠ root):
   (i)  non-tree edge {v, w}, v, w unrelated (preorder-interval test)
        → aux edge v ~ w;
   (ii) tree edge (v, p(v)) with non-root w = p(v) whose subtree is
        escaped (low(v) < pre(w) or high(v) ≥ pre(w) + nd(w))
        → aux edge v ~ w.
   Connected components of the aux graph (hash-to-min, reused) are the
   blocks; a non-tree edge {v, w} lands in the block of its deeper
   (larger-preorder) endpoint's tree edge.

Every phase is joins/aggs partitioned on vertex id; rounds are bounded by
the BFS depth, the same cost class as computing the forest itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph
from linkgraph.algs.bridges import bfs_forest


def _bottom_up(state: DataFrame, max_depth: int, col: str, agg, combine) -> DataFrame:
    """Level-synchronous bottom-up fold of ``col`` toward the root:
    ``agg`` combines children at the parent (F.min/F.max/F.sum), ``combine``
    merges the children's fold into the parent's own value."""
    for d in range(int(max_depth), 0, -1):
        up = (
            state.where(F.col("depth") == d)
            .groupBy(F.col("parent").alias("id"))
            .agg(agg(F.col(col)).alias("_up"))
        )
        state = (
            state.join(up, "id", "left")
            .select(
                *[c for c in state.columns if c != col],
                combine(F.col(col), F.col("_up")).alias(col),
            )
            .localCheckpoint(eager=True)
        )
    return state


def _tree_state(graph: Graph, max_iter: int):
    """forest + preorder + subtree size + low/high, all as one DataFrame
    (id, parent, depth, root, nd, pre, low, high)."""
    forest = bfs_forest(graph, max_iter=max_iter).persist()
    max_depth = int(forest.agg(F.max("depth")).collect()[0][0] or 0)

    # -- subtree sizes (bottom-up sums) -----------------------------------
    sized = _bottom_up(
        forest.withColumn("nd", F.lit(1)).localCheckpoint(eager=True),
        max_depth,
        "nd",
        F.sum,
        lambda own, up: own + F.coalesce(up, F.lit(0)),
    ).persist()

    # -- preorder (top-down; per-parent sibling prefix sums) --------------
    pre = (
        sized.where(F.col("depth") == 0)
        .select("id", F.lit(0).alias("pre"))
        .localCheckpoint(eager=True)
    )
    sibling = Window.partitionBy("parent").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    for d in range(1, max_depth + 1):
        lvl = (
            sized.where(F.col("depth") == d)
            .withColumn("_off", F.coalesce(F.sum("nd").over(sibling), F.lit(0)))
            .join(pre.select(F.col("id").alias("parent"), F.col("pre").alias("_pp")), "parent")
            .select("id", (F.col("_pp") + 1 + F.col("_off")).alias("pre"))
        )
        pre = pre.unionByName(lvl).localCheckpoint(eager=True)

    state = sized.join(pre, "id").persist()

    # -- low/high (non-tree neighbor extremes, folded bottom-up) ----------
    tree_pairs = sized.where(F.col("parent") >= 0).select(
        F.least("parent", "id").alias("src"), F.greatest("parent", "id").alias("dst")
    )
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    non_tree = canon.join(tree_pairs, ["src", "dst"], "left_anti").persist()
    nt_sym = non_tree.unionByName(
        non_tree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nb = (
        nt_sym.join(state.select(F.col("id").alias("dst"), F.col("pre").alias("_p")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("_p").alias("_nlo"), F.max("_p").alias("_nhi"))
    )
    lo_hi = (
        state.join(nb, "id", "left")
        .select(
            "id",
            "parent",
            "depth",
            F.least("pre", F.col("_nlo")).alias("low"),
            F.greatest("pre", F.col("_nhi")).alias("high"),
        )
        .localCheckpoint(eager=True)
    )
    # fused fold: low (min) and high (max) ride the SAME per-level
    # groupBy(parent) aggregate — one materialization per depth level
    # instead of two (the fold dominates this operator's wall time at
    # fixture scale; every action is a scheduling round-trip)
    for d in range(int(max_depth), 0, -1):
        up = (
            lo_hi.where(F.col("depth") == d)
            .groupBy(F.col("parent").alias("id"))
            .agg(F.min("low").alias("_ulo"), F.max("high").alias("_uhi"))
        )
        lo_hi = (
            lo_hi.join(up, "id", "left")
            .select(
                "id",
                "parent",
                "depth",
                F.least("low", F.col("_ulo")).alias("low"),
                F.greatest("high", F.col("_uhi")).alias("high"),
            )
            .localCheckpoint(eager=True)
        )
    full = state.join(lo_hi.select("id", "low", "high"), "id").localCheckpoint(
        eager=True
    )
    forest.unpersist()
    sized.unpersist()
    state.unpersist()
    return full, non_tree


def biconnected_components(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(src, dst, block) — every distinct canonical non-self edge labeled
    with its biconnected-component id (the minimum non-root tree-edge
    vertex of the block)."""
    from linkgraph.algs.components import connected_components

    state, non_tree = _tree_state(graph, max_iter)
    state = state.persist()

    v = state.select(
        F.col("id").alias("_v"),
        F.col("root").alias("_vr"),
        F.col("pre").alias("_vp"),
        F.col("nd").alias("_vn"),
    )
    w = state.select(
        F.col("id").alias("_w"),
        F.col("root").alias("_wr"),
        F.col("pre").alias("_wp"),
        F.col("nd").alias("_wn"),
    )
    # rule (i): unrelated non-tree endpoints (same component; neither
    # preorder interval contains the other)
    pairs = (
        non_tree.join(v, non_tree.src == F.col("_v"))
        .join(w, non_tree.dst == F.col("_w"))
    )
    unrelated = pairs.where(
        ~(
            (F.col("_vp") <= F.col("_wp"))
            & (F.col("_wp") < F.col("_vp") + F.col("_vn"))
        )
        & ~(
            (F.col("_wp") <= F.col("_vp"))
            & (F.col("_vp") < F.col("_wp") + F.col("_wn"))
        )
    ).select(F.col("_v").alias("src"), F.col("_w").alias("dst"))

    # rule (ii): tree edge (v, p(v)) whose subtree escapes p(v)'s subtree
    parent_info = state.select(
        F.col("id").alias("parent"),
        F.col("parent").alias("_gp"),
        F.col("pre").alias("_pp"),
        F.col("nd").alias("_pn"),
    )
    escape = (
        state.where(F.col("parent") >= 0)
        .join(parent_info, "parent")
        .where(F.col("_gp") >= 0)  # p(v) must be a tree edge too (non-root)
        .where(
            (F.col("low") < F.col("_pp"))
            | (F.col("high") >= F.col("_pp") + F.col("_pn"))
        )
        .select(F.col("id").alias("src"), F.col("parent").alias("dst"))
    )

    aux = unrelated.unionByName(escape).withColumn("weight", F.lit(1.0))
    aux_cc = connected_components(Graph.from_edges(aux, directed=False))

    # every non-root vertex is an aux vertex; isolated ones form their own
    # single-edge block
    tree_block = (
        state.where(F.col("parent") >= 0)
        .join(aux_cc, "id", "left")
        .select(
            "id",
            "parent",
            "pre",
            F.coalesce("component", F.col("id")).alias("block"),
        )
        .persist()
    )
    tree_edges = tree_block.select(
        F.least("parent", "id").alias("src"),
        F.greatest("parent", "id").alias("dst"),
        "block",
    )
    # non-tree edge → block of its larger-preorder endpoint's tree edge
    deeper = (
        non_tree.join(v, non_tree.src == F.col("_v"))
        .join(w, non_tree.dst == F.col("_w"))
        .select(
            "src",
            "dst",
            F.when(F.col("_vp") > F.col("_wp"), F.col("_v"))
            .otherwise(F.col("_w"))
            .alias("_owner"),
        )
    )
    nt_edges = deeper.join(
        tree_block.select(F.col("id").alias("_owner"), "block"), "_owner"
    ).select("src", "dst", "block")

    out = tree_edges.unionByName(nt_edges).localCheckpoint(eager=True)
    state.unpersist()
    non_tree.unpersist()
    tree_block.unpersist()
    return out


def articulation_points(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id) — cut vertices: exactly the vertices that belong to more than
    one biconnected component."""
    blocks = biconnected_components(graph, max_iter=max_iter)
    ends = blocks.select(F.col("src").alias("id"), "block").unionByName(
        blocks.select(F.col("dst").alias("id"), "block")
    )
    return (
        ends.groupBy("id")
        .agg(F.count_distinct("block").alias("nb"))
        .where(F.col("nb") > 1)
        .select("id")
    )
