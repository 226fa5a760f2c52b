"""Reachability: per-vertex reachable-set sizes + simple-path enumeration.

Reference parity: REF⚠ networkit/cpp/reachability/ReachableNodes.cpp
(exact per-node BFS counts, or sampled upper/lower bounds when
``exact=False``) and REF⚠ reachability/AllSimplePaths.cpp (DFS
enumeration of every simple source→target path under a cutoff).

Spark formulations:

- ``reachable_nodes`` (exact): undirected graphs reduce to connected-
  component sizes — ONE CC run, scale-safe at any graph size. Directed
  graphs need the transitive closure; the frontier-pair expansion below
  does the same total work as the reference's n BFS traversals
  (O(Σ_u |R(u)|) pair rows) but as ~diameter supersteps of one join +
  one anti-join each, all sources simultaneously. The pair table is the
  inherent output lower bound of EXACT directed reachability counting —
  at web scale use ``reachable_nodes_estimate``.
- ``reachable_nodes_estimate``: the reference's inexact mode keeps
  per-node bounds from sampled BFS; the distributed-native analogue is a
  Flajolet–Martin sketch (the ANF machinery, anf.py) propagated along
  REVERSED edge direction — bits(u) |= bits(v) for every edge u→v, so
  after h rounds bits(u) sketches {w : u ⇝ w within h hops}; iterate to
  saturation for the full reachable set. State is n·R rows, one join +
  one ``bit_or`` hash-agg per round — PageRank-shaped, 100-TB-safe.
- ``all_simple_paths``: breadth-synchronous path extension — frontier
  rows carry the path array; each round joins the frontier to the edge
  table and filters revisits with ``array_contains``. Completed paths
  (last = target) leave the frontier immediately (a simple path cannot
  re-enter its own endpoint). Worst case is inherently exponential (the
  reference's DFS has the same bound); ``cutoff`` is the contract, as in
  the reference and networkx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def reachable_nodes(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, reachable) — EXACT number of vertices reachable from each
    vertex, the vertex itself included (ReachableNodes.cpp
    ``numberOfReachableNodes`` convention: BFS from u visits u).

    Undirected: reachable(u) = |component(u)| — one CC run.
    Directed: frontier-pair transitive closure (see module docstring);
    exact directed counting is O(Σ|R(u)|) in ANY engine — prefer
    :func:`reachable_nodes_estimate` beyond fixture scale.
    """
    if not graph.directed:
        from linkgraph.algs.components import connected_components

        labels = connected_components(graph)
        sizes = labels.groupBy("component").agg(F.count("*").alias("reachable"))
        return labels.join(sizes, "component").select("id", "reachable")

    e = graph.edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct().persist()
    # pair state: (source, id) = id is reachable from source
    seen = graph.nodes().select(
        F.col("id").alias("source"), F.col("id")
    ).localCheckpoint(eager=True)
    frontier = seen
    for _ in range(max_iter):
        new = (
            frontier.join(e, frontier.id == e.src)
            .select("source", F.col("dst").alias("id"))
            .distinct()
            .join(seen, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        seen = seen.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    e.unpersist()
    return seen.groupBy(F.col("source").alias("id")).agg(
        F.count("*").alias("reachable")
    )


def reachable_nodes_estimate(
    graph: Graph,
    registers: int = 8,
    max_h: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, est) — sketched |{w : id ⇝ w}| per vertex (self included),
    the scale path of ReachableNodes.cpp's ``exact=False`` mode.

    FM registers propagate AGAINST edge direction (bits flow dst→src) so
    each vertex accumulates the sketch of its forward-reachable set;
    stops at the exact bit fixpoint (no register changed in a round —
    a global estimate-growth heuristic terminated early on graphs where
    one saturated region dwarfed a still-growing tail). Undirected
    graphs use the symmetric view (est ≈ component size)."""
    from linkgraph.algs.anf import _fm_estimate, _fm_init

    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .persist()
    )
    state = _fm_init(spark, graph.nodes(), registers, portable).localCheckpoint(
        eager=True
    )
    for _ in range(max_h):
        # bits(src) |= bits(dst): sketches flow backwards along edges
        nbr = state.join(e, state.id == e.dst).select(
            F.col("src").alias("id"), "r", "bits"
        )
        new_state = (
            state.select("id", "r", "bits")
            .unionByName(nbr)
            .groupBy("id", "r")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_state.alias("n")
            .join(
                state.select("id", "r", F.col("bits").alias("ob")), ["id", "r"]
            )
            .where(F.col("bits") != F.col("ob"))
            .count()
        )
        state = new_state
        if changed == 0:
            break
    e.unpersist()
    return _fm_estimate(state)


def all_simple_paths(
    graph: Graph, source: int, target: int, cutoff: int = 8
) -> DataFrame:
    """(path, hops) — every simple path source→target with ≤ ``cutoff``
    edges (AllSimplePaths.cpp / networkx.all_simple_paths semantics:
    vertices distinct within a path; paths END at the first arrival —
    a simple path cannot pass THROUGH its own target). ``path`` is the
    vertex array [source, …, target]; empty result when disconnected.

    source == target returns the trivial single-vertex path [source]
    (hops 0), matching networkx's convention for that degenerate call.
    """
    spark = graph.edges.sparkSession
    if int(source) == int(target):
        return spark.createDataFrame(
            [([int(source)], 0)], "path array<bigint>, hops int"
        )
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    frontier = spark.createDataFrame(
        [(int(source), [int(source)])], "last bigint, path array<bigint>"
    )
    done = spark.createDataFrame([], "path array<bigint>, hops int")
    for step in range(1, int(cutoff) + 1):
        ext = (
            frontier.join(e, frontier.last == e.src)
            .where(~F.array_contains("path", F.col("dst")))
            .select(
                F.col("dst").alias("last"),
                F.concat("path", F.array(F.col("dst"))).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        arrived = ext.where(F.col("last") == int(target)).select(
            "path", F.lit(step).alias("hops")
        )
        done = done.unionByName(arrived).localCheckpoint(eager=True)
        frontier = ext.where(F.col("last") != int(target))
        if step < cutoff and frontier.isEmpty():
            break
    e.unpersist()
    return done
