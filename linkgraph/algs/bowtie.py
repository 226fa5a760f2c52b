"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000).

Partitions vertices around the largest strongly connected component:

- ``core``         the largest SCC
- ``in``           reaches the core, not in it
- ``out``          reachable from the core, not in it
- ``tube``         on an IN→OUT path that avoids the core
- ``tendril_in``   reachable from IN, touching neither core nor OUT-side
- ``tendril_out``  reaching OUT, touched from neither core nor IN-side
- ``disconnected`` everything else

Spark shape: one SCC run (the engine's distributed FB-coloring), then
four SET-reachability sweeps (forward/backward from core, forward from
IN, backward from OUT). Each sweep is a frontier superstep loop with
O(n) boolean state and two co-partitioned shuffles per hop — the CC/BFS
discipline; region assignment is pure joins + one CASE projection.
Tendril/tube membership follows Broder's taxonomy: TUBE is in both the
IN-forward and OUT-backward fringes, TENDRILS in exactly one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.iterutil import Pin

__all__ = ["bowtie_decomposition", "set_reachable"]


def set_reachable(
    edges: DataFrame, seeds: DataFrame, max_iter: int = 10_000
) -> DataFrame:
    """(id) — vertices reachable from ANY seed (seeds included) following
    ``edges(src, dst)`` forward. O(n) frontier state, one join + one
    dedup per hop; hop count ≤ graph diameter."""
    pin = Pin(edges.sparkSession, "set_reachable")
    reached = pin(seeds.select("id").distinct(), "reached")
    frontier = reached
    for _ in range(max_iter):
        nxt = (
            frontier.join(edges.withColumnRenamed("src", "id"), "id")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
        )
        nxt = pin(nxt, "frontier")
        if nxt.isEmpty():
            break
        reached = pin(reached.unionByName(nxt), "reached")
        frontier = nxt
    # materialize off the pin directory before tearing it down
    out = reached.localCheckpoint(eager=True)
    pin.close()
    return out


def bowtie_decomposition(graph: Graph, max_rounds: int = 100) -> DataFrame:
    """(id, region) per Broder's taxonomy (regions listed in the module
    docstring). Core = largest SCC, ties broken by min component id.

    Directed graphs only: on an undirected Graph the stored canonical
    edge orientation is arbitrary and the forward/backward sweeps would
    classify regions by storage accident (every connected vertex belongs
    in core anyway — use connected_components there)."""
    from linkgraph.algs.components import strongly_connected_components

    if not graph.directed:
        raise ValueError(
            "bowtie_decomposition requires a directed graph; an undirected "
            "graph's bow-tie is its connected components (all core)"
        )
    e = graph.edges.select("src", "dst").distinct().persist()
    et = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    nodes = graph.nodes().persist()

    scc = strongly_connected_components(graph, max_rounds=max_rounds)
    top = (
        scc.groupBy("component")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "component")
        .limit(1)
    )
    core = scc.join(F.broadcast(top), "component").select("id").persist()

    fwd_core = set_reachable(e, core).persist()   # core ∪ OUT
    bwd_core = set_reachable(et, core).persist()  # core ∪ IN
    out_ = fwd_core.join(core, "id", "left_anti").persist()
    in_ = bwd_core.join(core, "id", "left_anti").persist()

    # fringes: forward from IN / backward from OUT, minus the main regions
    main = fwd_core.unionByName(bwd_core).distinct().persist()
    f_in = set_reachable(e, in_).join(main, "id", "left_anti").persist()
    b_out = set_reachable(et, out_).join(main, "id", "left_anti").persist()

    tube = f_in.join(b_out, "id", "left_semi")
    lab = (
        nodes.join(core.withColumn("_c", F.lit(1)), "id", "left")
        .join(in_.withColumn("_i", F.lit(1)), "id", "left")
        .join(out_.withColumn("_o", F.lit(1)), "id", "left")
        .join(tube.withColumn("_t", F.lit(1)), "id", "left")
        .join(f_in.withColumn("_fi", F.lit(1)), "id", "left")
        .join(b_out.withColumn("_bo", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_c") == 1, "core")
            .when(F.col("_i") == 1, "in")
            .when(F.col("_o") == 1, "out")
            .when(F.col("_t") == 1, "tube")
            .when(F.col("_fi") == 1, "tendril_in")
            .when(F.col("_bo") == 1, "tendril_out")
            .otherwise("disconnected")
            .alias("region"),
        )
    )
    res = lab.localCheckpoint(eager=True)
    for df in (e, nodes, core, fwd_core, bwd_core, out_, in_, main, f_in, b_out):
        df.unpersist()
    return res
