"""DAG utilities: distributed topological sort via Kahn layer peeling.

Reference parity: NetworKit ``GraphTools::topologicalSort``
(networkit/cpp/graph/GraphTools.cpp) produces one sequential order via
DFS. A single total order is meaningless on a cluster; the distributed
analogue is the *layer decomposition* (Kahn peeling): level(v) = length of
the longest path ending at v. Sorting by (level, id) yields a valid
topological order, and the levels themselves are what scheduling /
dependency-analysis consumers actually want.

Scale shape: each round is one anti-join (find current sources) + one
anti-join (drop their out-edges) — both hash joins on id, no windows, no
driver-side state beyond a scalar count. Rounds = longest-path length
(the DAG depth), the same O(depth) superstep bill every layered traversal
pays. Cycles are detected exactly: no sources left while edges remain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graph import Graph


def topological_levels(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, level) for a directed acyclic graph.

    ``level`` is the Kahn peel round at which the vertex became a source,
    i.e. the longest-path distance from the source frontier. Raises
    ``ValueError`` on a cycle (no level assignment exists).
    """
    if not graph.directed:
        raise ValueError("topological_levels requires a directed graph")
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = graph.nodes().localCheckpoint(eager=True)
    out: list[DataFrame] = []
    for level in range(max_iter):
        if nodes.isEmpty():
            return _stack(out, graph)
        # Sources of the remaining subgraph: vertices with no incoming edge.
        dsts = edges.select(F.col("dst").alias("id")).distinct()
        sources = nodes.join(dsts, "id", "left_anti").localCheckpoint(eager=True)
        if sources.isEmpty():
            raise ValueError("graph has a cycle: no topological order exists")
        out.append(sources.select("id", F.lit(level).cast("int").alias("level")))
        nodes = nodes.join(sources, "id", "left_anti").localCheckpoint(eager=True)
        edges = edges.join(
            sources.withColumnRenamed("id", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
    raise ValueError(f"topological_levels did not terminate in {max_iter} rounds")


def _stack(parts: list[DataFrame], graph: Graph) -> DataFrame:
    if not parts:
        return graph.nodes().select("id", F.lit(0).cast("int").alias("level")).limit(0)
    res = parts[0]
    for p in parts[1:]:
        res = res.unionAll(p)
    return res


def topological_order(graph: Graph, max_iter: int = 10_000) -> DataFrame:
    """(id, level, pos) — one concrete topological order: vertices sorted by
    (level, id) with a dense 0..n-1 position. The global sort window is
    fixture-scale sugar over :func:`topological_levels`; at 10^12 scale
    consume the levels directly."""
    from pyspark.sql import Window

    lv = topological_levels(graph, max_iter=max_iter)
    w = Window.orderBy("level", "id")
    return lv.select(
        "id", "level", (F.row_number().over(w) - 1).cast("bigint").alias("pos")
    )
