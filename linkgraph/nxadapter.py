"""networkx interop — fixture-scale bridge, NOT a scale path.

Reference parity: NetworKit ships ``networkit.nxadapter`` with ``nk2nx`` /
``nx2nk`` so users can round-trip small graphs into networkx for algorithms
or plotting. The Spark twin collects the edge DataFrame to the driver, so it
is gated behind an explicit ``max_edges`` budget — converting a web-scale
edge table into a driver-side object is never meaningful; the adapter exists
for test oracles, notebooks, and sub-million-edge analysis hand-offs.

networkx itself is imported lazily (it is an optional dependency of the
engine; the test image has it, a production cluster need not).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from linkgraph.graph import Graph

DEFAULT_MAX_EDGES = 5_000_000


def to_networkx(graph: Graph, max_edges: int = DEFAULT_MAX_EDGES):
    """Collect a Graph into a networkx (Di)Graph (nxadapter.nk2nx).

    Weighted graphs carry ``weight`` edge attributes. Raises ValueError if
    the edge count exceeds ``max_edges`` — the caller must subsample or
    subgraph first; silent multi-GB collects are a driver OOM, not a
    feature.
    """
    import networkx as nx

    n = graph.num_edges()
    if n > max_edges:
        raise ValueError(
            f"graph has {n} edges > max_edges={max_edges}; "
            "subgraph()/sample first — to_networkx is driver-side"
        )
    g = nx.DiGraph() if graph.directed else nx.Graph()
    for row in graph.edges.collect():
        if graph.weighted:
            g.add_edge(int(row["src"]), int(row["dst"]), weight=float(row["weight"]))
        else:
            g.add_edge(int(row["src"]), int(row["dst"]))
    # isolated vertices (present in nodes() via degree-0 fill) are lost by
    # edge iteration only when the graph has none stored; Graph's node set
    # is derived from edges, so nothing further to add.
    return g


def from_networkx(spark: SparkSession, g) -> Graph:
    """Build a Graph from a networkx graph (nxadapter.nx2nk).

    Node labels must be int-castable. Edge ``weight`` attributes (if any)
    mark the result weighted.
    """
    weighted = any("weight" in d for _, _, d in g.edges(data=True))
    rows = [
        (int(u), int(v), float(d.get("weight", 1.0)))
        for u, v, d in g.edges(data=True)
    ]
    df = spark.createDataFrame(rows or [], "src bigint, dst bigint, weight double")
    return Graph.from_edges(df, directed=g.is_directed(), weighted=weighted)
