"""Degree-structure spectra: rich-club coefficient and the average
nearest-neighbor degree profile.

Public-knowledge anchors: rich-club φ(k) (Zhou & Mondragón 2004; Colizza
et al., Nature Physics 2006) — the edge density among nodes of degree
> k, the classic "do hubs link to each other" diagnostic for web/AS
graphs; knn(k) (Pastor-Satorras et al., PRL 2001) — the mean degree of
the neighbors of degree-k nodes, the full degree-correlation spectrum
that the scalar assortativity coefficient (``algs/centrality.py``)
summarizes. NetworKit exposes neither; they are engine extras next to
assortativity.

Spark shape: both reduce to degree joins plus aggregations over the
DEGREE DOMAIN, never the node domain. The rich-club suffix counts
(N_k, E_k) come from reverse-cumulative sums over the degree histogram —
the window there runs on the aggregated histogram (≤ max-degree rows,
thousands even on a trillion-edge web graph), not on data, so the
single-partition exchange it implies is bounded by the degree domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph

__all__ = ["rich_club", "avg_neighbor_degree"]


def rich_club(graph: Graph) -> DataFrame:
    """(k, n_nodes, n_edges, phi) for every degree value k present, where
    n_nodes = #nodes with degree > k, n_edges = #undirected edges whose
    BOTH endpoints have degree > k, and phi = 2·n_edges/(n_nodes·(n_nodes−1)).
    Rows with n_nodes < 2 are omitted (φ undefined). Uncorrected
    coefficient — normalize against a degree-preserving null model via
    ``sparsification.edge_switching`` replicates when needed."""
    # undirected edge list u<v, self-loops out — and degrees computed
    # from THIS edge set (graph.degrees() counts self-loops, which would
    # shift a looped vertex across k-thresholds the edge side ignores)
    e = (
        graph.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    em = (
        e.join(deg.select(F.col("id").alias("u"), F.col("degree").alias("_du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("degree").alias("_dv")), "v")
        .select(F.least("_du", "_dv").alias("m"))
    )
    # histograms over the degree domain (small), then reverse-cumulative:
    # N_k = Σ_{d>k} nodes(d), E_k = Σ_{m>k} edges(m), evaluated at each
    # present degree k via a strictly-following window frame.
    dh = deg.groupBy(F.col("degree").alias("k")).agg(F.count("*").alias("_nd"))
    eh = em.groupBy(F.col("m").alias("k")).agg(F.count("*").alias("_ne"))
    hist = dh.join(eh, "k", "full").select(
        "k",
        F.coalesce("_nd", F.lit(0)).alias("_nd"),
        F.coalesce("_ne", F.lit(0)).alias("_ne"),
    )
    w = (
        Window.orderBy("k")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    out = hist.select(
        "k",
        F.coalesce(F.sum("_nd").over(w), F.lit(0)).alias("n_nodes"),
        F.coalesce(F.sum("_ne").over(w), F.lit(0)).alias("n_edges"),
    )
    return out.where(F.col("n_nodes") >= 2).select(
        "k",
        "n_nodes",
        "n_edges",
        (
            F.lit(2.0) * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1))
        ).alias("phi"),
    )


def avg_neighbor_degree(graph: Graph) -> DataFrame:
    """(k, knn) — for each degree value k present, the mean over
    degree-k nodes of the mean degree of their neighbors
    (networkx ``average_degree_connectivity`` semantics on the
    symmetrized graph). Increasing knn(k) = assortative mixing,
    decreasing = hub-periphery (the web's usual shape)."""
    deg = graph.degrees().select("id", "degree")
    sym = graph.symmetric_edges().select("src", "dst").where(
        F.col("src") != F.col("dst")
    )
    nbdeg = (
        sym.join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dn")), "dst")
        .groupBy("src")
        .agg(F.avg("_dn").alias("_knn_node"))
    )
    return (
        nbdeg.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("k")), "src")
        .groupBy("k")
        .agg(F.avg("_knn_node").alias("knn"))
    )
