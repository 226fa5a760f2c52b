"""k-truss decomposition — dense-subgraph mining by support peeling.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge is
supported by at least k−2 triangles WITHIN the subgraph — the standard
cohesive-subgraph relaxation of cliques, and a classic web-graph signal
(link farms and boilerplate navigation rings survive high-k trusses;
organic editorial links don't). Not in NetworKit's API — included as an
engine extra on the same degree-oriented triangle machinery.

Spark shape: peeling supersteps. Each round recomputes per-edge support
over the SURVIVING edge set (one wedge join + one (u,w) hash-agg — the
per-vertex fan-out is bounded by degree orientation on the expansion
side), drops under-supported edges, and stops at a fixpoint. Edge count
is monotone decreasing, so the loop terminates in ≤ |peeled rounds|;
state is the canonical half-edge table only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _support(half: DataFrame) -> DataFrame:
    """(u, w, sup) — triangles through each canonical (u<w) edge of the
    undirected graph ``half`` represents. Wedges expand from the
    LOWER-DEGREE endpoint ((degree, id) orientation — the triangle
    counter's O(√m) fan-out bound), then close with a semi-join against
    the other endpoint's adjacency."""
    a = half.select("u", "w").unionAll(
        half.select(F.col("w").alias("u"), F.col("u").alias("w"))
    )
    deg = a.groupBy("u").agg(F.count("*").alias("d"))
    h = (
        half.join(deg.withColumnRenamed("d", "du"), "u")
        .join(
            deg.select(F.col("u").alias("w"), F.col("d").alias("dw")), "w"
        )
    )
    lo_first = (F.col("du") < F.col("dw")) | (
        (F.col("du") == F.col("dw")) & (F.col("u") < F.col("w"))
    )
    h2 = h.select(
        "u",
        "w",
        F.when(lo_first, F.col("u")).otherwise(F.col("w")).alias("lo"),
        F.when(lo_first, F.col("w")).otherwise(F.col("u")).alias("hi"),
    )
    cand = h2.join(
        a.select(F.col("u").alias("lo"), F.col("w").alias("x")), "lo"
    ).where(F.col("x") != F.col("hi"))
    closed = cand.join(
        a.select(F.col("u").alias("hi"), F.col("w").alias("x")),
        ["hi", "x"],
        "left_semi",
    )
    return closed.groupBy("u", "w").agg(F.count("*").alias("sup"))


def k_truss(graph: Graph, k: int, max_rounds: int = 10_000) -> DataFrame:
    """(src, dst) — the canonical (src<dst) edges of the k-truss.
    ``k=3`` keeps every edge in at least one triangle; ``k=2`` is the
    whole (self-loop-free) graph. Matches networkx.k_truss edge sets."""
    half = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    need = max(int(k) - 2, 0)
    for _ in range(max_rounds):
        if need == 0:
            break
        n_before = half.count()
        if n_before == 0:
            break
        sup = _support(half)
        half = (
            half.join(sup, ["u", "w"], "left")
            .where(F.coalesce("sup", F.lit(0)) >= need)
            .select("u", "w")
            .localCheckpoint(eager=True)
        )
        if half.count() == n_before:
            break
    return half.select(F.col("u").alias("src"), F.col("w").alias("dst"))


def trussness(graph: Graph, max_k: int = 64) -> DataFrame:
    """(src, dst, trussness) — the largest k for which the edge survives
    the k-truss (≥ 2 for every edge). Implemented as ascending peels,
    reusing each truss as the next round's input (the dominant cost, the
    k=3 peel, is paid once)."""
    cur = k_truss(graph, 2)
    g = Graph.from_edges(
        cur.withColumn("weight", F.lit(1.0)), directed=False, weighted=False
    )
    out = cur.select("src", "dst", F.lit(2).alias("trussness"))
    for k in range(3, max_k + 1):
        nxt = k_truss(g, k)
        if nxt.isEmpty():
            break
        out = (
            out.join(nxt.withColumn("_in", F.lit(True)), ["src", "dst"], "left")
            .select(
                "src",
                "dst",
                F.when(F.col("_in"), F.lit(k)).otherwise(F.col("trussness")).alias(
                    "trussness"
                ),
            )
            .localCheckpoint(eager=True)
        )
        g = Graph.from_edges(
            nxt.withColumn("weight", F.lit(1.0)), directed=False, weighted=False
        )
    return out
