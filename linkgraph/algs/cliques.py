"""Maximal clique enumeration — distributed Bron–Kerbosch over
degree-oriented ego-nets.

Reference parity: NetworKit ``MaximalCliques``
(networkit/cpp/clique/MaximalCliques.cpp) runs Eppstein–Löffler–Strash
(Bron–Kerbosch with degeneracy ordering) over the in-memory adjacency.
The distributed decomposition used here is the standard one for that
algorithm family: every maximal clique C has a unique minimum vertex ``a``
under the (degree, id) total order, and C \\ {a} lies entirely inside
``a``'s *forward* neighborhood N+(a) (out-neighbors under
``orient_by_degree``). So the global problem splits into one independent
subproblem per pivot vertex:

- candidates  P  = N+(a)                       (one row per oriented edge)
- P–P edges      = triangles a→b→c             (the wedge-join plan already
                                                used by triangle counting)
- X adjacency    = triangles u→a→b, keyed by a (u is an *earlier* vertex
                                                adjacent to both a and b)

Bron–Kerbosch with pivoting runs inside ``applyInPandas`` on each group —
the per-group work is bounded because |N+(a)| = O(sqrt m) under degree
orientation — and a clique maximal in the ego subgraph is emitted only if
no earlier vertex u ∈ N-(a) is adjacent to all of it (the X filter), which
makes the output exactly the maximal cliques of G, each exactly once.

Scale shape: three shuffles (orientation join, triangle join, groupBy
pivot), Arrow-batched Python only on the per-ego-net subproblems. Worst
case remains exponential in the largest ego-net clique structure — as it
is for every BK variant — but the *partitioning* is skew-safe: hubs are
split to the low-degree side of every subproblem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..graph import Graph

_OUT_SCHEMA = StructType(
    [
        StructField("members", ArrayType(LongType()), False),
        StructField("size", IntegerType(), False),
    ]
)


def _bk_pivot(adj: dict, R: set, P: set, X: set, out: list) -> None:
    """Classic Bron–Kerbosch with greedy pivoting on an adjacency dict."""
    if not P and not X:
        out.append(sorted(R))
        return
    empty: set = set()
    pivot = max(P | X, key=lambda u: len(adj.get(u, empty) & P))
    for v in list(P - adj.get(pivot, set())):
        nv = adj.get(v, set())
        _bk_pivot(adj, R | {v}, P & nv, X & nv, out)
        P.discard(v)
        X.add(v)


def _ego_cliques(pdf):
    import pandas as pd

    pivot = int(pdf["pivot"].iloc[0])
    P: set = set()
    adj: dict = {}
    xadj: dict = {}
    for kind, u, v in zip(pdf["kind"], pdf["u"], pdf["v"]):
        if kind == 0:
            P.add(int(u))
        elif kind == 1:
            a, b = int(u), int(v)
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        else:
            xadj.setdefault(int(u), set()).add(int(v))
    found: list = []
    _bk_pivot(adj, set(), set(P), set(), found)
    rows = []
    for K in found:
        body = set(K)
        # X filter: an earlier vertex adjacent to pivot and to every member
        # would extend the clique — then it is not maximal in G.
        if any(body <= nbrs for nbrs in xadj.values()):
            continue
        members = sorted([pivot] + K)
        rows.append((members, len(members)))
    return pd.DataFrame(rows, columns=["members", "size"])


def maximal_cliques(graph: Graph) -> DataFrame:
    """(members array<bigint> sorted, size) — one row per maximal clique.

    Includes singleton cliques for vertices whose only incident edges are
    self-loops (the only way a vertex with no proper neighbor exists in the
    edge-table model).
    """
    o = graph.orient_by_degree().persist()
    try:
        p_rows = o.select(
            F.col("src").alias("pivot"),
            F.lit(0).alias("kind"),
            F.col("dst").alias("u"),
            F.lit(None).cast("bigint").alias("v"),
        )
        e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
        pp_rows = tri.select(
            F.col("a").alias("pivot"),
            F.lit(1).alias("kind"),
            F.col("b").alias("u"),
            F.col("c").alias("v"),
        )
        x_rows = tri.select(
            F.col("b").alias("pivot"),
            F.lit(2).alias("kind"),
            F.col("a").alias("u"),
            F.col("c").alias("v"),
        )
        work = p_rows.unionAll(pp_rows).unionAll(x_rows)
        cliques = work.groupBy("pivot").applyInPandas(_ego_cliques, _OUT_SCHEMA)

        proper = graph.symmetric_edges().where(F.col("src") != F.col("dst"))
        loners = (
            graph.nodes()
            .join(proper.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
            .select(
                F.array(F.col("id")).alias("members"),
                F.lit(1).cast("int").alias("size"),
            )
        )
        return cliques.unionAll(loners).localCheckpoint(eager=True)
    finally:
        o.unpersist()


def clique_size_histogram(graph: Graph) -> DataFrame:
    """(size, n_cliques) — the usual summary consumers ask of MaximalCliques."""
    return (
        maximal_cliques(graph)
        .groupBy("size")
        .agg(F.count("*").alias("n_cliques"))
        .orderBy("size")
    )
