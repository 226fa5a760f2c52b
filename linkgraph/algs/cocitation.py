"""Co-citation & bibliographic coupling — similarity graphs derived from
link structure.

Public-knowledge anchors: co-citation (Small 1973) pairs (u, v) cited BY
a common page (w→u, w→v); bibliographic coupling (Kessler 1963) pairs
(u, v) citing a common page (u→w, v→w). On the web graph these are the
"pages like this one" primitives (SALSA's bipartite walk is their
normalized cousin) and the backbone of related-page retrieval.

Spark shape: one self-join on the pivot endpoint + one hash aggregation
on the (u, v) pair. The fan-out per pivot w is deg(w)², so the plan
carries the same heavy-hitter discipline as the dedup family
(`max_shingle_freq`): ``max_pivot_degree`` drops pivots whose degree
exceeds the cap BEFORE the join (a page citing 10⁵ others, or cited by
10⁶, contributes noise-similarity anyway — the standard practice is to
drop or downweight them). With the cap, candidate volume is
Σ min(deg, cap)² — bounded per pivot, skew-proof at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph

__all__ = ["co_citation", "bibliographic_coupling"]


def _paired(e: DataFrame, pivot: str, out: str, cap: int | None) -> DataFrame:
    if cap is not None:
        deg = e.groupBy(pivot).agg(F.count("*").alias("_d"))
        e = e.join(deg.where(F.col("_d") <= cap).drop("_d"), pivot)
    a = e.select(F.col(pivot).alias("_w"), F.col(out).alias("u"))
    b = e.select(F.col(pivot).alias("_w"), F.col(out).alias("v"))
    return (
        a.join(b, "_w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_common"))
    )


def co_citation(graph: Graph, max_pivot_degree: int | None = 10_000) -> DataFrame:
    """(u, v, n_common) with u < v — number of pages that cite BOTH u and
    v. Pivot = the citing page; its out-degree bounds the pair fan-out,
    capped by ``max_pivot_degree`` (None disables)."""
    e = graph.edges.select("src", "dst").distinct()
    return _paired(e, "src", "dst", max_pivot_degree)


def bibliographic_coupling(
    graph: Graph, max_pivot_degree: int | None = 10_000
) -> DataFrame:
    """(u, v, n_common) with u < v — number of pages that BOTH u and v
    cite. Pivot = the cited page; its in-degree (hub skew lives here)
    bounds the fan-out, capped by ``max_pivot_degree``."""
    e = graph.edges.select("src", "dst").distinct()
    return _paired(e, "dst", "src", max_pivot_degree)
