"""Edge-DataFrame graph handle — the engine's core data model.

Reference parity: NetworKit's ``Graph`` (networkit/cpp/graph/Graph.hpp) is an
in-memory adjacency array with ``weighted``/``directed`` flags, degree views
and ``GraphTools`` transforms (toUndirected, transpose, subgraphFromNodes,
getCompactedGraph, density, volume). Here the graph IS a DataFrame
``(src BIGINT, dst BIGINT, weight DOUBLE)`` plus the same two flags; every
"method" is a declarative DataFrame program Catalyst can optimize — no
adjacency structure is ever materialized driver-side.

Scale notes:
- ``symmetrize`` is a union + dedup, one shuffle; results should be
  checkpointed/cached by iterative callers (they are, via Superstep).
- ``degrees`` is a partial+final hash agg (map-side combine — no raw edge
  shuffle of the full table when AQE/partial aggregation applies).
- ``orient_by_degree`` (for triangles) makes hub vertices the high side so
  out-wedge fan-out per row stays bounded — the distributed twin of
  NetworKit's degree-ordered adjacency trick.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, functions as F

EDGE_COLS = ("src", "dst", "weight")


def _with_weight(edges: DataFrame) -> DataFrame:
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    return edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )


@dataclass(frozen=True)
class Graph:
    """Immutable handle over an edge DataFrame.

    ``edges`` holds one row per stored edge. For ``directed=False`` the
    convention is one row per unordered pair (either orientation);
    :meth:`symmetric_edges` expands to both directions on demand.
    """

    edges: DataFrame
    directed: bool = False
    weighted: bool = False
    _sym_cache: list = field(default_factory=list, compare=False, repr=False)

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_edges(edges: DataFrame, directed: bool = False, weighted: bool = False) -> "Graph":
        return Graph(_with_weight(edges), directed=directed, weighted=weighted)

    # -- basic views -------------------------------------------------------
    def symmetric_edges(self) -> DataFrame:
        """Both-direction edge view ``(src, dst, weight)``.

        Directed graphs are symmetrized (direction ignored); undirected
        stored pairs are expanded. Self-loops contribute a single row.
        Dedup keeps max weight so that duplicate input pairs are stable.
        """
        if self._sym_cache:
            return self._sym_cache[0]
        e = self.edges
        both = e.select("src", "dst", "weight").unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        )
        sym = both.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        self._sym_cache.append(sym)
        return sym

    def transpose(self) -> "Graph":
        """Reverse every edge (GraphTools::transpose) — a column swap, no shuffle."""
        t = self.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return replace(self, edges=t, _sym_cache=[])

    def to_undirected(self) -> "Graph":
        if not self.directed:
            return self
        canon = self.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        return Graph(canon, directed=False, weighted=self.weighted)

    def to_unweighted(self) -> "Graph":
        return replace(
            self,
            edges=self.edges.withColumn("weight", F.lit(1.0)),
            weighted=False,
            _sym_cache=[],
        )

    # -- nodes -------------------------------------------------------------
    def nodes(self) -> DataFrame:
        """Distinct vertex ids ``(id)`` appearing on any endpoint."""
        e = self.edges
        return (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .distinct()
        )

    def num_nodes(self) -> int:
        return self.nodes().count()

    def num_edges(self) -> int:
        return self.edges.count()

    # -- degrees (NetworKit Graph::degree/degreeIn/degreeOut/weightedDegree)
    def out_degrees(self) -> DataFrame:
        """(id, degree, weighted_degree) by outgoing edges; isolated-on-out
        nodes appear with 0 via a left join against the full node set."""
        agg = self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree"),
            F.sum("weight").alias("weighted_degree"),
        )
        return self._fill_zero(agg)

    def in_degrees(self) -> DataFrame:
        agg = self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("degree"),
            F.sum("weight").alias("weighted_degree"),
        )
        return self._fill_zero(agg)

    def degrees(self) -> DataFrame:
        """Undirected degree over the symmetrized view. Self-loops count 1
        here (row (v,v) appears once in symmetric_edges)."""
        agg = self.symmetric_edges().groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("degree"),
            F.sum("weight").alias("weighted_degree"),
        )
        return self._fill_zero(agg)

    def _fill_zero(self, agg: DataFrame) -> DataFrame:
        return (
            self.nodes()
            .join(agg, "id", "left")
            .select(
                "id",
                F.coalesce("degree", F.lit(0)).alias("degree"),
                F.coalesce("weighted_degree", F.lit(0.0)).alias("weighted_degree"),
            )
        )

    # -- transforms ---------------------------------------------------------
    def subgraph(self, node_ids: DataFrame) -> "Graph":
        """GraphTools::subgraphFromNodes — keep edges with BOTH endpoints in
        ``node_ids`` (column ``id``). Two left-semi joins: no payload widening,
        broadcastable when the node set is small."""
        ids = node_ids.select(F.col("id"))
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst", "weight")
        )
        return replace(self, edges=e, _sym_cache=[])

    def compact_ids(self) -> tuple["Graph", DataFrame]:
        """GraphTools::getContinuousNodeIds — dense 0..n-1 relabeling.

        Returns (relabeled graph, mapping(id, new_id)). Uses a global sort
        window once; intended for fixture-scale parity checks only — at
        10^12 scale keep hash ids (see extract.dictionary_encode).
        """
        from pyspark.sql import Window

        mapping = self.nodes().select(
            "id",
            (F.row_number().over(Window.orderBy("id")) - 1).cast("bigint").alias("new_id"),
        )
        e = (
            self.edges.join(mapping.withColumnRenamed("id", "src"), "src")
            .drop("src")
            .withColumnRenamed("new_id", "src")
            .join(mapping.withColumnRenamed("id", "dst"), "dst")
            .drop("dst")
            .withColumnRenamed("new_id", "dst")
            .select("src", "dst", "weight")
        )
        return replace(self, edges=e, _sym_cache=[]), mapping

    def remove_self_loops(self) -> "Graph":
        return replace(self, edges=self.edges.where(F.col("src") != F.col("dst")), _sym_cache=[])

    def orient_by_degree(self) -> DataFrame:
        """Orient each undirected edge from the (degree, id)-smaller endpoint
        to the larger: the canonical skew-killer for triangle/wedge plans.

        Returns (src, dst) with self-loops dropped and exact dedup. The total
        out-degree of any vertex in the oriented graph is O(sqrt(m)), so the
        wedge self-join below it cannot blow up on hub vertices.
        """
        deg = self.degrees().select("id", "degree")
        e = (
            self.symmetric_edges()
            .where(F.col("src") != F.col("dst"))
            .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
            .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
        )
        keep: Column = (F.col("sdeg") < F.col("ddeg")) | (
            (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
        )
        return e.where(keep).select("src", "dst")

    def append(self, other: "Graph") -> "Graph":
        """GraphTools::append — disjoint union: ``other``'s vertex ids are
        shifted past this graph's max id so the two vertex sets cannot
        collide. Two scalar aggs + a column add: no shuffle beyond the
        union itself. Returns the combined graph (directed/weighted flags
        follow ``self``).

        Like the reference (which indexes by upperNodeIdBound), this
        assumes DENSE non-negative ids: full-range xxhash64 ids admit no
        collision-free offset, and the shift would overflow the 64-bit
        domain (a hard error under ANSI mode, a silent corruption without
        it) — so both conditions raise with a pointer to compact_ids."""
        lo_s, hi_s = self._id_range()
        lo_o, hi_o = other._id_range()
        offset = hi_s + 1
        if lo_s < 0 or lo_o < 0 or hi_o > (1 << 62):
            raise ValueError(
                "append requires dense non-negative ids on both graphs "
                "(hash-id graphs have no collision-free shift); run "
                "compact_ids() first"
            )
        shifted = other.edges.select(
            (F.col("src") + F.lit(offset)).alias("src"),
            (F.col("dst") + F.lit(offset)).alias("dst"),
            "weight",
        )
        return replace(self, edges=self.edges.unionAll(shifted), _sym_cache=[])

    def _id_range(self) -> tuple[int, int]:
        row = self.edges.agg(
            F.least(F.min("src"), F.min("dst")).alias("lo"),
            F.greatest(F.max("src"), F.max("dst")).alias("hi"),
        ).collect()[0]
        lo = int(row["lo"]) if row["lo"] is not None else 0
        hi = int(row["hi"]) if row["hi"] is not None else -1
        return lo, hi

    def merge(self, other: "Graph") -> "Graph":
        """GraphTools::merge — union on a SHARED id space: edges present in
        either graph, duplicate pairs deduped keeping max weight (consistent
        with symmetric_edges' dedup rule). Pure union + hash agg."""
        both = self.edges.unionAll(other.edges.select("src", "dst", "weight"))
        merged = both.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        return replace(self, edges=merged, _sym_cache=[])

    # -- scalar stats (GraphTools::density/volume/maxDegree) ----------------
    def density(self) -> float:
        n = self.num_nodes()
        m = self.num_edges()
        if n < 2:
            return 0.0
        return m / (n * (n - 1)) if self.directed else 2.0 * m / (n * (n - 1))

    def volume(self) -> float:
        row = self.edges.agg(F.sum("weight").alias("w")).collect()[0]
        w = row["w"] or 0.0
        return float(w) if self.directed else 2.0 * float(w)

    def max_degree(self) -> int:
        row = self.degrees().agg(F.max("degree").alias("m")).collect()[0]
        return int(row["m"] or 0)


def attach_attribute(nodes_or_graph, attrs: DataFrame, name: str) -> DataFrame:
    """Node-attribute attachment (Graph.hpp attachNodeAttribute analogue):
    the engine's attribute model is columnar — an attribute IS an
    (id, value) DataFrame, and "attaching" is a left join producing the
    widened node table (missing values stay null, as the reference's
    unset slots do). Accepts a Graph or a node DataFrame."""
    base = nodes_or_graph.nodes() if isinstance(nodes_or_graph, Graph) else nodes_or_graph
    return base.join(
        attrs.select("id", F.col(attrs.columns[1]).alias(name)), "id", "left"
    )


def attach_edge_attribute(graph: Graph, attrs: DataFrame, name: str) -> DataFrame:
    """Typed edge-attribute attachment (Graph.hpp attachEdgeAttribute
    analogue): an edge attribute IS a ``(src, dst, value)`` DataFrame whose
    value column keeps its own Spark type (int/double/string/array — the
    reference's ``EdgeAttribute<T>``); "attaching" is a left equi-join
    producing the widened edge table ``(src, dst, weight, <name>)``.
    Missing edges stay null, as the reference's unset slots do.

    Undirected graphs match the attribute row in EITHER orientation: both
    sides join on canonical (least, greatest) keys, so an attribute stated
    as (v, u) reaches the stored row (u, v). Duplicate attribute rows for
    one edge are reduced by max (the symmetric_edges dedup rule) so the
    join cannot fan edges out. One shuffle; broadcastable when the
    attribute table is small."""
    val = F.col(attrs.columns[2]).alias(name)
    if graph.directed:
        a = attrs.select("src", "dst", val).groupBy("src", "dst").agg(
            F.max(name).alias(name)
        )
        return graph.edges.join(a, ["src", "dst"], "left")
    a = (
        attrs.select(
            F.least("src", "dst").alias("_lo"),
            F.greatest("src", "dst").alias("_hi"),
            val,
        )
        .groupBy("_lo", "_hi")
        .agg(F.max(name).alias(name))
    )
    e = graph.edges.withColumn("_lo", F.least("src", "dst")).withColumn(
        "_hi", F.greatest("src", "dst")
    )
    return e.join(a, ["_lo", "_hi"], "left").select("src", "dst", "weight", name)


def symmetric_edges_with_attribute(
    graph: Graph, attrs: DataFrame, name: str
) -> DataFrame:
    """Both-direction edge view widened with a typed edge attribute: each
    stored edge's value rides BOTH orientations (attribute propagation
    through symmetrize). Same dedup discipline as Graph.symmetric_edges."""
    e = attach_edge_attribute(graph, attrs, name)
    both = e.unionAll(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight", name
        )
    )
    return both.groupBy("src", "dst").agg(
        F.max("weight").alias("weight"), F.max(name).alias(name)
    )


def filter_edge_attribute(graph: Graph, attrs: DataFrame) -> DataFrame:
    """Attribute propagation through subgraph/sparsification: keep only
    attribute rows whose edge survives in ``graph`` (orientation-blind for
    undirected graphs). Left-semi join — no payload widening; the invariant
    ``attach(subgraph, filter(subgraph, attrs)) == attach(subgraph, attrs)``
    holds by construction and is pinned by tests/test_edge_attrs.py."""
    if graph.directed:
        return attrs.join(graph.edges.select("src", "dst"), ["src", "dst"], "semi")
    canon = graph.edges.select(
        F.least("src", "dst").alias("_lo"), F.greatest("src", "dst").alias("_hi")
    )
    a = attrs.withColumn("_lo", F.least("src", "dst")).withColumn(
        "_hi", F.greatest("src", "dst")
    )
    return a.join(canon, ["_lo", "_hi"], "semi").drop("_lo", "_hi")
