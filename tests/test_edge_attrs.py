"""Typed edge attributes (Graph.hpp attachEdgeAttribute analogue):
columnar (src, dst, value) attach, orientation-blind matching on
undirected graphs, typed values, and propagation through
symmetrize / orient / subgraph."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import (
    Graph,
    attach_edge_attribute,
    filter_edge_attribute,
    symmetric_edges_with_attribute,
)
from tests.conftest import make_graph


def _attrs(spark, rows, schema="src bigint, dst bigint, kind string"):
    return spark.createDataFrame(rows, schema)


def test_attach_round_trip_undirected(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    # attribute stated in the OPPOSITE orientation of storage must match
    attrs = _attrs(spark, [(1, 0, "a"), (1, 2, "b")])
    out = attach_edge_attribute(g, attrs, "kind")
    got = {(r["src"], r["dst"]): r["kind"] for r in out.collect()}
    assert len(got) == 3
    assert got[(0, 1)] == "a" and got[(1, 2)] == "b" and got[(2, 3)] is None
    # round-trip: re-extract non-null rows == canonical attrs
    back = sorted(
        (min(s, d), max(s, d), k) for (s, d), k in got.items() if k is not None
    )
    assert back == [(0, 1, "a"), (1, 2, "b")]


def test_attach_directed_orientation_sensitive(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0)], "src bigint, dst bigint, weight double"
    )
    g = Graph.from_edges(e, directed=True)
    attrs = _attrs(spark, [(0, 1, "fwd")])
    got = {
        (r["src"], r["dst"]): r["kind"]
        for r in attach_edge_attribute(g, attrs, "kind").collect()
    }
    assert got[(0, 1)] == "fwd" and got[(1, 0)] is None


def test_typed_values_preserved(spark):
    g = make_graph(spark, [(0, 1), (1, 2)])
    attrs = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, -1.0)], "src bigint, dst bigint, cost double"
    )
    out = attach_edge_attribute(g, attrs, "cost")
    assert dict(out.dtypes)["cost"] == "double"
    arr = spark.createDataFrame(
        [(0, 1, [1, 2, 3])], "src bigint, dst bigint, tags array<int>"
    )
    out2 = attach_edge_attribute(g, arr, "tags")
    assert dict(out2.dtypes)["tags"] == "array<int>"
    got = {(r["src"], r["dst"]): r["tags"] for r in out2.collect()}
    assert got[(0, 1)] == [1, 2, 3]


def test_symmetrize_propagation(spark):
    g = make_graph(spark, [(0, 1), (1, 2)])
    attrs = _attrs(spark, [(0, 1, "x")])
    sym = symmetric_edges_with_attribute(g, attrs, "kind")
    got = {(r["src"], r["dst"]): r["kind"] for r in sym.collect()}
    # the value rides BOTH orientations
    assert got[(0, 1)] == "x" and got[(1, 0)] == "x"
    assert got[(1, 2)] is None and got[(2, 1)] is None
    assert len(got) == 4


def test_subgraph_propagation(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    attrs = _attrs(spark, [(0, 1, "keep"), (2, 3, "drop"), (3, 0, "gone")])
    ids = spark.createDataFrame([(0,), (1,), (2,)], "id bigint")
    sub = g.subgraph(ids)
    kept = filter_edge_attribute(sub, attrs)
    rows = sorted((r["src"], r["dst"], r["kind"]) for r in kept.collect())
    assert rows == [(0, 1, "keep")]
    # invariant: attach(sub, filter(sub, attrs)) == attach(sub, attrs)
    a = sorted(
        (r["src"], r["dst"], r["kind"])
        for r in attach_edge_attribute(sub, kept, "kind").collect()
    )
    b = sorted(
        (r["src"], r["dst"], r["kind"])
        for r in attach_edge_attribute(sub, attrs, "kind").collect()
    )
    assert a == b


def test_orient_propagation(spark):
    # attribute reaches the degree-oriented view via the symmetric widened
    # table — the pattern triangle/edge-score callers use
    g = make_graph(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
    attrs = _attrs(spark, [(1, 2, "t")])
    oriented = g.orient_by_degree()
    widened = oriented.join(
        symmetric_edges_with_attribute(g, attrs, "kind"), ["src", "dst"], "left"
    )
    got = {(r["src"], r["dst"]): r["kind"] for r in widened.collect()}
    assert len(got) == 4  # one row per undirected edge
    hit = [k for k, v in got.items() if v == "t"]
    assert hit in ([(1, 2)], [(2, 1)])


def test_duplicate_attr_rows_no_fanout(spark):
    g = make_graph(spark, [(0, 1)])
    attrs = _attrs(spark, [(0, 1, "a"), (1, 0, "b")])
    out = attach_edge_attribute(g, attrs, "kind")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["kind"] == "b"  # max-dedup, no fanout
