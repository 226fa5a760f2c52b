"""Binary interchange formats: graph-tool .gt and Thrill varint adjacency.

Round-trip oracles (write → read → identical edge set) plus hand-built
byte-level fixtures so the layouts are pinned independently of the
writers (a symmetric bug in reader+writer would survive a round-trip).
"""

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.io import (
    _GT_MAGIC,
    read_graphtool,
    read_thrill,
    write_graphtool,
    write_thrill,
)


def _edge_set(g: Graph):
    return {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}


@pytest.fixture(scope="module")
def directed_graph(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 1), (300, 4), (4, 300)],
        "src bigint, dst bigint",
    )
    return Graph.from_edges(edges, directed=True)


@pytest.fixture(scope="module")
def undirected_graph(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)], "src bigint, dst bigint"
    )
    return Graph.from_edges(edges, directed=False)


def test_graphtool_roundtrip_directed(spark, directed_graph, tmp_path):
    p = str(tmp_path / "g.gt")
    write_graphtool(directed_graph, p, comment="unit fixture")
    g2 = read_graphtool(spark, p)
    assert g2.directed
    assert _edge_set(g2) == _edge_set(directed_graph)
    # 301 nodes forces the 2-byte neighbor width branch
    raw = open(p, "rb").read()
    assert raw.startswith(_GT_MAGIC)


def test_graphtool_roundtrip_undirected(spark, undirected_graph, tmp_path):
    p = str(tmp_path / "u.gt")
    write_graphtool(undirected_graph, p)
    g2 = read_graphtool(spark, p)
    assert not g2.directed
    canon = lambda es: {(min(a, b), max(a, b)) for a, b in es}  # noqa: E731
    assert canon(_edge_set(g2)) == canon(_edge_set(undirected_graph))


def test_graphtool_pinned_bytes(spark, tmp_path):
    # hand-built little-endian v1 file: 3 vertices, directed,
    # adjacency 0->{1,2}, 1->{}, 2->{0}; width 1 (n=3 fits a byte)
    buf = bytearray(_GT_MAGIC)
    buf += bytes([1, 0])  # version, little-endian
    buf += (0).to_bytes(8, "little")  # empty comment
    buf += bytes([1])  # directed
    buf += (3).to_bytes(8, "little")
    buf += (2).to_bytes(8, "little") + bytes([1, 2])
    buf += (0).to_bytes(8, "little")
    buf += (1).to_bytes(8, "little") + bytes([0])
    p = tmp_path / "pinned.gt"
    p.write_bytes(bytes(buf))
    g = read_graphtool(spark, str(p))
    assert _edge_set(g) == {(0, 1), (0, 2), (2, 0)}


def test_graphtool_bad_magic(spark, tmp_path):
    p = tmp_path / "bad.gt"
    p.write_bytes(b"not a gt file at all")
    with pytest.raises(ValueError, match="bad magic"):
        read_graphtool(spark, str(p))


def test_thrill_roundtrip_directed(spark, directed_graph, tmp_path):
    p = str(tmp_path / "g.thrill")
    write_thrill(directed_graph, p)
    g2 = read_thrill(spark, p)
    assert g2.directed
    assert _edge_set(g2) == _edge_set(directed_graph)


def test_thrill_roundtrip_undirected(spark, undirected_graph, tmp_path):
    p = str(tmp_path / "u.thrill")
    write_thrill(undirected_graph, p)
    g2 = read_thrill(spark, p)
    canon = lambda es: {(min(a, b), max(a, b)) for a, b in es}  # noqa: E731
    assert canon(_edge_set(g2)) == canon(_edge_set(undirected_graph))


def test_thrill_pinned_varint(spark, tmp_path):
    # vertex 0 -> {200}: degree 1, then 200 = 0xC8 -> varint 0xC8 0x01;
    # vertex 1 -> {}; vertex 2 -> {0}
    buf = bytes([1, 1, 0xC8, 0x01, 0, 1, 0])
    p = tmp_path / "pinned.thrill"
    p.write_bytes(buf)
    g = read_thrill(spark, str(p))
    assert g.directed
    assert _edge_set(g) == {(0, 200), (2, 0)}


def test_thrill_multibyte_ids_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 16384), (16384, 1), (1, 127), (127, 128)], "src bigint, dst bigint"
    )
    g = Graph.from_edges(edges, directed=True)
    p = str(tmp_path / "big.thrill")
    write_thrill(g, p)
    assert _edge_set(read_thrill(spark, p)) == _edge_set(g)
