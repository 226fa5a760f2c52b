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


# ---------------------------------------------------------------------------
# NetworKit binary (nkbg)
# ---------------------------------------------------------------------------

from linkgraph.io import (  # noqa: E402
    _NKB_MAGIC,
    _nkb_varint_decode,
    _nkb_varint_encode,
    read_networkit_binary,
    write_networkit_binary,
)


def test_nkb_varint_codec_pinned():
    # 1-byte: value<<1 | 1; 2-byte: low bit pattern 10 then 14 value bits
    buf = bytearray()
    _nkb_varint_encode(0, buf)
    assert bytes(buf) == b"\x01"
    buf = bytearray()
    _nkb_varint_encode(127, buf)
    assert bytes(buf) == b"\xff"
    buf = bytearray()
    _nkb_varint_encode(128, buf)  # (128<<2|2) = 0x202 little-endian
    assert bytes(buf) == b"\x02\x02"
    buf = bytearray()
    _nkb_varint_encode(1 << 60, buf)  # escape byte + 8 raw bytes
    assert bytes(buf)[0] == 0 and len(buf) == 9
    for v in (0, 1, 127, 128, 16383, 16384, (1 << 56) - 1, 1 << 56, (1 << 64) - 1):
        buf = bytearray()
        _nkb_varint_encode(v, buf)
        got, pos = _nkb_varint_decode(bytes(buf), 0)
        assert got == v and pos == len(buf)


def test_nkb_roundtrip_directed(spark, directed_graph, tmp_path):
    p = str(tmp_path / "g.nkbg")
    write_networkit_binary(directed_graph, p, chunks=3)
    g2 = read_networkit_binary(spark, p)
    assert g2.directed and not g2.weighted
    assert _edge_set(g2) == _edge_set(directed_graph)
    assert open(p, "rb").read()[: len(_NKB_MAGIC)] == _NKB_MAGIC


def test_nkb_roundtrip_undirected(spark, undirected_graph, tmp_path):
    p = str(tmp_path / "u.nkbg")
    write_networkit_binary(undirected_graph, p, chunks=2)
    g2 = read_networkit_binary(spark, p)
    assert not g2.directed
    canon = lambda es: {(min(a, b), max(a, b)) for a, b in es}  # noqa: E731
    assert canon(_edge_set(g2)) == canon(_edge_set(undirected_graph))


def test_nkb_roundtrip_weighted(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 0.125), (2, 0, 7.0), (3, 1, 1e-9)],
        "src bigint, dst bigint, weight double",
    )
    g = Graph.from_edges(edges, directed=True, weighted=True)
    p = str(tmp_path / "w.nkbg")
    write_networkit_binary(g, p, chunks=2)
    g2 = read_networkit_binary(spark, p)
    assert g2.weighted
    got = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    want = {(r["src"], r["dst"]): r["weight"] for r in g.edges.collect()}
    assert got == want  # doubles round-trip bit-exactly


def test_nkb_chunks_exceed_nodes(spark, tmp_path):
    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    g = Graph.from_edges(edges, directed=True)
    p = str(tmp_path / "tiny.nkbg")
    write_networkit_binary(g, p, chunks=64)  # clamped to n
    assert _edge_set(read_networkit_binary(spark, p)) == {(0, 1)}


def test_nkb_bad_magic(spark, tmp_path):
    p = tmp_path / "bad.nkbg"
    p.write_bytes(b"definitely not nkbg at all")
    with pytest.raises(ValueError, match="bad magic"):
        read_networkit_binary(spark, str(p))


def test_nkb_pinned_bytes(spark, tmp_path):
    # hand-built: 3 nodes, directed, unweighted, 1 chunk,
    # adjacency 0->{1,2}, 1->{}, 2->{0}
    import struct as _s

    base = bytes([0b00000111])  # node flags: 3 nodes exist
    chunk = bytearray()
    for nbrs in ([1, 2], [], [0]):
        _nkb_varint_encode(len(nbrs), chunk)
        for u in nbrs:
            _nkb_varint_encode(u, chunk)
    adj = len(chunk).to_bytes(8, "little") + bytes(chunk)
    header_len = 8 + 11 * 8
    off_base = header_len
    off_adj = off_base + len(base)
    head = bytearray(_NKB_MAGIC)
    for v in (0, 1, 3, 1, off_base, off_adj, 0, 0, 0, 0, 0):
        head += _s.pack("<Q", v)
    p = tmp_path / "pinned.nkbg"
    p.write_bytes(bytes(head) + base + adj)
    g = read_networkit_binary(spark, str(p))
    assert g.directed and _edge_set(g) == {(0, 1), (0, 2), (2, 0)}
