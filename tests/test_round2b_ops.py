"""Round-2b additions: generators (WS/Chung-Lu/BA/dynamic), GraphML/DOT IO,
networkx adapter, hop plot, partition-similarity measures, permanence,
local partition coverage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from tests.conftest import collect_map, make_graph


# --------------------------------------------------------------------------
# generators
# --------------------------------------------------------------------------

def test_watts_strogatz_p0_is_lattice(spark):
    from linkgraph.generators import watts_strogatz

    g = Graph.from_edges(watts_strogatz(spark, 20, k=4, p=0.0, seed=1))
    # p=0: exact ring lattice — every vertex has degree k
    degs = collect_map(g.degrees(), "id", "degree")
    assert len(degs) == 20
    assert all(d == 4 for d in degs.values())


def test_watts_strogatz_rewiring_and_determinism(spark):
    from linkgraph.generators import watts_strogatz

    e1 = sorted(map(tuple, watts_strogatz(spark, 60, 4, 0.3, seed=7)
                    .select("src", "dst").collect()))
    e2 = sorted(map(tuple, watts_strogatz(spark, 60, 4, 0.3, seed=7)
                    .select("src", "dst").collect()))
    e3 = sorted(map(tuple, watts_strogatz(spark, 60, 4, 0.3, seed=8)
                    .select("src", "dst").collect()))
    assert e1 == e2          # counter-based determinism
    assert e1 != e3          # seed actually matters
    lattice = sorted(map(tuple, watts_strogatz(spark, 60, 4, 0.0, seed=7)
                         .select("src", "dst").collect()))
    assert e1 != lattice     # rewiring happened at p=0.3


def test_chung_lu_expected_degrees(spark):
    from linkgraph.generators import chung_lu

    # uniform weights w=4 over n=40: P(edge) = 16/160 = 0.1 per pair
    edges = chung_lu(spark, [4.0] * 40, seed=3)
    m = edges.count()
    # E[m] = C(40,2)·0.1 = 78; loose 4-sigma band
    assert 40 <= m <= 120


def test_chung_lu_fast_scale_shape(spark):
    from linkgraph.generators import chung_lu_fast

    df = chung_lu_fast(spark, 5000, gamma=2.5, avg_degree=6, seed=11)
    g = Graph.from_edges(df)
    row = g.degrees().agg(
        F.avg("degree").alias("avg"), F.max("degree").alias("mx")
    ).collect()[0]
    assert row["avg"] == pytest.approx(6.0, rel=0.15)
    assert row["mx"] > 50  # power-law hub present


def test_barabasi_albert_structure(spark):
    from linkgraph.generators import barabasi_albert

    n, k = 150, 3
    df = barabasi_albert(spark, n, k=k, seed=5)
    g = Graph.from_edges(df)
    assert g.num_nodes() == n
    # each attachment adds ≤ k distinct edges (dedup/self-loop drop shrinks)
    m = g.num_edges()
    assert k * (k - 1) / 2 <= m <= k * (k - 1) / 2 + (n - k) * k
    # preferential attachment → heavy hub vs. WS-style flat degrees
    mx = g.degrees().agg(F.max("degree")).collect()[0][0]
    assert mx >= 3 * k
    # deterministic across runs
    a = sorted(map(tuple, df.select("src", "dst").collect()))
    b = sorted(map(tuple, barabasi_albert(spark, n, k=k, seed=5)
                   .select("src", "dst").collect()))
    assert a == b


def test_barabasi_albert_connected(spark):
    from linkgraph.algs.components import connected_components
    from linkgraph.generators import barabasi_albert

    g = Graph.from_edges(barabasi_albert(spark, 80, k=2, seed=9))
    cc = connected_components(g)
    # BA attaches every new vertex to the existing graph → one component
    assert cc.select("component").distinct().count() == 1


def test_dynamic_edge_stream_replayable(spark):
    from linkgraph.generators import dynamic_edge_stream

    ev = dynamic_edge_stream(spark, n=30, steps=80, p_remove=0.25, seed=13)
    rows = ev.collect()
    assert all(r["op"] in ("add_edge", "remove_edge") for r in rows)
    adds = {(r["src"], r["dst"]) for r in rows if r["op"] == "add_edge"}
    # every removal targets a previously-added edge
    for r in rows:
        if r["op"] == "remove_edge":
            assert (r["src"], r["dst"]) in adds
    # no self-loops in additions
    assert all(r["src"] != r["dst"] for r in rows if r["op"] == "add_edge")


# --------------------------------------------------------------------------
# IO: GraphML / DOT
# --------------------------------------------------------------------------

def test_graphml_roundtrip(spark, tmp_path):
    from linkgraph.io import read_graphml, write_graphml

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    p = str(tmp_path / "g.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    assert not g2.directed
    assert g2.num_edges() == 4
    assert sorted(map(tuple, g2.edges.select("src", "dst").collect())) == sorted(
        map(tuple, g.edges.select("src", "dst").collect())
    )


def test_graphml_weighted_directed(spark, tmp_path):
    from linkgraph.io import read_graphml, write_graphml

    df = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 0.5)], "src bigint, dst bigint, weight double"
    )
    g = Graph.from_edges(df, directed=True, weighted=True)
    p = str(tmp_path / "w.graphml")
    write_graphml(g, p)
    g2 = read_graphml(spark, p)
    assert g2.directed and g2.weighted
    w = {(r["src"], r["dst"]): r["weight"] for r in g2.edges.collect()}
    assert w[(0, 1)] == 2.5 and w[(1, 2)] == 0.5


def test_write_dot(spark, tmp_path):
    from linkgraph.io import write_dot

    g = make_graph(spark, [(0, 1), (1, 2)], directed=True)
    p = str(tmp_path / "g.dot")
    write_dot(g, p)
    text = open(p).read()
    assert text.startswith("digraph")
    assert "0 -> 1" in text and "1 -> 2" in text


# --------------------------------------------------------------------------
# networkx adapter
# --------------------------------------------------------------------------

def test_nx_roundtrip(spark):
    nx = pytest.importorskip("networkx")
    from linkgraph.nxadapter import from_networkx, to_networkx

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2)])
    nxg = to_networkx(g)
    assert sorted(nxg.edges()) == [(0, 1), (0, 2), (1, 2)]
    back = from_networkx(spark, nxg)
    assert back.num_edges() == 3 and not back.directed


def test_nx_budget_guard(spark):
    pytest.importorskip("networkx")
    from linkgraph.nxadapter import to_networkx

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2)])
    with pytest.raises(ValueError):
        to_networkx(g, max_edges=2)


# --------------------------------------------------------------------------
# hop plot
# --------------------------------------------------------------------------

def test_hop_plot_path(spark, path_5):
    from linkgraph.algs.anf import hop_plot

    hp = dict(hop_plot(path_5, max_h=8, registers=64))
    # normalized: starts near 5/25=0.2, monotone, saturates at 1.0
    assert hp[max(hp)] == pytest.approx(1.0)
    vals = [v for _, v in sorted(hp.items())]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    assert vals[0] < vals[-1]


# --------------------------------------------------------------------------
# partition comparison measures
# --------------------------------------------------------------------------

def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "id bigint, label bigint")


def test_jaccard_and_rand_identity(spark):
    from linkgraph.algs.community import jaccard_measure, node_structural_rand

    a = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    b = _labels(spark, [(0, 5), (1, 5), (2, 9), (3, 9)])  # same up to relabel
    assert jaccard_measure(a, b) == pytest.approx(1.0)
    assert node_structural_rand(a, b) == pytest.approx(0.0)


def test_jaccard_and_rand_disagreement(spark):
    from linkgraph.algs.community import jaccard_measure, node_structural_rand

    a = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    b = _labels(spark, [(0, 0), (1, 1), (2, 0), (3, 1)])  # crossed
    # s11 = 0 → jaccard 0; rand distance = 4 differing pairs / 6
    assert jaccard_measure(a, b) == pytest.approx(0.0)
    assert node_structural_rand(a, b) == pytest.approx(4 / 6)


def test_graph_structural_rand(spark):
    from linkgraph.algs.community import graph_structural_rand

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    a = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    b = _labels(spark, [(0, 0), (1, 1), (2, 1), (3, 1)])
    # edges: (0,1) together in a, apart in b → differ; (1,2) apart/together
    # → differ; (2,3) together/together → agree. 2/3 differ.
    assert graph_structural_rand(g, a, b) == pytest.approx(2 / 3)


def test_local_partition_coverage(spark):
    from linkgraph.algs.community import local_partition_coverage

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    labels = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    cov = collect_map(local_partition_coverage(g, labels), "id", "coverage")
    assert cov[0] == pytest.approx(1.0)   # only neighbor 1, same label
    assert cov[1] == pytest.approx(0.5)   # neighbors 0 (same), 2 (other)
    assert cov[3] == pytest.approx(1.0)


def test_permanence_clique_vs_bridge(spark, two_triangles_bridge):
    from linkgraph.algs.community import permanence

    # two triangles {0,1,2} and {3,4,5} joined by bridge 2-3
    labels = _labels(
        spark, [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]
    )
    p = collect_map(permanence(two_triangles_bridge, labels), "id", "permanence")
    # interior triangle vertices: I=2, Emax=1, deg=2, c_in=1 → 2/2 - 0 = 1
    assert p[0] == pytest.approx(1.0)
    assert p[1] == pytest.approx(1.0)
    # bridge vertex 2: I=2, Emax=1, deg=3, c_in=1 → 2/3
    assert p[2] == pytest.approx(2 / 3)
    # permanence of well-clustered > poorly-clustered assignment
    bad = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 0), (4, 1), (5, 1)])
    pb = collect_map(permanence(two_triangles_bridge, bad), "id", "permanence")
    assert sum(p.values()) > sum(pb.values())


def test_permanence_matches_reference_formula_on_karate(spark, karate):
    """Cross-check the DataFrame program against a direct networkx
    recomputation of Perm(v) on the PLM partition."""
    nx = pytest.importorskip("networkx")
    from linkgraph.algs.community import permanence
    from linkgraph.algs.plm import louvain
    from linkgraph.nxadapter import to_networkx

    labels = louvain(karate)  # (id, label)
    lab = collect_map(labels, "id", "label")
    got = collect_map(permanence(karate, labels), "id", "permanence")
    g = to_networkx(karate)
    for v in g.nodes():
        nbrs = list(g.neighbors(v))
        deg = len(nbrs)
        internal = [u for u in nbrs if lab[u] == lab[v]]
        ext: dict = {}
        for u in nbrs:
            if lab[u] != lab[v]:
                ext[lab[u]] = ext.get(lab[u], 0) + 1
        emax = max(ext.values()) if ext else 1
        tri = sum(
            1
            for i, x in enumerate(internal)
            for y in internal[i + 1:]
            if g.has_edge(x, y)
        )
        pairs = len(internal) * (len(internal) - 1) / 2
        cin = tri / pairs if pairs > 0 else 0.0
        want = len(internal) / (emax * deg) - (1 - cin) if deg else 0.0
        assert got[v] == pytest.approx(want, abs=1e-9), f"vertex {v}"


# --------------------------------------------------------------------------
# overlapping NMI
# --------------------------------------------------------------------------

def test_overlapping_nmi_identity(spark):
    from linkgraph.algs.community import overlapping_nmi

    a = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1)])
    b = _labels(spark, [(0, 7), (1, 7), (2, 9), (3, 9)])
    assert overlapping_nmi(a, b) == pytest.approx(1.0)


def test_overlapping_nmi_with_overlap(spark):
    from linkgraph.algs.community import overlapping_nmi

    # identical covers where vertex 2 belongs to BOTH clusters
    a = _labels(spark, [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1), (4, 1)])
    b = _labels(spark, [(0, 5), (1, 5), (2, 5), (2, 6), (3, 6), (4, 6)])
    assert overlapping_nmi(a, b) == pytest.approx(1.0)
    # vs a genuinely different cover: similarity strictly below 1
    c = _labels(spark, [(0, 0), (1, 1), (2, 0), (3, 1), (4, 0)])
    assert overlapping_nmi(a, c) < 0.7


def test_overlapping_nmi_symmetry(spark):
    from linkgraph.algs.community import overlapping_nmi

    a = _labels(spark, [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)])
    b = _labels(spark, [(0, 0), (1, 1), (2, 1), (3, 2), (4, 2)])
    assert overlapping_nmi(a, b) == pytest.approx(overlapping_nmi(b, a))


# --------------------------------------------------------------------------
# DGS stream format
# --------------------------------------------------------------------------

def test_dgs_roundtrip(spark, tmp_path):
    from linkgraph.io import read_dgs, write_dgs

    p = str(tmp_path / "g.dgs")
    with open(p, "w") as f:
        f.write(
            "DGS004\ndgs 0 0\n"
            "st 0\nae e1 0 1 2.5\nae e2 1 2\n"
            "st 1\nce e1 9.0\n"
            "st 2\nde e2\n"
        )
    ev = read_dgs(spark, p)
    rows = [(r["ts"], r["op"], r["src"], r["dst"], r["weight"]) for r in
            ev.orderBy("ts", "src").collect()]
    assert rows == [
        (0.0, "add_edge", 0, 1, 2.5),
        (0.0, "add_edge", 1, 2, 1.0),
        (1.0, "update_weight", 0, 1, 9.0),
        (2.0, "remove_edge", 1, 2, 0.0),
    ]
    # round-trip through the writer
    p2 = str(tmp_path / "g2.dgs")
    write_dgs(ev, p2)
    ev2 = read_dgs(spark, p2)
    assert sorted(map(tuple, ev2.collect())) == sorted(map(tuple, ev.collect()))


def test_dgs_feeds_apply_deltas(spark, tmp_path):
    from linkgraph.io import read_dgs
    from linkgraph.streaming.deltas import apply_deltas

    p = str(tmp_path / "g.dgs")
    with open(p, "w") as f:
        f.write("st 0\nae a 0 1\nae b 1 2\nst 1\nde b\n")
    ev = read_dgs(spark, p)
    empty = spark.createDataFrame([], "src bigint, dst bigint, weight double")
    final = apply_deltas(empty, ev)
    assert sorted(map(tuple, final.select("src", "dst").collect())) == [(0, 1)]


# --------------------------------------------------------------------------
# LFR-style benchmark generator
# --------------------------------------------------------------------------

def test_lfr_structure(spark):
    from linkgraph.generators import lfr

    edges, labels = lfr(spark, n=400, mu=0.1, avg_degree=8, min_community=40,
                        seed=3)
    g = Graph.from_edges(edges)
    assert g.num_nodes() == 400
    lab = collect_map(labels, "id", "label")
    assert len(lab) == 400
    sizes = {}
    for v in lab.values():
        sizes[v] = sizes.get(v, 0) + 1
    assert all(s >= 40 for s in sizes.values())
    assert len(sizes) >= 2
    # mixing: most edges intra at mu=0.1
    e = [(r["src"], r["dst"]) for r in edges.collect()]
    intra = sum(1 for u, v in e if lab[u] == lab[v])
    assert intra / len(e) > 0.75
    # determinism
    e2, _ = lfr(spark, n=400, mu=0.1, avg_degree=8, min_community=40, seed=3)
    assert sorted(map(tuple, e2.select("src", "dst").collect())) == sorted(e)


def test_lfr_communities_recoverable(spark):
    from linkgraph.algs.community import nmi
    from linkgraph.algs.plm import louvain
    from linkgraph.generators import lfr

    edges, planted = lfr(spark, n=300, mu=0.05, avg_degree=10,
                         min_community=50, max_community=120, seed=5)
    g = Graph.from_edges(edges)
    found = louvain(g)
    score = nmi(found, planted)
    assert score > 0.8, f"NMI {score} too low for mu=0.05"


def test_lfr_mu_dial(spark):
    from linkgraph.generators import lfr

    def mix(mu):
        edges, labels = lfr(spark, n=300, mu=mu, avg_degree=8,
                            min_community=50, seed=7)
        lab = collect_map(labels, "id", "label")
        e = [(r["src"], r["dst"]) for r in edges.collect()]
        return sum(1 for u, v in e if lab[u] != lab[v]) / len(e)

    assert mix(0.05) < mix(0.4)  # the dial moves the right way


# --------------------------------------------------------------------------
# Dorogovtsev–Mendes + Havel–Hakimi
# --------------------------------------------------------------------------

def test_dorogovtsev_mendes_structure(spark):
    from linkgraph.algs.components import connected_components
    from linkgraph.algs.triangles import per_vertex_triangles
    from linkgraph.generators import dorogovtsev_mendes

    n = 120
    df = dorogovtsev_mendes(spark, n, seed=2)
    g = Graph.from_edges(df)
    assert g.num_nodes() == n
    # each node adds 2 edges to an existing edge's endpoints; dedup only
    # collapses when the same pair repeats
    assert 3 + (n - 3) <= g.num_edges() <= 3 + 2 * (n - 3)
    # connected (grows from the triangle)
    assert connected_components(g).select("component").distinct().count() == 1
    # triangle-closing growth → every new node closes a triangle
    tri_total = per_vertex_triangles(g).agg(F.sum("triangles")).collect()[0][0]
    assert tri_total >= n - 3
    # deterministic
    a = sorted(map(tuple, df.select("src", "dst").collect()))
    b = sorted(map(tuple, dorogovtsev_mendes(spark, n, seed=2)
                   .select("src", "dst").collect()))
    assert a == b


def test_havel_hakimi_realizes_sequence(spark):
    from linkgraph.generators import havel_hakimi

    seq = [3, 3, 2, 2, 2, 2]
    g = Graph.from_edges(havel_hakimi(spark, seq))
    degs = collect_map(g.degrees(), "id", "degree")
    assert sorted(degs.values(), reverse=True) == sorted(seq, reverse=True)


def test_havel_hakimi_rejects_nongraphical(spark):
    from linkgraph.generators import havel_hakimi

    with pytest.raises(ValueError):
        havel_hakimi(spark, [3, 1, 1])  # sum odd / not graphical


def test_metis_roundtrip(spark, tmp_path):
    from linkgraph.io import read_metis, write_metis

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    p = str(tmp_path / "g.metis")
    write_metis(g, p)
    g2 = read_metis(spark, p)
    assert sorted(
        map(tuple, g2.symmetric_edges().select("src", "dst").collect())
    ) == sorted(map(tuple, g.symmetric_edges().select("src", "dst").collect()))


def test_metis_roundtrip_weighted(spark, tmp_path):
    from linkgraph.io import read_metis, write_metis

    df = spark.createDataFrame(
        [(0, 1, 3.0), (1, 2, 5.0)], "src bigint, dst bigint, weight double"
    )
    g = Graph.from_edges(df, weighted=True)
    p = str(tmp_path / "w.metis")
    write_metis(g, p)
    g2 = read_metis(spark, p)
    w = {(r["src"], r["dst"]): r["weight"]
         for r in g2.symmetric_edges().collect()}
    assert w[(0, 1)] == 3.0 and w[(1, 2)] == 5.0


def test_attach_attribute(spark):
    from linkgraph.graph import attach_attribute

    g = make_graph(spark, [(0, 1), (1, 2)])
    attrs = spark.createDataFrame([(0, 7.5), (2, 1.0)], "id bigint, v double")
    widened = attach_attribute(g, attrs, "score")
    got = {r["id"]: r["score"] for r in widened.collect()}
    assert got[0] == 7.5 and got[2] == 1.0 and got[1] is None
