"""reachability module: ReachableNodes (exact + sketch), AllSimplePaths,
MultiTargetDijkstra, GraphDifference, GEXF round-trip — networkx oracles."""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.bfs import multi_target_sssp, sssp
from linkgraph.algs.reachability import (
    all_simple_paths,
    reachable_nodes,
    reachable_nodes_estimate,
)
from linkgraph.graph import Graph
from linkgraph.io import read_gexf, write_gexf
from linkgraph.streaming.deltas import apply_deltas, graph_difference
from tests.conftest import make_graph


def _random_digraph(n=18, p=0.12, seed=7):
    rng = random.Random(seed)
    pairs = [
        (u, v) for u in range(n) for v in range(n)
        if u != v and rng.random() < p
    ]
    return pairs


# ---------------------------------------------------------------------------
# ReachableNodes
# ---------------------------------------------------------------------------

def test_reachable_nodes_directed_vs_networkx(spark):
    pairs = _random_digraph()
    g = make_graph(spark, pairs, directed=True)
    got = {r["id"]: r["reachable"] for r in reachable_nodes(g).collect()}
    nxg = nx.DiGraph(pairs)
    want = {u: len(nx.descendants(nxg, u)) + 1 for u in nxg.nodes}
    assert got == want


def test_reachable_nodes_dag_chain(spark):
    # 0→1→2→3: reachable = 4,3,2,1
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)], directed=True)
    got = {r["id"]: r["reachable"] for r in reachable_nodes(g).collect()}
    assert got == {0: 4, 1: 3, 2: 2, 3: 1}


def test_reachable_nodes_undirected_is_component_size(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (5, 6)])
    got = {r["id"]: r["reachable"] for r in reachable_nodes(g).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 5: 2, 6: 2}


def test_reachable_nodes_estimate_band(spark, karate):
    # karate is connected: every estimate should be near n=34
    est = {r["id"]: r["est"] for r in
           reachable_nodes_estimate(karate, registers=16).collect()}
    assert len(est) == 34
    for v in est.values():
        assert 34 / 3 <= v <= 34 * 3  # FM factor band at R=16


def test_reachable_nodes_estimate_directed_ordering(spark):
    # long chain: head sees the whole chain, tail only itself
    n = 30
    g = make_graph(spark, [(i, i + 1) for i in range(n - 1)], directed=True)
    est = {r["id"]: r["est"] for r in
           reachable_nodes_estimate(g, registers=16).collect()}
    assert est[0] > est[n - 1] * 2


# ---------------------------------------------------------------------------
# AllSimplePaths
# ---------------------------------------------------------------------------

def _paths_set(df):
    return {tuple(r["path"]) for r in df.collect()}


def test_all_simple_paths_diamond(spark):
    g = make_graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=True)
    got = _paths_set(all_simple_paths(g, 0, 3, cutoff=5))
    assert got == {(0, 1, 3), (0, 2, 3)}


def test_all_simple_paths_vs_networkx_directed(spark):
    pairs = _random_digraph(n=12, p=0.2, seed=11)
    g = make_graph(spark, pairs, directed=True)
    nxg = nx.DiGraph(pairs)
    got = _paths_set(all_simple_paths(g, 0, 7, cutoff=5))
    want = {tuple(p) for p in nx.all_simple_paths(nxg, 0, 7, cutoff=5)}
    assert got == want


def test_all_simple_paths_vs_networkx_undirected(spark, karate):
    got = _paths_set(all_simple_paths(karate, 16, 12, cutoff=4))
    nxg = nx.Graph(
        [(int(r["src"]), int(r["dst"])) for r in karate.edges.collect()]
    )
    want = {tuple(p) for p in nx.all_simple_paths(nxg, 16, 12, cutoff=4)}
    assert got == want


def test_all_simple_paths_cutoff_and_hops(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (0, 3)], directed=True)
    one = all_simple_paths(g, 0, 3, cutoff=1)
    assert _paths_set(one) == {(0, 3)}
    both = all_simple_paths(g, 0, 3, cutoff=3).collect()
    assert {(tuple(r["path"]), r["hops"]) for r in both} == {
        ((0, 3), 1),
        ((0, 1, 2, 3), 3),
    }


def test_all_simple_paths_trivial_and_unreachable(spark):
    g = make_graph(spark, [(0, 1), (2, 3)], directed=True)
    assert _paths_set(all_simple_paths(g, 0, 0, cutoff=3)) == {(0,)}
    assert all_simple_paths(g, 0, 3, cutoff=6).count() == 0


# ---------------------------------------------------------------------------
# MultiTargetDijkstra
# ---------------------------------------------------------------------------

def test_multi_target_sssp_matches_full(spark):
    rng = random.Random(3)
    pairs = [
        (u, v, 0.5 + rng.random() * 2) for u, v in _random_digraph(16, 0.18, 5)
    ]
    g = make_graph(spark, pairs, directed=True, weighted=True)
    targets = [3, 7, 11, 15]
    got = {r["id"]: r["dist"] for r in multi_target_sssp(g, 0, targets).collect()}
    full = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    want = {t: full[t] for t in targets if t in full}
    assert set(got) == set(want)
    for t, d in want.items():
        assert got[t] == pytest.approx(d, abs=1e-9)


def test_multi_target_sssp_unreachable_target(spark):
    g = make_graph(spark, [(0, 1, 2.0), (2, 3, 1.0)], directed=True, weighted=True)
    got = {r["id"]: r["dist"] for r in multi_target_sssp(g, 0, [1, 3]).collect()}
    assert got == {1: pytest.approx(2.0)}


# ---------------------------------------------------------------------------
# GraphDifference
# ---------------------------------------------------------------------------

def _edge_set(df):
    return {(r["src"], r["dst"], r["weight"]) for r in df.collect()}


def test_graph_difference_roundtrip(spark):
    old = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)], "src bigint, dst bigint, weight double"
    )
    new = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 5.0), (4, 5, 1.0)], "src bigint, dst bigint, weight double"
    )
    diff = graph_difference(old, new)
    ops = {(r["op"], r["src"], r["dst"]) for r in diff.collect()}
    assert ops == {
        ("remove_edge", 2, 3),
        ("update_weight", 1, 2),
        ("add_edge", 4, 5),
    }
    assert _edge_set(apply_deltas(old, diff)) == _edge_set(new)


def test_graph_difference_identical_is_empty(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0)], "src bigint, dst bigint, weight double"
    )
    assert graph_difference(e, e).count() == 0


# ---------------------------------------------------------------------------
# GEXF IO
# ---------------------------------------------------------------------------

def test_gexf_roundtrip_directed_weighted(spark, tmp_path):
    g = make_graph(
        spark, [(0, 1, 2.5), (1, 2, 1.0), (2, 0, 3.0)], directed=True, weighted=True
    )
    p = str(tmp_path / "g.gexf")
    write_gexf(g, p)
    back = read_gexf(spark, p)
    assert back.directed and back.weighted
    assert _edge_set(back.edges) == _edge_set(g.edges)


def test_gexf_roundtrip_undirected(spark, tmp_path):
    g = make_graph(spark, [(0, 1), (1, 2)])
    p = str(tmp_path / "u.gexf")
    write_gexf(g, p)
    back = read_gexf(spark, p)
    assert not back.directed
    assert {(r["src"], r["dst"]) for r in back.edges.collect()} == {(0, 1), (1, 2)}


# ---------------------------------------------------------------------------
# nkcompat facades
# ---------------------------------------------------------------------------

def test_nkcompat_reachable_nodes(spark):
    from linkgraph import nkcompat as nk

    G = nk.Graph(4, directed=True)
    for u, v in [(0, 1), (1, 2), (2, 3)]:
        G.addEdge(u, v)
    r = nk.ReachableNodes(G).run()
    assert [r.numberOfReachableNodes(u) for u in range(4)] == [4, 3, 2, 1]
    assert r.numberOfReachableNodesLB(0) == r.numberOfReachableNodesUB(0) == 4

    est = nk.ReachableNodes(G, exact=False).run()
    assert est.numberOfReachableNodes(0) >= 1


def test_nkcompat_all_simple_paths(spark):
    from linkgraph import nkcompat as nk

    G = nk.Graph(4, directed=True)
    for u, v in [(0, 1), (0, 2), (1, 3), (2, 3)]:
        G.addEdge(u, v)
    ap = nk.AllSimplePaths(G, 0, 3, cutoff=5).run()
    assert ap.numberOfSimplePaths() == 2
    assert ap.getAllSimplePaths() == [[0, 1, 3], [0, 2, 3]]
    seen = []
    ap.forAllSimplePaths(seen.append)
    assert seen == [[0, 1, 3], [0, 2, 3]]


def test_nkcompat_multi_target(spark):
    import math

    from linkgraph import nkcompat as nk

    G = nk.Graph(5, directed=True)
    for u in range(4):
        G.addEdge(u, u + 1)
    b = nk.MultiTargetBFS(G, 0, [2, 4]).run()
    assert b.getDistances() == [2.0, 4.0]
    assert b.getTargetIndexMap() == {2: 0, 4: 1}

    W = nk.Graph(4, weighted=True, directed=True)
    W.addEdge(0, 1, 2.0)
    W.addEdge(1, 2, 3.0)
    d = nk.MultiTargetDijkstra(W, 0, [2, 3]).run()
    assert d.getDistances()[0] == pytest.approx(5.0)
    assert math.isinf(d.getDistances()[1])


def test_nkcompat_graph_difference(spark):
    from linkgraph import nkcompat as nk

    G1 = nk.Graph(4, weighted=True)
    G1.addEdge(0, 1, 1.0)
    G1.addEdge(1, 2, 2.0)
    G2 = nk.Graph(4, weighted=True)
    G2.addEdge(0, 1, 1.0)
    G2.addEdge(1, 2, 4.0)
    G2.addEdge(2, 3, 1.0)
    d = nk.GraphDifference(G1, G2).run()
    assert d.getNumberOfEdits() == 2
    assert d.getNumberOfEdgeAdditions() == 1
    assert d.getNumberOfEdgeWeightUpdates() == 1
    assert d.getNumberOfEdgeRemovals() == 0


def test_nkcompat_gexf_format(spark, tmp_path):
    from linkgraph import nkcompat as nk

    G = nk.Graph(3, directed=True)
    G.addEdge(0, 1)
    G.addEdge(1, 2)
    p = str(tmp_path / "nk.gexf")
    nk.writeGraph(G, p, nk.Format.GEXF)
    back = nk.readGraph(p, nk.Format.GEXF)
    assert back.numberOfEdges() == 2 and back.isDirected()
