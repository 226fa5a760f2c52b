"""Betweenness — distributed Brandes vs networkx exact + sampled bands.

Mirrors the reference's CentralityGTest betweenness cases (karate exact
values) with networkx as the independent oracle."""

import networkx as nx
import pytest
from conftest import KARATE_EDGES, collect_map, make_graph

from linkgraph.algs.betweenness import betweenness


def nx_karate():
    g = nx.Graph()
    g.add_edges_from(KARATE_EDGES)
    return g


def test_betweenness_exact_karate(spark, karate):
    got = collect_map(betweenness(karate), "id", "score")
    want = nx.betweenness_centrality(nx_karate(), normalized=False)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_betweenness_normalized_karate(spark, karate):
    got = collect_map(betweenness(karate, normalized=True), "id", "score")
    want = nx.betweenness_centrality(nx_karate(), normalized=True)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_betweenness_exact_directed(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0), (1, 3)]
    g = make_graph(spark, pairs, directed=True)
    got = collect_map(betweenness(g), "id", "score")
    dg = nx.DiGraph()
    dg.add_edges_from(pairs)
    want = nx.betweenness_centrality(dg, normalized=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_betweenness_sampled_band(spark, karate):
    """EstimateBetweenness contract: sampled scores approximate exact ones
    — top vertex must match and relative ordering of the clear extremes
    must hold (deterministic hash-picked sources)."""
    exact = collect_map(betweenness(karate), "id", "score")
    est = collect_map(betweenness(karate, n_samples=16), "id", "score")
    top_exact = max(exact, key=exact.get)
    top_est = max(est, key=est.get)
    assert top_exact == top_est
    # scaled estimates stay within a loose multiplicative band for heavy hitters
    for v, s in exact.items():
        if s > 50:
            assert est[v] == pytest.approx(s, rel=0.6)


def test_betweenness_path_graph(spark, path_5):
    """Path 0-1-2-3-4: interior vertices have exact known betweenness
    (1·3, 2·2, 3·1 pair counts)."""
    got = collect_map(betweenness(path_5), "id", "score")
    assert got[0] == 0.0 and got[4] == 0.0
    assert got[1] == pytest.approx(3.0)
    assert got[2] == pytest.approx(4.0)
    assert got[3] == pytest.approx(3.0)


def test_approx_betweenness_band(spark, karate):
    from linkgraph.algs.betweenness import approx_betweenness, betweenness

    exact = collect_map(betweenness(karate, normalized=True), "id", "score")
    approx = collect_map(
        approx_betweenness(karate, epsilon=0.08, delta=0.1, max_samples=34),
        "id",
        "score",
    )
    # epsilon-absolute band on normalized scores (34 sources = full set on
    # karate → exact; the band also covers genuinely sampled runs)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 0.08 + 1e-9
