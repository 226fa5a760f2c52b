"""KadabraBetweenness tests — estimator band vs exact, determinism."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.algs.kadabra import kadabra_betweenness
from tests.conftest import make_graph


def test_kadabra_band_on_karate(spark, karate):
    """b̃(v) estimates the path-through probability b(v) =
    bc_normalized(v)·(n−2)/n within ±epsilon (high probability; the
    adaptive bound is conservative, so the check uses epsilon itself)."""
    eps = 0.1
    est = {
        r["id"]: r["score"]
        for r in kadabra_betweenness(
            karate, epsilon=eps, delta=0.1, batch_size=128, max_batches=16
        ).collect()
    }
    G = nx.Graph()
    for r in karate.symmetric_edges().collect():
        G.add_edge(r["src"], r["dst"])
    n = G.number_of_nodes()
    exact = {
        v: b * (n - 2) / n
        for v, b in nx.betweenness_centrality(G, normalized=True).items()
    }
    for v in exact:
        assert abs(est[v] - exact[v]) <= eps, (v, est[v], exact[v])


def test_kadabra_path_center(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    est = {
        r["id"]: r["score"]
        for r in kadabra_betweenness(
            g, epsilon=0.15, batch_size=64, max_batches=8
        ).collect()
    }
    assert est[2] >= est[1] - 0.1 and est[2] >= est[3] - 0.1
    assert est[2] > est[0] and est[2] > est[4]


def test_kadabra_deterministic(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)])
    a = kadabra_betweenness(g, epsilon=0.2, batch_size=32, max_batches=4).collect()
    b = kadabra_betweenness(g, epsilon=0.2, batch_size=32, max_batches=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_approx_group_betweenness_barbell(spark):
    """Two K4s joined by a path through vertex 8: the connector must be
    picked first (it lies on every cross path)."""
    from linkgraph.algs.kadabra import approx_group_betweenness

    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(0, 8), (8, 4)]
    )
    g = make_graph(spark, edges)
    picked = approx_group_betweenness(g, k=2, n_pairs=128)
    # every cross path runs a-0-8-4-b, so 0, 8 and 4 tie for coverage;
    # the greedy must open with one of the three corridor vertices
    assert picked[0] in (0, 4, 8)
    assert set(picked) <= {0, 4, 8}


def test_approx_group_betweenness_deterministic(spark):
    from linkgraph.algs.kadabra import approx_group_betweenness

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3)])
    a = approx_group_betweenness(g, k=2, n_pairs=64)
    b = approx_group_betweenness(g, k=2, n_pairs=64)
    assert a == b
