"""BidirectionalDijkstra + ReverseBFS + new link-pred facades."""

from __future__ import annotations

import math
import random

import pytest

from linkgraph.algs.bfs import bidirectional_dijkstra, sssp
from tests.conftest import KARATE_EDGES, make_graph


def test_bidirectional_dijkstra_matches_sssp_weighted(spark):
    rng = random.Random(9)
    pairs = [
        (u, v, 0.5 + 2.0 * rng.random())
        for u in range(14)
        for v in range(14)
        if u != v and rng.random() < 0.15
    ]
    g = make_graph(spark, pairs, directed=True, weighted=True)
    full = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    for t in (5, 9, 13):
        got = bidirectional_dijkstra(g, 0, t)
        if t in full:
            assert got == pytest.approx(full[t], abs=1e-9)
        else:
            assert got is None


def test_bidirectional_dijkstra_undirected_and_trivial(spark, karate):
    w = make_graph(
        spark, [(u, v, 1.0 + ((u + v) % 3)) for u, v in KARATE_EDGES],
        weighted=True,
    )
    full = {r["id"]: r["dist"] for r in sssp(w, 0).collect()}
    assert bidirectional_dijkstra(w, 0, 33) == pytest.approx(full[33], abs=1e-9)
    assert bidirectional_dijkstra(w, 7, 7) == 0.0


def test_bidirectional_dijkstra_prefers_longer_cheaper_path(spark):
    # direct 0-3 edge w=10 vs 0-1-2-3 at 1+1+1
    g = make_graph(
        spark, [(0, 3, 10.0), (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        directed=True, weighted=True,
    )
    assert bidirectional_dijkstra(g, 0, 3) == pytest.approx(3.0)


def test_nkcompat_reverse_bfs(spark):
    from linkgraph import nkcompat as nk

    G = nk.Graph(4, directed=True)
    for u in range(3):
        G.addEdge(u, u + 1)
    r = nk.ReverseBFS(G, 3).run()
    assert [r.distance(v) for v in range(4)] == [3.0, 2.0, 1.0, 0.0]
    assert math.isinf(nk.ReverseBFS(G, 0).run().distance(3))


def test_nkcompat_bidirectional_dijkstra(spark):
    from linkgraph import nkcompat as nk

    G = nk.Graph(4, weighted=True, directed=True)
    G.addEdge(0, 3, 10.0)
    G.addEdge(0, 1, 1.0)
    G.addEdge(1, 2, 1.0)
    G.addEdge(2, 3, 1.0)
    assert nk.BidirectionalDijkstra(G, 0, 3).run().getDistance() == pytest.approx(3.0)
    assert math.isinf(nk.BidirectionalDijkstra(G, 3, 0).run().getDistance())


def test_nkcompat_new_linkpred_indices(spark):
    from linkgraph import nkcompat as nk

    G = nk.Graph(6)
    for u, v in [(0, 2), (0, 3), (1, 2), (1, 3), (4, 5)]:
        G.addEdge(u, v)
    ari = nk.AdjustedRandIndex(G)
    assert ari.run(0, 1) > 0.5  # identical neighborhoods
    assert ari.run(0, 4) == 0.0  # outside candidate set

    fm = nk.NeighborsMeasureIndex(G)
    # N(0)={2,3}, N(1)={2,3}: x==y twice, plus no 2~3 edge -> 2
    assert fm.run(0, 1) == 2.0

    ad = nk.AlgebraicDistanceIndex(G, n_systems=4, n_iters=6).preprocess()
    assert ad.run(0, 1) >= 0.0
    pairs = ad.runOn([(0, 1), (2, 3)])
    assert len(pairs) == 2
