"""k-truss peeling vs networkx.k_truss, plus trussness levels."""

from __future__ import annotations

import random

import networkx as nx

from linkgraph.algs.truss import k_truss, trussness
from tests.conftest import KARATE_EDGES, make_graph


def _edges(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def _nx_truss_edges(pairs, k):
    g = nx.Graph()
    g.add_edges_from(pairs)
    t = nx.k_truss(g, k)
    return {tuple(sorted(e)) for e in t.edges()}


def test_k_truss_karate(spark):
    g = make_graph(spark, KARATE_EDGES)
    for k in (3, 4, 5):
        assert _edges(k_truss(g, k)) == _nx_truss_edges(KARATE_EDGES, k), k


def test_k_truss_requires_peeling(spark):
    # a triangle chain: each edge has support 1 at first, but removing
    # the pendant triangle's edges cascades — the fixpoint matters
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
    g = make_graph(spark, pairs)
    assert _edges(k_truss(g, 3)) == _nx_truss_edges(pairs, 3)
    assert _edges(k_truss(g, 4)) == _nx_truss_edges(pairs, 4) == set()


def test_k_truss_random(spark):
    rng = random.Random(13)
    pairs = list({tuple(sorted((rng.randrange(18), rng.randrange(18))))
                  for _ in range(70)})
    pairs = [p for p in pairs if p[0] != p[1]]
    g = make_graph(spark, pairs)
    for k in (3, 4, 5):
        assert _edges(k_truss(g, k)) == _nx_truss_edges(pairs, k), k


def test_trussness_levels(spark):
    # K4 ∪ bridge ∪ triangle: K4 edges have trussness 4, the triangle 3,
    # the bridge 2
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    tri = [(10, 11), (11, 12), (10, 12)]
    pairs = k4 + tri + [(3, 10)]
    g = make_graph(spark, pairs)
    got = {(r["src"], r["dst"]): r["trussness"] for r in trussness(g).collect()}
    for e in k4:
        assert got[e] == 4, e
    for e in tri:
        assert got[e] == 3, e
    assert got[(3, 10)] == 2
