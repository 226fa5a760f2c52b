"""Vertex-biconnected components (Tarjan–Vishkin) vs networkx oracle."""

import networkx as nx
import pytest

from linkgraph.algs.biconnected import articulation_points, biconnected_components

from conftest import KARATE_EDGES, make_graph


def _blocks_of(df):
    """edge-block DataFrame → set of frozensets of canonical edges."""
    groups = {}
    for r in df.collect():
        e = (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        groups.setdefault(r["block"], set()).add(e)
    return {frozenset(g) for g in groups.values()}


def _nx_blocks(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return {
        frozenset((min(a, b), max(a, b)) for a, b in comp)
        for comp in nx.biconnected_component_edges(g)
    }


@pytest.mark.parametrize(
    "edges",
    [
        [(0, 1), (1, 2), (2, 3), (3, 4)],  # path: every edge its own block
        [(i, (i + 1) % 6) for i in range(6)],  # cycle: one block
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],  # bridge
        [(0, i) for i in range(1, 9)],  # star
        # two blocks sharing a cut vertex
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)],
        # ancestor back edge: cycle + chord + tail
        [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (3, 4), (4, 5)],
    ],
)
def test_biconnected_small(spark, edges):
    g = make_graph(spark, edges)
    assert _blocks_of(biconnected_components(g)) == _nx_blocks(edges)


def test_biconnected_karate(spark, karate):
    pairs = [(a, b) for a, b, *_ in KARATE_EDGES]
    assert _blocks_of(biconnected_components(karate)) == _nx_blocks(pairs)


def test_biconnected_random(spark):
    import random

    rng = random.Random(7)
    edges = sorted({tuple(sorted(rng.sample(range(24), 2))) for _ in range(40)})
    g = make_graph(spark, edges)
    assert _blocks_of(biconnected_components(g)) == _nx_blocks(edges)


def test_biconnected_disconnected(spark, two_components):
    edges = [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7)]
    assert _blocks_of(biconnected_components(two_components)) == _nx_blocks(edges)


def test_articulation_points_karate(spark, karate):
    pairs = [(a, b) for a, b, *_ in KARATE_EDGES]
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = set(nx.articulation_points(g))
    got = {r["id"] for r in articulation_points(karate).collect()}
    assert got == want
