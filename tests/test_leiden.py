"""ParallelLeiden — quality, connectivity invariant, determinism."""

import pytest
from conftest import make_graph

from linkgraph.algs.community import modularity
from linkgraph.algs.leiden import leiden
from linkgraph.algs.plm import louvain


def _community_sets(pairs):
    out = {}
    for v, c in pairs:
        out.setdefault(c, set()).add(v)
    return out


@pytest.fixture(scope="module")
def karate_leiden(karate):
    """One Leiden run on karate shared by the quality/connectivity tests
    (each run is several superstep levels — compute once)."""
    df = leiden(karate)
    return sorted((r["id"], r["label"]) for r in df.collect())


def _two_cliques(spark):
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    pairs += [(0, 5)]
    return make_graph(spark, pairs)


def test_leiden_planted_cliques_and_determinism(spark):
    """Two 5-cliques + bridge: exact recovery, twice (determinism)."""
    g = _two_cliques(spark)
    a = sorted((r["id"], r["label"]) for r in leiden(g).collect())
    b = sorted((r["id"], r["label"]) for r in leiden(g).collect())
    assert a == b
    got = _community_sets(a)
    assert set(frozenset(s) for s in got.values()) == {
        frozenset(range(5)),
        frozenset(range(5, 10)),
    }


def test_leiden_karate_quality(spark, karate, karate_leiden):
    """Modularity on karate is solid and at least matches PLM's (the
    refinement never degrades the Louvain solution on this fixture)."""
    lab = spark.createDataFrame(karate_leiden, "id bigint, label bigint")
    q_leiden = modularity(karate, lab)
    q_plm = modularity(karate, louvain(karate))
    assert q_leiden > 0.30
    assert q_leiden >= q_plm - 1e-9


def test_leiden_communities_connected(karate_leiden):
    """THE Leiden guarantee Louvain lacks: every community induces a
    connected subgraph."""
    import networkx as nx
    from conftest import KARATE_EDGES

    g = nx.Graph()
    g.add_edges_from(KARATE_EDGES)
    comms = {}
    for v, c in karate_leiden:
        comms.setdefault(c, []).append(v)
    for members in comms.values():
        sub = g.subgraph(members)
        assert nx.is_connected(sub), f"disconnected community {sorted(members)}"


def test_leiden_weighted_pull(spark):
    """Heavy weights must dominate community assignment."""
    pairs = [
        (0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
        (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
        (2, 3, 0.1),
    ]
    g = make_graph(spark, pairs, weighted=True)
    got = _community_sets((r["id"], r["label"]) for r in leiden(g).collect())
    assert set(frozenset(s) for s in got.values()) == {
        frozenset({0, 1, 2}),
        frozenset({3, 4, 5}),
    }
