import networkx as nx
import pytest

from linkgraph.algs.trustrank import spam_mass, trustrank
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-trustrank")


def _graph(spark, edges, directed=True):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=directed, weighted=False)


# a trusted cluster (0-1-2), a neutral chain, and a spam farm (7,8,9 -> 6)
EDGES = [
    (0, 1), (1, 2), (2, 0), (1, 0),
    (2, 3), (3, 4), (4, 5),
    (7, 6), (8, 6), (9, 6), (6, 7), (6, 8), (6, 9),
]


def _nx_ppr(edges, seeds, directed=True, alpha=0.85):
    """Reference personalized PageRank: dense numpy power iteration with
    dangling mass redistributed along the personalization vector (the
    networkx/Gyöngyi convention)."""
    import numpy as np

    G = nx.DiGraph() if directed else nx.Graph()
    G.add_edges_from(edges)
    nodes = sorted(G.nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros(n)
    for s in seeds:
        p[idx[s]] = 1.0 / len(seeds)
    out = np.zeros((n, n))
    for u in nodes:
        nbrs = list(G.successors(u)) if directed else list(G.neighbors(u))
        for v in nbrs:
            out[idx[u], idx[v]] = 1.0 / len(nbrs)
    dangling = np.array([1.0 if not out[i].any() else 0.0 for i in range(n)])
    x = p.copy()
    for _ in range(10_000):
        xn = (1 - alpha) * p + alpha * (x @ out + (x @ dangling) * p)
        if np.abs(xn - x).sum() < 1e-15:
            x = xn
            break
        x = xn
    return {nodes[i]: x[i] for i in range(n)}


def test_matches_networkx_personalized(spark):
    g = _graph(spark, EDGES)
    got = {r.id: r.trust for r in trustrank(g, [0, 1], tol=1e-12, max_iter=500).collect()}
    want = _nx_ppr(EDGES, {0, 1})
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-8), n


def test_matches_networkx_undirected(spark):
    karate = list(nx.karate_club_graph().edges())
    g = _graph(spark, karate, directed=False)
    got = {r.id: r.trust for r in trustrank(g, [0], tol=1e-12, max_iter=500).collect()}
    want = _nx_ppr(karate, {0}, directed=False)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-8), n


def test_unreachable_pages_get_zero_trust(spark):
    g = _graph(spark, EDGES)
    got = {r.id: r.trust for r in trustrank(g, [0, 1], tol=1e-12, max_iter=500).collect()}
    # the spam farm (6..9) has no inlink from the trusted side
    assert all(got[n] == pytest.approx(0.0, abs=1e-12) for n in (6, 7, 8, 9))
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_spam_mass_separates_farm_from_trusted(spark):
    g = _graph(spark, EDGES)
    sm = {r.id: r for r in spam_mass(g, [0, 1], tol=1e-12, max_iter=500).collect()}
    farm = [sm[n].spam_mass for n in (6, 7, 8, 9)]
    core = [sm[n].spam_mass for n in (0, 1, 2)]
    assert min(farm) > 0.99  # no trust reaches the farm
    assert max(core) < 0.9  # trusted cluster keeps most of its rank explained
    for n, r in sm.items():
        assert 0.0 <= r.spam_mass <= 1.0
        assert r.rank > 0


def test_seed_frame_input(spark):
    g = _graph(spark, EDGES)
    seeds_df = spark.createDataFrame([(0,), (1,)], "id bigint")
    a = sorted(
        (r.id, round(r.trust, 10))
        for r in trustrank(g, seeds_df, tol=1e-12, max_iter=500).collect()
    )
    b = sorted(
        (r.id, round(r.trust, 10))
        for r in trustrank(g, [0, 1], tol=1e-12, max_iter=500).collect()
    )
    assert a == b
