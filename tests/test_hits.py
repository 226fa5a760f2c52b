import numpy as np
import pytest

from linkgraph.algs.hits import hits
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-hits")


def _graph(spark, edges, directed=True):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=directed, weighted=False)


def _np_hits(edges, n, iters):
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        a = A.T @ h
        a = a / (np.linalg.norm(a) or 1.0)
        h = A @ a
        h = h / (np.linalg.norm(h) or 1.0)
    return h, a


# two hub pages pointing at three authorities, plus a stray edge
EDGES = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (2, 4)]


def test_matches_numpy_fixed_iterations(spark):
    g = _graph(spark, EDGES)
    got = {r.id: (r.hub, r.authority) for r in hits(g, max_iter=8, tol=0.0).collect()}
    h, a = _np_hits(EDGES, 5, 8)
    for i in range(5):
        assert got[i][0] == pytest.approx(h[i], abs=1e-9), ("hub", i)
        assert got[i][1] == pytest.approx(a[i], abs=1e-9), ("auth", i)


def test_hub_authority_structure(spark):
    g = _graph(spark, EDGES)
    got = {r.id: r for r in hits(g, max_iter=60).collect()}
    # 0 links to all three authorities → best hub; 2,3 are the most
    # cited → top authorities; pure hubs have ~zero authority
    assert got[0].hub > got[1].hub > got[2].hub
    assert min(got[2].authority, got[3].authority) > got[0].authority
    assert got[0].authority == pytest.approx(0.0, abs=1e-12)


def test_early_stop_matches_long_run(spark):
    g = _graph(spark, EDGES)
    a = {r.id: r for r in hits(g, max_iter=80, tol=1e-12).collect()}
    b = {r.id: r for r in hits(g, max_iter=80, tol=0.0).collect()}
    for i in a:
        assert a[i].hub == pytest.approx(b[i].hub, abs=1e-8)
        assert a[i].authority == pytest.approx(b[i].authority, abs=1e-8)


def test_undirected_hub_equals_authority(spark):
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=False)
    for r in hits(g, max_iter=40, tol=0.0).collect():
        assert r.hub == pytest.approx(r.authority, abs=1e-9)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint, weight double")
    g = Graph(df, directed=True, weighted=False)
    assert hits(g, max_iter=3).count() == 0


def _np_salsa(edges, n, iters):
    A = np.zeros((n, n))
    for u, v in edges:
        A[u, v] = 1.0
    od = A.sum(axis=1)
    idg = A.sum(axis=0)
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = (A / np.where(od[:, None] == 0, 1.0, od[:, None])).T @ h
        a = a / (np.abs(a).sum() or 1.0)
        h = (A / np.where(idg[None, :] == 0, 1.0, idg[None, :])) @ a
        h = h / (np.abs(h).sum() or 1.0)
    return h, a


def test_salsa_matches_numpy(spark):
    from linkgraph.algs.hits import salsa

    g = _graph(spark, EDGES)
    got = {r.id: (r.hub, r.authority) for r in salsa(g, max_iter=6, tol=0.0).collect()}
    h, a = _np_salsa(EDGES, 5, 6)
    for i in range(5):
        assert got[i][0] == pytest.approx(h[i], abs=1e-9), ("hub", i)
        assert got[i][1] == pytest.approx(a[i], abs=1e-9), ("auth", i)


def test_salsa_stationary_is_degree_proportional(spark):
    from linkgraph.algs.hits import salsa

    # connected co-citation structure: SALSA's stationary authority
    # distribution is proportional to in-degree (Lempel & Moran Thm)
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (4, 2)]
    g = _graph(spark, edges)
    got = {r.id: r.authority for r in salsa(g, max_iter=80, tol=1e-10).collect()}
    indeg = {2: 3, 3: 2, 4: 1}
    m = sum(indeg.values())
    for i, d in indeg.items():
        assert got[i] == pytest.approx(d / m, abs=1e-5), i
