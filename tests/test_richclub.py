"""Rich-club + knn(k) vs networkx on karate and a random graph."""

import networkx as nx
import pytest

from linkgraph.algs.richclub import avg_neighbor_degree, rich_club
from linkgraph.graph import Graph

from tests.conftest import KARATE_EDGES


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-richclub")


def _graph(spark, edges, directed=False):
    df = spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in edges],
        "src bigint, dst bigint, weight double",
    )
    return Graph(df, directed=directed, weighted=False)


def _nx(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


def _check_rich_club(spark, edges):
    got = {r.k: (r.n_nodes, r.n_edges, r.phi) for r in rich_club(_graph(spark, edges)).collect()}
    want = nx.rich_club_coefficient(_nx(edges), normalized=False)
    for k, (n_nodes, n_edges, phi) in got.items():
        if k in want:
            assert phi == pytest.approx(want[k], abs=1e-12), k
        assert phi == pytest.approx(2.0 * n_edges / (n_nodes * (n_nodes - 1)))
    # every networkx k at a present degree with >=2 survivors is covered
    degs = {d for _, d in _nx(edges).degree()}
    for k, v in want.items():
        if k in degs and k in got:
            assert got[k][2] == pytest.approx(v, abs=1e-12)


def test_rich_club_karate(spark):
    _check_rich_club(spark, KARATE_EDGES)


def test_rich_club_random(spark):
    g = nx.gnm_random_graph(60, 240, seed=7)
    _check_rich_club(spark, list(g.edges()))


def test_rich_club_directed_input_symmetrizes(spark):
    # directed star both ways: hubs-only subgraph logic on symmetrized degree
    edges = [(0, 1), (1, 0), (0, 2), (2, 3)]
    got = {r.k: r.phi for r in rich_club(_graph(spark, edges, directed=True)).collect()}
    want = nx.rich_club_coefficient(_nx([(0, 1), (0, 2), (2, 3)]), normalized=False)
    for k, phi in got.items():
        if k in want:
            assert phi == pytest.approx(want[k])


def test_avg_neighbor_degree_karate(spark):
    got = {r.k: r.knn for r in avg_neighbor_degree(_graph(spark, KARATE_EDGES)).collect()}
    want = nx.average_degree_connectivity(_nx(KARATE_EDGES))
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k


def test_avg_neighbor_degree_random(spark):
    g = nx.gnm_random_graph(50, 180, seed=11)
    got = {r.k: r.knn for r in avg_neighbor_degree(_graph(spark, list(g.edges()))).collect()}
    want = nx.average_degree_connectivity(g)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-12), k
