"""SimRank vs a pure-numpy replica of the Jeh–Widom iteration."""

import numpy as np
import pytest

from linkgraph.algs.simrank import simrank
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-simrank")


def _graph(spark, edges, directed=True):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=directed, weighted=False)


def _numpy_simrank(edges, n, c=0.8, iters=3):
    """Paper definition over in-neighbors, s0 = I, diagonal forced to 1."""
    innb = [set() for _ in range(n)]
    for a, b in set(edges):
        innb[b].add(a)
    s = np.eye(n)
    for _ in range(iters):
        nxt = np.zeros((n, n))
        for a in range(n):
            for b in range(n):
                if a == b or not innb[a] or not innb[b]:
                    continue
                tot = sum(s[i, j] for i in innb[a] for j in innb[b])
                nxt[a, b] = c * tot / (len(innb[a]) * len(innb[b]))
        np.fill_diagonal(nxt, 1.0)
        s = nxt
    return s


EDGES = [
    (0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (4, 2), (2, 3), (3, 5), (2, 5),
    (5, 0), (4, 6), (6, 2),
]


def _collect(df):
    return {(r.u, r.v): r.sim for r in df.collect()}


def test_simrank_matches_numpy(spark):
    n = 7
    for iters in (1, 2, 3):
        got = _collect(simrank(_graph(spark, EDGES), c=0.8, max_iter=iters))
        want = _numpy_simrank(EDGES, n, c=0.8, iters=iters)
        for (u, v), s in got.items():
            assert u < v
            assert s == pytest.approx(want[u, v], abs=1e-12)
        # every nonzero off-diagonal pair of the dense replica is present
        for u in range(n):
            for v in range(u + 1, n):
                if want[u, v] > 0:
                    assert (u, v) in got, (u, v)


def test_simrank_first_iteration_is_normalized_cocitation(spark):
    g = _graph(spark, EDGES)
    got = _collect(simrank(g, c=0.8, max_iter=1))
    from collections import defaultdict

    innb = defaultdict(set)
    for a, b in set(EDGES):
        innb[b].add(a)
    for (u, v), s in got.items():
        common = len(innb[u] & innb[v])
        assert s == pytest.approx(0.8 * common / (len(innb[u]) * len(innb[v])))
        assert common > 0


def test_simrank_prune_and_fanout_are_upper_bounded(spark):
    g = _graph(spark, EDGES)
    exact = _collect(simrank(g, max_iter=3))
    pruned = _collect(simrank(g, max_iter=3, prune_eps=0.05))
    assert set(pruned) <= set(exact)
    for k, s in pruned.items():
        # pruning only removes mass from later iterations
        assert s <= exact[k] + 1e-12
    capped = _collect(simrank(g, max_iter=2, max_fanout=1))
    assert set(capped) <= set(_collect(simrank(g, max_iter=2)))


def test_simrank_star_graph_closed_form(spark):
    # star: hub 0 -> leaves 1..4; every leaf pair has I = {0}, so
    # s(leaf_i, leaf_j) = c for every iteration >= 1.
    edges = [(0, i) for i in range(1, 5)]
    got = _collect(simrank(_graph(spark, edges), c=0.6, max_iter=3))
    assert len(got) == 6
    for s in got.values():
        assert s == pytest.approx(0.6)


def test_simrank_deterministic(spark):
    g = _graph(spark, EDGES)
    a = _collect(simrank(g, max_iter=3))
    b = _collect(simrank(g, max_iter=3))
    assert a == b
