"""OPIC tests vs a pure-Python replica of the synchronous batch model."""

from __future__ import annotations

import pytest

from linkgraph.algs.opic import opic
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-opic")


def _graph(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=True, weighted=False)


def _ref(edges, nodes, iters):
    """Pure-Python synchronous OPIC with a virtual root."""
    out = {u: set() for u in nodes}
    for a, b in set(edges):
        out[a].add(b)
    n = len(nodes)
    cash = {u: 1.0 / (n + 1) for u in nodes}
    hist = {u: 0.0 for u in nodes}
    rc, rh = 1.0 / (n + 1), 0.0
    for _ in range(iters):
        new = {u: rc / n for u in nodes}
        to_root = 0.0
        for u in nodes:
            share = cash[u] / (len(out[u]) + 1)
            for v in out[u]:
                new[v] += share
            to_root += share
            hist[u] += cash[u]
        rh += rc
        rc = to_root
        cash = new
    total = sum(hist[u] + cash[u] for u in nodes)
    return {u: (hist[u] + cash[u]) / total for u in nodes}


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 3), (4, 0)]
# node 3 has a self-loop; node 5 below is a pure sink


def test_matches_reference(spark):
    edges = EDGES + [(1, 5)]
    g = _graph(spark, edges)
    got = {r.id: r.importance for r in opic(g, iters=10).collect()}
    nodes = sorted({x for e in edges for x in e})
    want = _ref(edges, nodes, 10)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12), u


def test_cash_conservation_and_normalization(spark):
    g = _graph(spark, EDGES)
    rows = opic(g, iters=6).collect()
    assert sum(r.importance for r in rows) == pytest.approx(1.0, abs=1e-9)
    # the highly-linked hub (2) outranks the leaf sink-ish pages
    imp = {r.id: r.importance for r in rows}
    assert imp[2] > imp[4]


def test_more_iterations_stabilize(spark):
    g = _graph(spark, EDGES)
    a = {r.id: r.importance for r in opic(g, iters=20).collect()}
    b = {r.id: r.importance for r in opic(g, iters=40).collect()}
    for u in a:
        assert a[u] == pytest.approx(b[u], abs=5e-2)
