import pytest

from linkgraph.algs.cocitation import bibliographic_coupling, co_citation
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-cocitation")


def _graph(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=True, weighted=False)


EDGES = [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (4, 2), (2, 3)]


def _ref(edges, pivot_is_src, cap=None):
    from collections import defaultdict

    piv = defaultdict(set)
    for s, d in set(edges):
        if pivot_is_src:
            piv[s].add(d)
        else:
            piv[d].add(s)
    out = defaultdict(int)
    for w, ends in piv.items():
        if cap is not None and len(ends) > cap:
            continue
        for u in ends:
            for v in ends:
                if u < v:
                    out[(u, v)] += 1
    return dict(out)


def test_co_citation(spark):
    got = {(r.u, r.v): r.n_common for r in co_citation(_graph(spark, EDGES)).collect()}
    assert got == _ref(EDGES, True)
    assert got[(2, 3)] == 2  # cited together by 0 and 1


def test_bibliographic_coupling(spark):
    got = {
        (r.u, r.v): r.n_common
        for r in bibliographic_coupling(_graph(spark, EDGES)).collect()
    }
    assert got == _ref(EDGES, False)
    assert got[(0, 1)] == 2  # both cite 2 and 3


def test_pivot_cap(spark):
    # vertex 9 cites everyone — capped out; remaining structure intact
    edges = EDGES + [(9, t) for t in range(5)]
    g = _graph(spark, edges)
    got = {(r.u, r.v): r.n_common for r in co_citation(g, max_pivot_degree=4).collect()}
    assert got == _ref(edges, True, cap=4)
    full = {(r.u, r.v): r.n_common for r in co_citation(g, max_pivot_degree=None).collect()}
    assert full == _ref(edges, True)
    # pair (0,1) exists ONLY via capped pivot 9 — gone entirely under the cap
    assert full[(0, 1)] == got.get((0, 1), 0) + 1
    assert (0, 1) not in got


def test_duplicate_edges_ignored(spark):
    got = {
        (r.u, r.v): r.n_common
        for r in co_citation(_graph(spark, EDGES + EDGES)).collect()
    }
    assert got == _ref(EDGES, True)
