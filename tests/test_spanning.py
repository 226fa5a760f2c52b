"""Borůvka spanning forests vs known MST weights."""

from conftest import make_graph

from linkgraph.algs.spanning import spanning_forest


def test_mst_weighted_square(spark):
    # square 0-1-2-3 with diagonal: MST = edges of weight 1,1,2
    g = make_graph(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 2.0), (3, 0, 3.0), (0, 2, 4.0)],
        weighted=True,
    )
    f = spanning_forest(g)
    rows = {(r.src, r.dst): r.weight for r in f.collect()}
    assert len(rows) == 3
    assert sum(rows.values()) == 4.0


def test_max_forest(spark):
    g = make_graph(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 2.0), (3, 0, 3.0), (0, 2, 4.0)],
        weighted=True,
    )
    f = spanning_forest(g, maximum=True)
    # heaviest acyclic picks: 4 (0-2), 3 (3-0), then 2 (2-3) closes a
    # cycle → 1 (1-2): total 8
    assert sum(r.weight for r in f.collect()) == 8.0


def test_forest_spans_components(two_components):
    f = spanning_forest(two_components)
    # K3 needs 2 edges, path_3 needs 2 edges
    assert f.count() == 4


def test_forest_deterministic(karate):
    a = {(r.src, r.dst) for r in spanning_forest(karate).collect()}
    b = {(r.src, r.dst) for r in spanning_forest(karate).collect()}
    assert a == b and len(a) == 33  # spanning tree of connected n=34
