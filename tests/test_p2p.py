"""Point-to-point distance variants vs full SSSP/BFS ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.algs.bfs import (
    astar_landmarks,
    bfs,
    bidirectional_bfs,
    multi_target_bfs,
    spsp,
    sssp,
)
from linkgraph.graph import Graph
from tests.conftest import make_graph


def _wgraph(spark):
    rows = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (0, 4, 5.0),
        (4, 3, 1.0), (1, 4, 1.0), (3, 5, 2.0),
    ]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    return Graph.from_edges(e, directed=False, weighted=True)


def test_spsp_matches_sssp(spark):
    g = _wgraph(spark)
    full = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    for t in [3, 5, 4]:
        assert abs(spsp(g, 0, t) - full[t]) < 1e-9


def test_spsp_unreachable(spark):
    g = make_graph(spark, [(0, 1), (2, 3)])
    assert spsp(g, 0, 3) is None


def test_multi_target(spark, karate):
    full = {r["id"]: r["dist"] for r in bfs(karate, 0).collect()}
    got = {
        r["id"]: r["dist"]
        for r in multi_target_bfs(karate, 0, [33, 16, 5]).collect()
    }
    assert got == {t: full[t] for t in [33, 16, 5]}


def test_bidirectional_matches_bfs(spark, karate):
    full = {r["id"]: r["dist"] for r in bfs(karate, 0).collect()}
    for t in [33, 16, 26]:
        assert bidirectional_bfs(karate, 0, t) == full[t]
    assert bidirectional_bfs(karate, 0, 0) == 0


def test_bidirectional_unreachable(spark):
    g = make_graph(spark, [(0, 1), (2, 3)])
    assert bidirectional_bfs(g, 0, 3) is None


def test_astar_matches_sssp(spark):
    g = _wgraph(spark)
    full = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    for t in [3, 5]:
        assert abs(astar_landmarks(g, 0, t) - full[t]) < 1e-9


def test_astar_karate_hops(spark, karate):
    gk = Graph.from_edges(
        karate.edges.select("src", "dst", F.lit(1.0).alias("weight")),
        directed=False,
        weighted=True,
    )
    full = {r["id"]: r["dist"] for r in bfs(karate, 0).collect()}
    for t in [33, 16]:
        assert abs(astar_landmarks(gk, 0, t) - full[t]) < 1e-9
