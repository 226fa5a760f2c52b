"""DynBetweenness (addition path): incremental must equal full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.algs.betweenness import (
    betweenness,
    brandes_state,
    dyn_betweenness_additions,
    scores_from_state,
)
from linkgraph.graph import Graph
from tests.conftest import make_graph


def _scores(df):
    return {r["id"]: r["score"] for r in df.collect()}


def _add_edges(spark, graph, pairs):
    extra = spark.createDataFrame(
        [(u, v, 1.0) for u, v in pairs], "src bigint, dst bigint, weight double"
    )
    return Graph.from_edges(
        graph.edges.unionByName(extra), directed=graph.directed
    )


def test_dyn_equals_recompute_path(spark):
    g0 = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    st = brandes_state(g0)
    g1 = _add_edges(spark, g0, [(0, 4)])  # close the path into a cycle
    st1 = dyn_betweenness_additions(g1, st, [(0, 4)])
    dyn = _scores(scores_from_state(g1, st1))
    ful = _scores(betweenness(g1))
    for k in ful:
        assert abs(dyn[k] - ful[k]) < 1e-9, (k, dyn[k], ful[k])


def test_dyn_equals_recompute_karate(spark, karate):
    st = brandes_state(karate)
    adds = [(0, 26), (15, 16)]
    g1 = _add_edges(spark, karate, adds)
    st1 = dyn_betweenness_additions(g1, st, adds)
    dyn = _scores(scores_from_state(g1, st1))
    ful = _scores(betweenness(g1))
    for k in ful:
        assert abs(dyn[k] - ful[k]) < 1e-9, (k, dyn[k], ful[k])


def test_dyn_sequential_additions(spark):
    g0 = make_graph(spark, [(0, 1), (1, 2), (3, 4)])  # two components
    st = brandes_state(g0)
    g1 = _add_edges(spark, g0, [(2, 3)])  # connect them
    st = dyn_betweenness_additions(g1, st, [(2, 3)])
    g2 = _add_edges(spark, g1, [(0, 4)])
    st = dyn_betweenness_additions(g2, st, [(0, 4)])
    dyn = _scores(scores_from_state(g2, st))
    ful = _scores(betweenness(g2))
    for k in ful:
        assert abs(dyn[k] - ful[k]) < 1e-9


def test_same_level_edge_prunes_all_sources(spark):
    """An edge between vertices equidistant from EVERY source changes no
    shortest path: the state must be returned untouched (source pruning
    actually prunes)."""
    # 4-cycle: adding a chord between opposite corners 1-3 keeps
    # d(s,1) == d(s,3) for s in {0, 2} but not for s in {1, 3} — so use
    # the bowtie-free square + pendant construction where the new edge
    # joins the two middle vertices of a 4-path from both ends... simplest
    # true case: K4 minus one edge, add the missing edge's PARALLEL? Use
    # direct check instead: star graph, edge between two leaves changes
    # distances (1+1=2 vs 2) -> NOT prunable; so assert the opposite via
    # the 6-cycle chord (3 apart): every source has |d(u)-d(v)| 1 or 3.
    g0 = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    st = brandes_state(g0)
    # adding an edge that already exists' mirror (1,3): d(s,1) vs d(s,3):
    # s=0: 1,1 equal; s=2: 1,1 equal; s=1: 0,2 differ -> affected subset
    g1 = _add_edges(spark, g0, [(1, 3)])
    st1 = dyn_betweenness_additions(g1, st, [(1, 3)])
    # sources 0 and 2 must carry over their OLD rows object-identically in
    # content (same dist/sigma/delta values)
    old_02 = sorted(
        map(tuple, st.where(F.col("source").isin(0, 2)).collect())
    )
    new_02 = sorted(
        map(tuple, st1.where(F.col("source").isin(0, 2)).collect())
    )
    assert old_02 == new_02
    dyn = _scores(scores_from_state(g1, st1))
    ful = _scores(betweenness(g1))
    for k in ful:
        assert abs(dyn[k] - ful[k]) < 1e-9
