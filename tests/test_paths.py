"""Path retrieval (distance/BFS.cpp::getPath, Dijkstra.cpp::getPredecessors).

The engine stores one deterministic predecessor per vertex (struct-min
over the relaxation agg); these tests pin (a) dist parity vs networkx,
(b) the BFS pred tie-break rule pred(v) = min{u : dist(u)=dist(v)-1,
(u,v) in E} the doc_bfs_path gate oracle replays, and (c) path VALIDITY
invariants for the weighted variants (edge-by-edge existence + length
telescoping to dist — the any-valid-shortest-path contract).
"""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.bfs import astar_landmarks, bfs, get_path, spsp, sssp
from linkgraph.graph import Graph
from tests.conftest import KARATE_EDGES, make_graph


def _nx_karate():
    G = nx.Graph()
    G.add_edges_from(KARATE_EDGES)
    return G


def test_bfs_pred_tie_break_rule(karate):
    res = bfs(karate, 0, return_pred=True).collect()
    dist = {r["id"]: r["dist"] for r in res}
    pred = {r["id"]: r["pred"] for r in res}
    G = _nx_karate()
    nxd = nx.single_source_shortest_path_length(G, 0)
    assert {v: int(d) for v, d in dist.items()} == dict(nxd)
    assert pred[0] is None
    for v, p in pred.items():
        if v == 0:
            continue
        expect = min(u for u in G.neighbors(v) if nxd[u] == nxd[v] - 1)
        assert p == expect, (v, p, expect)


def test_get_path_unweighted(karate):
    dp = bfs(karate, 0, return_pred=True).persist()
    G = _nx_karate()
    nxd = nx.single_source_shortest_path_length(G, 0)
    for t in (0, 5, 16, 26, 33):
        path = get_path(dp, 0, t)
        assert path[0] == 0 and path[-1] == t
        assert len(path) == nxd[t] + 1
        for a, b in zip(path, path[1:]):
            assert G.has_edge(a, b)
    dp.unpersist()


def test_get_path_unreachable(two_components):
    dp = bfs(two_components, 0, return_pred=True)
    assert get_path(dp, 0, 5) is None


def _random_weighted(spark, seed=11, n=20, deg=3):
    rng = random.Random(seed)
    rows = []
    for u in range(n):
        for _ in range(deg):
            v = rng.randrange(n)
            if v != u:
                rows.append((u, v, round(rng.uniform(0.1, 3.0), 3)))
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=False, weighted=True)
    G = nx.Graph()
    for u, v, w in rows:
        if not G.has_edge(u, v) or G[u][v]["weight"] < w:
            G.add_edge(u, v, weight=w)  # engine max-weight dedup on sym
    return g, G


def test_sssp_pred_validity_weighted(spark):
    g, G = _random_weighted(spark)
    res = sssp(g, 0, return_pred=True).persist()
    rows = res.collect()
    dist = {r["id"]: r["dist"] for r in rows}
    nxd = nx.single_source_dijkstra_path_length(G, 0)
    assert set(dist) == set(nxd)
    for v, d in dist.items():
        assert abs(d - nxd[v]) < 1e-9
    # pred telescoping: dist(pred)+w(pred,v) == dist(v) edge-by-edge
    for r in rows:
        v, p = r["id"], r["pred"]
        if v == 0:
            assert p is None
            continue
        assert G.has_edge(p, v)
        assert abs(dist[p] + G[p][v]["weight"] - dist[v]) < 1e-9
    # full path reconstruction telescopes to the distance
    far = max(dist, key=dist.get)
    path = get_path(res, 0, far)
    assert path[0] == 0 and path[-1] == far
    total = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
    assert abs(total - dist[far]) < 1e-9
    res.unpersist()


def test_spsp_return_path(spark):
    g, G = _random_weighted(spark, seed=23)
    nxd = nx.single_source_dijkstra_path_length(G, 0)
    t = max(nxd, key=nxd.get)
    d, path = spsp(g, 0, t, return_path=True)
    assert abs(d - nxd[t]) < 1e-9
    assert path[0] == 0 and path[-1] == t
    total = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
    assert abs(total - d) < 1e-9


def test_spsp_return_path_unreachable(spark):
    rows = [(0, 1, 1.0), (2, 3, 1.0)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=False, weighted=True)
    d, path = spsp(g, 0, 3, return_path=True)
    assert d is None and path is None


def test_astar_return_path(spark):
    g, G = _random_weighted(spark, seed=31)
    nxd = nx.single_source_dijkstra_path_length(G, 0)
    t = max(nxd, key=nxd.get)
    d, path = astar_landmarks(g, 0, t, n_landmarks=3, return_path=True)
    assert abs(d - nxd[t]) < 1e-9
    assert path[0] == 0 and path[-1] == t
    total = sum(G[a][b]["weight"] for a, b in zip(path, path[1:]))
    assert abs(total - d) < 1e-9
