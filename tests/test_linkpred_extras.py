"""Link-prediction index tail: AdjustedRandIndex, NeighborsMeasure
(Friends measure), AlgebraicDistanceIndex — pure-Python replicas."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from linkgraph.algs.linkpred import (
    adjusted_rand_index,
    algebraic_distance_index,
    neighbors_measure,
)
from tests.conftest import KARATE_EDGES, make_graph


def _nbrs(edges):
    nb = defaultdict(set)
    for u, v in edges:
        nb[u].add(v)
        nb[v].add(u)
    return nb


def _ari_replica(edges):
    nb = _nbrs(edges)
    n = len(nb)
    out = {}
    for u in nb:
        for v in nb:
            if u >= v:
                continue
            i = len(nb[u] & nb[v])
            if i == 0:
                continue  # candidate set = common-neighbor pairs
            a, b = len(nb[u]) - i, len(nb[v]) - i
            d = n - (i + a + b)
            num = 2.0 * (i * d - a * b)
            den = (i + a) * (a + d) + (i + b) * (b + d)
            out[(u, v)] = num / den if den != 0 else 0.0
    return out


def _friends_replica(edges):
    nb = _nbrs(edges)
    out = {}
    for u in nb:
        for v in nb:
            if u >= v:
                continue
            c = sum(
                1
                for x in nb[u]
                for y in nb[v]
                if x == y or y in nb[x]
            )
            if c > 0:
                out[(u, v)] = float(c)
    return out


def test_adjusted_rand_vs_replica(spark, karate):
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adjusted_rand_index(karate).collect()
    }
    want = _ari_replica(KARATE_EDGES)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_adjusted_rand_identical_neighborhoods(spark):
    # 0 and 1 share exactly neighbors {2,3} and nothing else -> high ARI
    g = make_graph(spark, [(0, 2), (0, 3), (1, 2), (1, 3), (4, 5)])
    got = {
        (r["u"], r["v"]): r["score"] for r in adjusted_rand_index(g).collect()
    }
    want = _ari_replica([(0, 2), (0, 3), (1, 2), (1, 3), (4, 5)])
    assert got[(0, 1)] == pytest.approx(want[(0, 1)], abs=1e-12)
    assert got[(0, 1)] == max(got.values())


def test_friends_measure_vs_replica(spark, karate):
    got = {
        (r["u"], r["v"]): r["score"] for r in neighbors_measure(karate).collect()
    }
    want = _friends_replica(KARATE_EDGES)
    assert got == want


def test_friends_measure_three_path_only(spark):
    # path 0-1-2-3: pair (0,3) has no common neighbor but one 3-path
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        (r["u"], r["v"]): r["score"] for r in neighbors_measure(g).collect()
    }
    assert got[(0, 3)] == 1.0
    assert got == _friends_replica([(0, 1), (1, 2), (2, 3)])


def test_algebraic_index_matches_edge_distances(spark, karate):
    from linkgraph.algs.bfs import algebraic_distance

    edge_d = {
        (r["src"], r["dst"]): r["dist"]
        for r in algebraic_distance(karate, n_systems=4, n_iters=8).collect()
    }
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (32, 33)], "u bigint, v bigint"
    )
    got = {
        (r["u"], r["v"]): r["score"]
        for r in algebraic_distance_index(
            karate, pairs=pairs, n_systems=4, n_iters=8
        ).collect()
    }
    for k in got:
        assert got[k] == pytest.approx(edge_d[k], abs=1e-9)


def test_algebraic_index_default_candidates(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    out = algebraic_distance_index(g, n_systems=4, n_iters=6)
    rows = out.collect()
    assert all(r["score"] >= 0.0 for r in rows)
    # candidate set = common-neighbor pairs
    assert {(r["u"], r["v"]) for r in rows} == {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)}
