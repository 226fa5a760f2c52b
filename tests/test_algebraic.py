"""Algebraic backend (GraphBLAS-style semiring ops) vs numpy oracles and
the dedicated operators — NetworKit algebraic/ parity
(AlgebraicPageRank / AlgebraicBellmanFord / AlgebraicTriangleCounting)."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.algebraic import (
    MIN_PLUS,
    adjacency_matrix,
    algebraic_bellman_ford,
    algebraic_bfs_levels,
    algebraic_pagerank,
    algebraic_triangle_count,
    laplacian_matrix,
    mat_mat,
    mat_vec,
    transpose_matrix,
)
from linkgraph.graph import Graph
from tests.conftest import make_graph


def _rand_sparse(rng, n, density=0.3):
    m = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if rng.random() < density:
                m[i, j] = round(rng.uniform(0.1, 5.0), 3)
    return m


def _mat_df(spark, m):
    rows = [
        (i, j, float(m[i, j]))
        for i in range(m.shape[0])
        for j in range(m.shape[1])
        if m[i, j] != 0
    ]
    return spark.createDataFrame(rows, "row bigint, col bigint, val double")


def _vec_df(spark, v):
    rows = [(i, float(x)) for i, x in enumerate(v) if x != 0]
    return spark.createDataFrame(rows, "id bigint, val double")


def test_mat_vec_plus_times_vs_numpy(spark):
    rng = random.Random(7)
    m = _rand_sparse(rng, 8)
    v = np.array([round(rng.uniform(-2, 2), 3) for _ in range(8)])
    got = {
        r["id"]: r["val"]
        for r in mat_vec(_mat_df(spark, m), _vec_df(spark, v)).collect()
    }
    want = m @ v
    for i in range(8):
        # rows whose dot product has no nonzero term are absent (semiring zero)
        nonzero_terms = any(m[i, k] != 0 and v[k] != 0 for k in range(8))
        if nonzero_terms:
            assert got[i] == pytest.approx(want[i], abs=1e-9)
        else:
            assert i not in got


def test_mat_vec_min_plus_vs_numpy(spark):
    rng = random.Random(11)
    m = _rand_sparse(rng, 7, density=0.4)
    v = np.array([round(rng.uniform(0, 3), 3) for _ in range(7)])
    got = {
        r["id"]: r["val"]
        for r in mat_vec(_mat_df(spark, m), _vec_df(spark, v), MIN_PLUS).collect()
    }
    for i in range(7):
        terms = [m[i, k] + v[k] for k in range(7) if m[i, k] != 0 and v[k] != 0]
        if terms:
            assert got[i] == pytest.approx(min(terms), abs=1e-9)
        else:
            assert i not in got


def test_mat_mat_masked_vs_numpy(spark):
    rng = random.Random(13)
    a = _rand_sparse(rng, 6, density=0.4)
    b = _rand_sparse(rng, 6, density=0.4)
    mask = _rand_sparse(rng, 6, density=0.5)
    c = mat_mat(_mat_df(spark, a), _mat_df(spark, b), mask=_mat_df(spark, mask))
    got = {(r["row"], r["col"]): r["val"] for r in c.collect()}
    want = a @ b
    for i in range(6):
        for j in range(6):
            has_terms = any(a[i, k] != 0 and b[k, j] != 0 for k in range(6))
            if mask[i, j] != 0 and has_terms:
                assert got[(i, j)] == pytest.approx(want[i, j], abs=1e-9)
            else:
                assert (i, j) not in got


def test_transpose_and_laplacian(spark, karate):
    a = adjacency_matrix(karate)
    at = transpose_matrix(a)
    assert {(r["row"], r["col"]) for r in at.collect()} == {
        (r["col"], r["row"]) for r in a.collect()
    }
    lap = laplacian_matrix(karate)
    # every Laplacian row sums to zero
    sums = lap.groupBy("row").agg(F.sum("val").alias("s")).collect()
    assert all(abs(r["s"]) < 1e-9 for r in sums)


def test_algebraic_pagerank_matches_dedicated(spark):
    # directed graph WITH a sink (3 has no out-edges) to exercise the
    # sink-mass term against pagerank(distribute_sinks=True)
    g = make_graph(
        spark,
        [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (4, 3)],
        directed=True,
    )
    from linkgraph.algs.pagerank import pagerank

    # fixed-iteration mode on both sides: identical recurrences run the
    # identical 40 steps, so parity is exact regardless of convergence
    want = {r["id"]: r["rank"] for r in pagerank(g, tol=0, max_iter=40).collect()}
    got = {
        r["id"]: r["rank"]
        for r in algebraic_pagerank(g, max_iter=40, tol=0.0).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_algebraic_bellman_ford_matches_sssp(spark):
    rng = random.Random(23)
    pairs = []
    for _ in range(40):
        u, v = rng.randrange(12), rng.randrange(12)
        if u != v:
            pairs.append((u, v, round(rng.uniform(0.1, 2.0), 3)))
    g = make_graph(spark, pairs, directed=True, weighted=True)
    from linkgraph.algs.bfs import sssp

    want = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    got = {r["id"]: r["dist"] for r in algebraic_bellman_ford(g, 0).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_algebraic_bfs_levels(spark, karate):
    from linkgraph.algs.bfs import bfs

    want = {r["id"]: r["dist"] for r in bfs(karate, 0).collect()}
    got = {r["id"]: r["dist"] for r in algebraic_bfs_levels(karate, 0).collect()}
    assert got == want


def test_algebraic_triangle_count(spark, karate):
    from linkgraph.algs.triangles import per_vertex_triangles

    per_v = per_vertex_triangles(karate).agg(F.sum("triangles")).collect()[0][0]
    assert algebraic_triangle_count(karate) == per_v // 3  # 45 in karate
    assert algebraic_triangle_count(karate) == 45
