"""PivotMDS layout tests — numpy SVD parity and structural invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.layout import pivot_mds
from tests.conftest import make_graph


def _coords(df):
    return {r["id"]: (r["x0"], r["x1"]) for r in df.collect()}


def test_path_graph_first_axis_monotone(spark):
    """On a path the dominant MDS axis orders vertices along the path."""
    n = 9
    g = make_graph(spark, [(i, i + 1) for i in range(n - 1)])
    xs = {r["id"]: r["x0"] for r in pivot_mds(g, k=n, dims=1).collect()}
    seq = [xs[i] for i in range(n)]
    diffs = np.diff(seq)
    assert (diffs > 0).all() or (diffs < 0).all()


def test_two_cliques_separate(spark):
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    g = make_graph(spark, edges)
    pos = _coords(pivot_mds(g, k=8, dims=2))
    arr = {i: np.array(pos[i]) for i in pos}

    def d(a, b):
        return float(np.linalg.norm(arr[a] - arr[b]))

    intra = max(d(0, 1), d(1, 2), d(5, 6), d(6, 7))
    inter = min(d(0, 5), d(1, 6), d(2, 7))
    assert inter > intra


def test_numpy_svd_parity(spark, karate):
    """The power-iterated component must align (|cos| > 0.99) with the
    top right singular vector of the SAME double-centered pivot-distance
    matrix computed by numpy SVD."""
    import networkx as nx

    k = 8
    out = pivot_mds(karate, k=k, dims=2, iters=80, seed=42)
    xs = {r["id"]: (r["x0"], r["x1"]) for r in out.collect()}

    # rebuild D identically: same hash pivot choice, hop distances
    ids = sorted(xs)
    piv = [
        r["id"]
        for r in karate.nodes()
        .orderBy(F.xxhash64("id", F.lit(42)), F.asc("id"))
        .limit(k)
        .collect()
    ]
    G = nx.Graph()
    for r in karate.symmetric_edges().collect():
        G.add_edge(r["src"], r["dst"])
    D = np.array(
        [[nx.shortest_path_length(G, p, i) for i in ids] for p in piv],
        dtype=float,
    )
    D2 = D**2
    C = -0.5 * (
        D2
        - D2.mean(axis=1, keepdims=True)
        - D2.mean(axis=0, keepdims=True)
        + D2.mean()
    )
    _, s, vt = np.linalg.svd(C, full_matrices=False)
    for dim in range(2):
        ours = np.array([xs[i][dim] for i in ids])
        ref = s[dim] * vt[dim]
        cos = abs(ours @ ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
        assert cos > 0.99, (dim, cos)


def test_deterministic(two_triangles_bridge):
    """Same seed -> same layout to float-sum reordering tolerance (exact
    bitwise equality is not promised for float aggregations; labels/ids
    everywhere else are hash-deterministic)."""
    a = _coords(pivot_mds(two_triangles_bridge, k=6, dims=2, iters=15))
    b = _coords(pivot_mds(two_triangles_bridge, k=6, dims=2, iters=15))
    for i in a:
        assert np.allclose(a[i], b[i], rtol=1e-6, atol=1e-9)


def test_disconnected_does_not_crash(two_components):
    out = pivot_mds(two_components, k=6, dims=2, iters=10)
    assert out.count() == two_components.nodes().count()
