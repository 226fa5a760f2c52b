"""GedWalk parity tests — numpy brute-force greedy replica + semantics."""

from __future__ import annotations

import networkx as nx
import numpy as np

from linkgraph.algs.gedwalk import ged_walk
from tests.conftest import make_graph


def _numpy_gedwalk(A: np.ndarray, k: int, alpha: float, L: int):
    n = A.shape[0]
    ones = np.ones(n)

    def totals(M):
        v, out = ones.copy(), []
        for _ in range(L):
            v = M @ v
            out.append(v.sum())
        return out

    wg = totals(A)
    group: list[int] = []
    rows = []
    for step in range(k):
        H = A.copy()
        if group:
            H[group, :] = 0
            H[:, group] = 0
        ins = [ones.copy()]
        outs = [ones.copy()]
        for _ in range(L - 1):
            ins.append(H.T @ ins[-1])
            outs.append(H @ outs[-1])
        gain = np.zeros(n)
        for a in range(L):
            for b in range(L - a):
                gain += alpha ** (a + b + 1) * ins[a] * outs[b]
        gain[group] = -np.inf
        pick = min(
            (i for i in range(n) if i not in group),
            key=lambda i: (-gain[i], i),
        )
        group.append(pick)
        H2 = A.copy()
        H2[group, :] = 0
        H2[:, group] = 0
        wh = totals(H2)
        phi = sum(alpha**j * (wg[j - 1] - wh[j - 1]) for j in range(1, L + 1))
        rows.append((step, pick, gain[pick], phi))
    return rows


def _assert_parity(spark, nxg, directed, k=3, alpha=0.1, L=5):
    n = nxg.number_of_nodes()
    A = np.zeros((n, n))
    for u, v in nxg.edges():
        A[u, v] = 1.0
        if not directed:
            A[v, u] = 1.0
    g = make_graph(spark, list(nxg.edges()), directed=directed)
    got = (
        ged_walk(g, k=k, alpha=alpha, max_len=L)
        .orderBy("ord")
        .collect()
    )
    want = _numpy_gedwalk(A, k, alpha, L)
    assert len(got) == len(want)
    for r, (step, pick, gain, phi) in zip(got, want):
        assert r["ord"] == step
        assert r["id"] == pick, (r, pick)
        assert abs(r["gain"] - gain) < 1e-9 * max(1.0, abs(gain))
        assert abs(r["ged_score"] - phi) < 1e-9 * max(1.0, abs(phi))


def test_gedwalk_numpy_parity_undirected(spark):
    _assert_parity(spark, nx.gnp_random_graph(20, 0.15, seed=5), directed=False)


def test_gedwalk_numpy_parity_directed(spark):
    _assert_parity(
        spark, nx.gnp_random_graph(18, 0.18, seed=8, directed=True), directed=True
    )


def test_gedwalk_picks_star_centers(spark):
    """Two disjoint stars: the two centers dominate every walk, so the
    greedy group of 2 must be exactly the centers."""
    edges = [(0, i) for i in range(1, 8)] + [(10, i) for i in range(11, 17)]
    g = make_graph(spark, edges)
    got = ged_walk(g, k=2, max_len=4).collect()
    assert {r["id"] for r in got} == {0, 10}
    # bigger star first
    assert got[0]["id"] == 0
    # scores are positive and monotone in the prefix
    assert 0 < got[0]["ged_score"] < got[1]["ged_score"]
