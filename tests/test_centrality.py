"""Centrality (degree/eigenvector/Katz/k-core/assortativity) vs numpy/known values."""

import numpy as np
from conftest import KARATE_EDGES, collect_map, make_graph

from linkgraph.algs.centrality import (
    assortativity,
    core_decomposition,
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
)


def test_degree_centrality(karate):
    dc = collect_map(degree_centrality(karate), "id", "score")
    assert dc[33] == 17.0 and dc[0] == 16.0
    dcn = collect_map(degree_centrality(karate, normalized=True), "id", "score")
    assert abs(dcn[33] - 17 / 33) < 1e-12


def test_eigenvector_vs_numpy(karate):
    got = collect_map(eigenvector_centrality(karate, tol=1e-10), "id", "score")
    A = np.zeros((34, 34))
    for s, d in KARATE_EDGES:
        A[s, d] = A[d, s] = 1.0
    vals, vecs = np.linalg.eigh(A)
    v = np.abs(vecs[:, np.argmax(vals)])
    v = v / np.linalg.norm(v)
    assert np.allclose([got[i] for i in range(34)], v, atol=1e-5)


def test_katz_vs_numpy(karate):
    alpha, beta = 0.01, 1.0
    got = collect_map(katz_centrality(karate, alpha=alpha, beta=beta, tol=1e-12), "id", "score")
    A = np.zeros((34, 34))
    for s, d in KARATE_EDGES:
        A[s, d] = A[d, s] = 1.0
    x = np.linalg.solve(np.eye(34) - alpha * A, beta * np.ones(34))
    assert np.allclose([got[i] for i in range(34)], x, atol=1e-6)


def test_core_decomposition_k4_plus_tail(spark):
    # K4 (core 3) with a pendant path 3-4-5 (cores 1)
    g = make_graph(
        spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    )
    cores = collect_map(core_decomposition(g), "id", "core")
    assert cores == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}


def test_core_karate_known(karate):
    cores = collect_map(core_decomposition(karate), "id", "core")
    # well-known: karate's maximum core number is 4
    assert max(cores.values()) == 4
    assert cores[0] == 4 and cores[33] == 4
    # k-core nesting: (k+1)-core members are k-core members by construction
    assert min(cores.values()) >= 1


def test_assortativity_star_negative(star_8):
    # star graphs are maximally disassortative
    assert abs(assortativity(star_8) - (-1.0)) < 1e-9


def test_assortativity_cycle_degenerate(cycle_6):
    # all degrees equal → zero variance → corr undefined → engine returns 0
    assert assortativity(cycle_6) == 0.0
