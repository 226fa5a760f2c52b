"""Round-3 parity stragglers: LocalSquareClusteringCoefficient,
CoverF1Similarity, GroupHarmonicCloseness, NeighborhoodFunctionHeuristic
— each against an independent networkx / pure-Python oracle."""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.anf import neighborhood_function_heuristic
from linkgraph.algs.bfs import group_harmonic_closeness
from linkgraph.algs.community import cover_f1
from linkgraph.algs.triangles import local_square_clustering
from tests.conftest import KARATE_EDGES, make_graph


# --- square clustering -----------------------------------------------------

def _nx_of(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return g


def test_square_clustering_karate(spark):
    got = {
        r["id"]: r["c4"]
        for r in local_square_clustering(make_graph(spark, KARATE_EDGES)).collect()
    }
    want = nx.square_clustering(_nx_of(KARATE_EDGES))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_square_clustering_c4_and_random(spark):
    # a pure 4-cycle: every vertex's only wedge closes exactly one square
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = {r["id"]: r["c4"] for r in
           local_square_clustering(make_graph(spark, c4)).collect()}
    want = nx.square_clustering(_nx_of(c4))
    assert got == {v: pytest.approx(want[v]) for v in want}
    rng = random.Random(11)
    pairs = list({tuple(sorted((rng.randrange(16), rng.randrange(16))))
                  for _ in range(40)})
    pairs = [p for p in pairs if p[0] != p[1]]
    got = {r["id"]: r["c4"] for r in
           local_square_clustering(make_graph(spark, pairs)).collect()}
    want = nx.square_clustering(_nx_of(pairs))
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v


def test_square_clustering_center_cap(spark):
    # capping the hub center drops its wedges but keeps everything exact
    # on the ≤cap part: star+square graph — hub wedges excluded
    pairs = [(0, i) for i in range(1, 8)] + [(1, 8), (8, 2)]
    full = {r["id"]: r["c4"] for r in
            local_square_clustering(make_graph(spark, pairs)).collect()}
    capped = {r["id"]: r["c4"] for r in
              local_square_clustering(make_graph(spark, pairs),
                                      max_center_degree=3).collect()}
    assert full[1] > 0  # square 1-0-2-8 exists through center 0 and 8
    assert set(capped) == set(full)


# --- cover F1 ---------------------------------------------------------------

def test_cover_f1_identical_and_split(spark):
    a = spark.createDataFrame([(i, i // 5) for i in range(20)], "id bigint, label bigint")
    out = {r["label"]: r["best_f1"] for r in cover_f1(a, a).collect()}
    assert out == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}
    # reference merges pairs of clusters: F1 = 2*5/(5+10) = 2/3
    b = spark.createDataFrame([(i, i // 10) for i in range(20)], "id bigint, label bigint")
    out = {r["label"]: r["best_f1"] for r in cover_f1(a, b).collect()}
    assert all(abs(v - 2 / 3) < 1e-12 for v in out.values())


def test_cover_f1_disjoint_zero(spark):
    a = spark.createDataFrame([(1, 0), (2, 0)], "id bigint, label bigint")
    b = spark.createDataFrame([(3, 7)], "id bigint, label bigint")
    assert cover_f1(a, b).collect()[0]["best_f1"] == 0.0


def test_cover_f1_python_replica_random(spark):
    rng = random.Random(3)
    a_rows = [(i, rng.randrange(4)) for i in range(40)]
    b_rows = [(i, rng.randrange(3)) for i in range(40)]
    a = spark.createDataFrame(a_rows, "id bigint, label bigint")
    b = spark.createDataFrame(b_rows, "id bigint, label bigint")
    got = {r["label"]: r["best_f1"] for r in cover_f1(a, b).collect()}
    from collections import Counter, defaultdict

    na, nb = Counter(l for _, l in a_rows), Counter(l for _, l in b_rows)
    ov = defaultdict(int)
    bmap = dict(b_rows)
    for i, la in a_rows:
        if i in bmap:
            ov[(la, bmap[i])] += 1
    for la in na:
        want = max(
            (2.0 * o / (na[la] + nb[lb]) for (xa, lb), o in ov.items() if xa == la),
            default=0.0,
        )
        assert abs(got[la] - want) < 1e-12, la


# --- group harmonic closeness ------------------------------------------------

def _py_group_harmonic(pairs, k):
    g = _nx_of(pairs)
    dist = dict(nx.all_pairs_shortest_path_length(g))
    nodes = sorted(g.nodes())
    cur = {u: 0.0 for u in nodes}
    group = []
    for _ in range(k):
        best_v, best_gain = None, 0.0
        for v in nodes:
            if v in group:
                continue
            gain = sum(
                max((1.0 / d) - cur[u], 0.0)
                for u, d in dist[v].items()
                if d > 0
            )
            if gain > best_gain + 1e-15 or (
                abs(gain - best_gain) <= 1e-15 and best_v is not None and v < best_v and gain > 0
            ):
                best_v, best_gain = v, gain
        if best_v is None or best_gain <= 0.0:
            break
        group.append(best_v)
        for u, d in dist[best_v].items():
            if d > 0:
                cur[u] = max(cur[u], 1.0 / d)
    return group


def test_group_harmonic_matches_python_greedy(spark):
    g = make_graph(spark, KARATE_EDGES)
    got = sorted(r["id"] for r in group_harmonic_closeness(g, k=3).collect())
    want = sorted(_py_group_harmonic(KARATE_EDGES, 3))
    assert got == want


def test_group_harmonic_disconnected(spark):
    pairs = [(0, 1), (1, 2), (10, 11), (11, 12)]
    got = set(r["id"] for r in
              group_harmonic_closeness(make_graph(spark, pairs), k=2).collect())
    # one pick per component — harmonic rewards coverage across components
    assert len(got & {0, 1, 2}) == 1 and len(got & {10, 11, 12}) == 1


# --- neighborhood function heuristic -----------------------------------------

def test_nf_heuristic_full_sample_is_exact(spark):
    g = make_graph(spark, KARATE_EDGES)
    est = dict(neighborhood_function_heuristic(g, n_samples=34))
    nxg = _nx_of(KARATE_EDGES)
    dist = dict(nx.all_pairs_shortest_path_length(nxg))
    exact = {}
    maxd = max(max(d.values()) for d in dist.values())
    for h in range(maxd + 1):
        exact[h] = float(
            sum(1 for v in dist for u, d in dist[v].items() if d <= h)
        )
    assert est == exact


def test_nf_heuristic_sampled_band(spark):
    g = make_graph(spark, KARATE_EDGES)
    est = dict(neighborhood_function_heuristic(g, n_samples=12, seed=5))
    # N(0) = n exactly (every sampled source sees itself), and the curve
    # must be monotone and end at ~n² for a connected graph
    assert est[0] == 34.0
    vals = [est[h] for h in sorted(est)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    assert 0.5 * 34 * 34 <= vals[-1] <= 1.5 * 34 * 34


# --- forest centrality --------------------------------------------------------

def _np_forest_scores(pairs):
    import numpy as np

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v in pairs:
        iu, iv = idx[u], idx[v]
        L[iu, iu] += 1; L[iv, iv] += 1
        L[iu, iv] -= 1; L[iv, iu] -= 1
    Fm = np.linalg.inv(np.eye(n) + L)
    out = {}
    for v in nodes:
        i = idx[v]
        s = sum(Fm[i, i] + Fm[j, j] - 2 * Fm[i, j] for j in range(n))
        out[v] = (n - 1) / s
    return out


def test_forest_centrality_vs_numpy(spark):
    from linkgraph.algs.electrical import forest_centrality

    g = make_graph(spark, KARATE_EDGES)
    got = {r["id"]: r["score"] for r in
           forest_centrality(g, k=24, seed=3).collect()}
    want = _np_forest_scores(KARATE_EDGES)
    assert set(got) == set(want)
    for v in want:   # JL band, same as the electrical-closeness tests
        assert got[v] == pytest.approx(want[v], rel=0.35), v
    # ranking head should broadly agree: hub 34 (id 33) is top in truth
    top_got = max(got, key=got.get)
    assert want[top_got] >= sorted(want.values())[-5]


def test_forest_centrality_disconnected_finite(spark):
    """The whole point of the forest metric: finite, sensible scores
    across components (electrical closeness diverges here)."""
    from linkgraph.algs.electrical import forest_centrality

    pairs = [(0, 1), (1, 2), (10, 11)]
    g = make_graph(spark, pairs)
    got = {r["id"]: r["score"] for r in
           forest_centrality(g, k=24, seed=7).collect()}
    want = _np_forest_scores(pairs)
    assert set(got) == {0, 1, 2, 10, 11}
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=0.4), v
    assert all(v > 0 for v in got.values())
