"""Round-2c: DynBFS/DynDijkstra, ForestFire + Multiscale scores,
PageRankNibble, SEIR simulation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from tests.conftest import collect_map, make_graph


# --------------------------------------------------------------------------
# DynBFS / DynDijkstra
# --------------------------------------------------------------------------

def test_dyn_bfs_matches_recompute(spark):
    from linkgraph.algs.bfs import bfs, dyn_bfs_additions

    base = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g0 = make_graph(spark, base)
    d0 = bfs(g0, 0)
    # add a shortcut 0-4 and an off-path edge 1-3
    add = spark.createDataFrame([(0, 4), (1, 3)], "src bigint, dst bigint")
    g1 = make_graph(spark, base + [(0, 4), (1, 3)])
    got = collect_map(dyn_bfs_additions(g1, d0, add), "id", "dist")
    want = collect_map(bfs(g1, 0), "id", "dist")
    assert got == want
    assert got[4] == 1.0 and got[3] == 2.0


def test_dyn_bfs_reaches_new_vertices(spark):
    from linkgraph.algs.bfs import bfs, dyn_bfs_additions

    g0 = make_graph(spark, [(0, 1)])
    d0 = bfs(g0, 0)
    add = spark.createDataFrame([(1, 2), (2, 3)], "src bigint, dst bigint")
    g1 = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    got = collect_map(dyn_bfs_additions(g1, d0, add), "id", "dist")
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_dyn_sssp_weighted(spark):
    from linkgraph.algs.bfs import dyn_sssp_additions, sssp

    base = [(0, 1, 10.0), (1, 2, 10.0)]
    df0 = spark.createDataFrame(base, "src bigint, dst bigint, weight double")
    g0 = Graph.from_edges(df0, weighted=True)
    d0 = sssp(g0, 0)
    add = spark.createDataFrame([(0, 2, 3.0)], "src bigint, dst bigint, weight double")
    g1 = Graph.from_edges(df0.unionByName(add), weighted=True)
    got = collect_map(dyn_sssp_additions(g1, d0, add), "id", "dist")
    want = collect_map(sssp(g1, 0), "id", "dist")
    assert got == want
    assert got[2] == 3.0
    # improvement propagates THROUGH old edges: dist(1) via 2 would be 13 —
    # original 10 stands; but dist via new edge where shorter must win
    assert got[1] == 10.0


# --------------------------------------------------------------------------
# sparsification scores
# --------------------------------------------------------------------------

def test_multiscale_score_values(spark):
    from linkgraph.algs.sparsification import multiscale_score

    df = spark.createDataFrame(
        [(0, 1, 8.0), (0, 2, 1.0), (0, 3, 1.0)],
        "src bigint, dst bigint, weight double",
    )
    g = Graph.from_edges(df, weighted=True)
    sc = {(r.src, r.dst): r.score for r in multiscale_score(g).collect()}
    # endpoint 1 has k=1 → significance 1.0 → max = 1.0
    assert sc[(0, 1)] == pytest.approx(1.0)
    # edge (0,2): at 0: p=1/10,k=3 → 1-(0.9)^2=0.19; at 2: k=1 → 1.0
    assert sc[(0, 2)] == pytest.approx(1.0)


def test_multiscale_hub_side(spark):
    from linkgraph.algs.sparsification import multiscale_score

    # star where leaves have degree 2 (ring among leaves) so no k=1 shortcut
    df = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 2, 1.0)],
        "src bigint, dst bigint, weight double",
    )
    g = Graph.from_edges(df, weighted=True)
    sc = {(r.src, r.dst): r.score for r in multiscale_score(g).collect()}
    # heavy edge (0,1) should be more significant than light (0,2)
    assert sc[(0, 1)] > sc[(0, 2)]


def test_forest_fire_score(spark, two_triangles_bridge):
    from linkgraph.algs.sparsification import forest_fire_score

    sc = forest_fire_score(two_triangles_bridge, n_fires=32, p_burn=0.8, seed=3)
    rows = {(r.src, r.dst): r.score for r in sc.collect()}
    assert len(rows) == 7  # all edges present
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert sum(rows.values()) > 0  # something burned
    # deterministic
    sc2 = forest_fire_score(two_triangles_bridge, n_fires=32, p_burn=0.8, seed=3)
    rows2 = {(r.src, r.dst): r.score for r in sc2.collect()}
    assert rows == rows2


# --------------------------------------------------------------------------
# PageRankNibble
# --------------------------------------------------------------------------

def test_ppr_localizes(spark, two_triangles_bridge):
    from linkgraph.algs.scd import personalized_pagerank

    ppr = collect_map(
        personalized_pagerank(two_triangles_bridge, [0]), "id", "rank"
    )
    # mass concentrates on the seed triangle {0,1,2}
    assert ppr[0] > ppr[3] and ppr[1] > ppr[4]
    assert sum(ppr.values()) == pytest.approx(1.0, abs=1e-3)


def test_pagerank_nibble_finds_seed_triangle(spark, two_triangles_bridge):
    from linkgraph.algs.scd import conductance_of, pagerank_nibble

    comm = pagerank_nibble(two_triangles_bridge, [0])
    members = sorted(r["id"] for r in comm.collect())
    assert members == [0, 1, 2]
    assert conductance_of(two_triangles_bridge, comm) == pytest.approx(1 / 7)


def test_conductance_of_whole_graph(spark, two_triangles_bridge):
    from linkgraph.algs.scd import conductance_of

    all_nodes = two_triangles_bridge.nodes()
    # S = V → denominator 0 → conductance 1.0 by convention
    assert conductance_of(two_triangles_bridge, all_nodes) == 1.0


# --------------------------------------------------------------------------
# SEIR
# --------------------------------------------------------------------------

def test_seir_full_spread(spark, path_5):
    from linkgraph.algs.simulation import seir

    final, census = seir(
        path_5, zero=[0], p_transmit=1.0, t_latent=1, t_infectious=3, ticks=40,
        seed=1,
    )
    states = collect_map(final, "id", "state")
    # p=1 on a connected path: everyone eventually recovers
    assert all(s == 3 for s in states.values())
    # census conserves population
    assert all(s + e + i + r == 5 for _, s, e, i, r in census)
    # epidemic is over at the end
    assert census[-1][2] == 0 and census[-1][3] == 0


def test_seir_no_transmission(spark, path_5):
    from linkgraph.algs.simulation import seir

    final, census = seir(
        path_5, zero=[2], p_transmit=0.0, t_infectious=2, ticks=10, seed=1
    )
    states = collect_map(final, "id", "state")
    assert states[2] == 3  # patient zero recovered
    assert sum(1 for s in states.values() if s == 0) == 4  # rest untouched


def test_seir_deterministic(spark, karate):
    from linkgraph.algs.simulation import seir

    _, c1 = seir(karate, zero=[0], p_transmit=0.3, ticks=12, seed=7)
    _, c2 = seir(karate, zero=[0], p_transmit=0.3, ticks=12, seed=7)
    assert c1 == c2


def test_dyn_multi_source_matches_recompute(spark):
    from linkgraph.algs.bfs import dyn_multi_source_additions, multi_source_bfs

    base = [(0, 1), (1, 2), (2, 3), (4, 5)]
    g0 = make_graph(spark, base)
    d0 = multi_source_bfs(g0, [0, 4])
    add = spark.createDataFrame([(3, 4)], "src bigint, dst bigint")
    g1 = make_graph(spark, base + [(3, 4)])
    got = sorted(map(tuple, dyn_multi_source_additions(g1, d0, add).collect()))
    want = sorted(map(tuple, multi_source_bfs(g1, [0, 4]).collect()))
    assert got == want
    # the new edge connected the two components for BOTH sources
    gd = {(s, i): d for s, i, d in got}
    assert gd[(0, 5)] == 5.0 and gd[(4, 0)] == 4.0


def test_laplacian_centrality_path(spark, path_5):
    from linkgraph.algs.centrality import laplacian_centrality

    lc = collect_map(laplacian_centrality(path_5), "id", "score")
    # path 0-1-2-3-4 (unweighted): LC(v) = d²+d+2Σ_{u∈N(v)}d(u)
    assert lc[0] == 1 + 1 + 2 * 2          # end: d=1, neighbor d=2
    assert lc[1] == 4 + 2 + 2 * (1 + 2)    # d=2, neighbors d=1,2
    assert lc[2] == 4 + 2 + 2 * (2 + 2)    # center
    assert lc[2] > lc[0]                    # center most central


def test_laplacian_centrality_weighted(spark):
    from linkgraph.algs.centrality import laplacian_centrality

    df = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0)], "src bigint, dst bigint, weight double"
    )
    g = Graph.from_edges(df, weighted=True)
    lc = collect_map(laplacian_centrality(g), "id", "score")
    # v=0: wdeg=2; N={1} wdeg_1=5, w=2 → 4 + (2*5*2 + 4) = 28
    assert lc[0] == pytest.approx(28.0)
    # v=1: wdeg=5 → 25 + (2*2*2+4) + (2*3*3+9) = 25+12+27 = 64
    assert lc[1] == pytest.approx(64.0)


def test_closeness_sampled_full_sample_exact(spark, path_5):
    from linkgraph.algs.bfs import closeness, closeness_sampled

    exact = collect_map(closeness(path_5), "id", "score")
    est = collect_map(closeness_sampled(path_5, n_samples=5), "id", "score")
    for k in exact:
        assert est[k] == pytest.approx(exact[k], rel=1e-9)


def test_incremental_wcc_additions(spark):
    from linkgraph.algs.components import connected_components
    from linkgraph.streaming.deltas import incremental_wcc_additions

    g = make_graph(spark, [(0, 1), (2, 3)], directed=True)
    base = connected_components(g.to_undirected()).withColumnRenamed(
        "component", "label"
    )
    add = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    lab = collect_map(incremental_wcc_additions(base, add), "id", "label")
    assert len(set(lab.values())) == 1


def test_b_suitor_respects_capacity(spark, karate):
    from linkgraph.algs.matching import b_suitor_matching

    m = b_suitor_matching(karate, b=2)
    rows = m.collect()
    cnt = {}
    for r in rows:
        cnt[r["u"]] = cnt.get(r["u"], 0) + 1
        cnt[r["v"]] = cnt.get(r["v"], 0) + 1
    assert cnt and max(cnt.values()) <= 2
    # no duplicate pairs, canonical order
    pairs = [(r["u"], r["v"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(u < v for u, v in pairs)


def test_b_suitor_b1_equals_suitor(spark, karate):
    from linkgraph.algs.matching import b_suitor_matching, suitor_matching

    m1 = sorted(map(tuple, suitor_matching(karate).select("u", "v").collect()))
    mb = sorted(map(tuple, b_suitor_matching(karate, b=1).select("u", "v").collect()))
    assert m1 == mb


def test_b_suitor_per_vertex_caps(spark):
    from linkgraph.algs.matching import b_suitor_matching

    # star 0-(1,2,3): center capacity 2, leaves 1 → exactly 2 matches
    g = make_graph(spark, [(0, 1), (0, 2), (0, 3)])
    caps = spark.createDataFrame(
        [(0, 2), (1, 1), (2, 1), (3, 1)], "id bigint, b int"
    )
    m = b_suitor_matching(g, b=caps)
    assert m.count() == 2


def test_dyn_katz_warm_start_matches(spark):
    from linkgraph.algs.centrality import katz_centrality

    base = [(0, 1), (1, 2), (2, 3)]
    g0 = make_graph(spark, base)
    x0 = katz_centrality(g0, alpha=0.05)
    g1 = make_graph(spark, base + [(0, 3)])
    warm = collect_map(
        katz_centrality(g1, alpha=0.05, warm_start=x0), "id", "score"
    )
    cold = collect_map(katz_centrality(g1, alpha=0.05), "id", "score")
    for k in cold:
        assert warm[k] == pytest.approx(cold[k], abs=1e-7)


def test_edge_switching_preserves_degrees(spark, karate):
    from linkgraph.algs.sparsification import edge_switching

    before = collect_map(karate.degrees(), "id", "degree")
    g2 = edge_switching(karate, rounds=6, seed=11)
    after = collect_map(g2.degrees(), "id", "degree")
    assert before == after
    assert g2.num_edges() == karate.num_edges()
    # the chain actually moved (some switch accepted over 6 rounds)
    e1 = sorted(map(tuple, karate.to_undirected().edges.select("src", "dst").collect()))
    e2 = sorted(map(tuple, g2.edges.select("src", "dst").collect()))
    assert e1 != e2
    # deterministic
    g3 = edge_switching(karate, rounds=6, seed=11)
    e3 = sorted(map(tuple, g3.edges.select("src", "dst").collect()))
    assert e2 == e3


# --------------------------------------------------------------------------
# bridges / 2-edge-connected components
# --------------------------------------------------------------------------

def test_bridges_path_all(spark, path_5):
    from linkgraph.algs.bridges import bridges

    got = sorted(map(tuple, bridges(path_5).collect()))
    assert got == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_bridges_cycle_none(spark, cycle_6):
    from linkgraph.algs.bridges import bridges

    assert bridges(cycle_6).count() == 0


def test_bridges_two_triangles(spark, two_triangles_bridge):
    from linkgraph.algs.bridges import bridges, two_edge_connected_components

    got = sorted(map(tuple, bridges(two_triangles_bridge).collect()))
    assert got == [(2, 3)]
    tcc = {r["id"]: r["component"]
           for r in two_edge_connected_components(two_triangles_bridge).collect()}
    assert tcc[0] == tcc[1] == tcc[2]
    assert tcc[3] == tcc[4] == tcc[5]
    assert tcc[0] != tcc[3]


def test_bridges_vs_networkx_karate(spark, karate):
    nx = pytest.importorskip("networkx")
    from linkgraph.algs.bridges import bridges
    from linkgraph.nxadapter import to_networkx

    got = sorted(map(tuple, bridges(karate).collect()))
    want = sorted(tuple(sorted(e)) for e in nx.bridges(to_networkx(karate)))
    assert got == want


def test_bridges_disconnected(spark, two_components):
    from linkgraph.algs.bridges import bridges
    from linkgraph.nxadapter import to_networkx

    nx = pytest.importorskip("networkx")
    got = sorted(map(tuple, bridges(two_components).collect()))
    want = sorted(tuple(sorted(e)) for e in nx.bridges(to_networkx(two_components)))
    assert got == want


def test_dyn_harmonic_closeness_matches(spark):
    from linkgraph.algs.bfs import (
        dyn_harmonic_closeness,
        harmonic_closeness_sampled,
        multi_source_bfs,
    )

    base = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g0 = make_graph(spark, base)
    # full-pivot state (deterministic sample = all nodes)
    sources = sorted(collect_map(g0.nodes(), "id", "id"))
    state = multi_source_bfs(g0, sources)
    add = spark.createDataFrame([(0, 4)], "src bigint, dst bigint")
    g1 = make_graph(spark, base + [(0, 4)])
    _, got = dyn_harmonic_closeness(g1, state, add)
    want = harmonic_closeness_sampled(g1, n_samples=5)
    gm = collect_map(got, "id", "score")
    wm = collect_map(want, "id", "score")
    for kk in wm:
        assert gm[kk] == pytest.approx(wm[kk], rel=1e-9)


def test_group_degree_star_plus(spark):
    from linkgraph.algs.bfs import group_degree

    # hub 0 covers 1..4; vertex 5 covers 6,7 — greedy picks 0 then 5
    g = make_graph(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (5, 7)])
    got = sorted(r["id"] for r in group_degree(g, k=2).collect())
    assert got == [0, 5]


def test_group_degree_vs_bruteforce(spark, karate):
    from itertools import combinations

    nx = pytest.importorskip("networkx")
    from linkgraph.algs.bfs import group_degree
    from linkgraph.nxadapter import to_networkx

    g = to_networkx(karate)
    got = sorted(r["id"] for r in group_degree(karate, k=2).collect())

    def coverage(S):
        cov = set(S)
        for v in S:
            cov |= set(g.neighbors(v))
        return len(cov - set(S))

    best = max(coverage(c) for c in combinations(g.nodes(), 2))
    # greedy guarantee: ≥ (1 − 1/e) of the optimal coverage
    assert coverage(got) >= (1 - 1 / 2.718281828) * best
