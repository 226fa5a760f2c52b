"""Triangle counting vs brute-force oracle; LCC/global cc exact values."""

import numpy as np
from conftest import KARATE_EDGES, collect_map
from oracles import triangles_brute

from linkgraph.algs.triangles import (
    avg_local_clustering_coefficient,
    global_clustering_coefficient,
    local_clustering_coefficient,
    per_edge_triangles,
    per_vertex_triangles,
    triangle_corners,
)


def test_triangles_k4(complete_k4):
    tri = collect_map(per_vertex_triangles(complete_k4), "id", "triangles")
    assert tri == {0: 3, 1: 3, 2: 3, 3: 3}
    assert triangle_corners(complete_k4).count() == 4


def test_triangles_cycle_zero(cycle_6):
    tri = collect_map(per_vertex_triangles(cycle_6), "id", "triangles")
    assert all(v == 0 for v in tri.values())


def test_triangles_star_zero(star_8):
    tri = collect_map(per_vertex_triangles(star_8), "id", "triangles")
    assert all(v == 0 for v in tri.values())


def test_triangles_karate_oracle(karate):
    tri = collect_map(per_vertex_triangles(karate), "id", "triangles")
    oracle = triangles_brute(KARATE_EDGES, list(range(34)))
    assert tri == oracle
    assert triangle_corners(karate).count() == 45  # known karate total


def test_triangles_two_triangles_bridge(two_triangles_bridge):
    tri = collect_map(per_vertex_triangles(two_triangles_bridge), "id", "triangles")
    assert tri == {i: 1 for i in range(6)}


def test_self_loop_excluded(self_loop):
    tri = collect_map(per_vertex_triangles(self_loop), "id", "triangles")
    assert tri[9] == 0
    assert tri[0] == tri[1] == tri[2] == 1


def test_per_edge_triangles_k4(complete_k4):
    et = per_edge_triangles(complete_k4).collect()
    assert len(et) == 6
    assert all(r.triangles == 2 for r in et)


def test_lcc_k4(complete_k4):
    lcc = collect_map(local_clustering_coefficient(complete_k4), "id", "lcc")
    assert np.allclose(list(lcc.values()), 1.0)


def test_lcc_karate_spot(karate):
    lcc = collect_map(local_clustering_coefficient(karate), "id", "lcc")
    oracle = triangles_brute(KARATE_EDGES, list(range(34)))
    # deg(0)=16, tri(0)=oracle[0]
    assert abs(lcc[0] - 2 * oracle[0] / (16 * 15)) < 1e-12


def test_global_cc(complete_k4, cycle_6):
    assert abs(global_clustering_coefficient(complete_k4) - 1.0) < 1e-12
    assert global_clustering_coefficient(cycle_6) == 0.0
    assert abs(avg_local_clustering_coefficient(complete_k4) - 1.0) < 1e-12
