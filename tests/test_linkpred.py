"""Link-prediction indices vs hand-computed neighborhood overlaps."""

import math

from conftest import make_graph

from linkgraph.algs.linkpred import (
    adamic_adar,
    common_neighbors,
    jaccard_index,
    missing_links,
    preferential_attachment,
    resource_allocation,
)


def pair_map(df):
    return {(r.u, r.v): r.score for r in df.collect()}


def test_common_neighbors_k4(complete_k4):
    cn = pair_map(common_neighbors(complete_k4))
    # every pair in K4 shares the other 2 vertices
    assert all(v == 2.0 for v in cn.values()) and len(cn) == 6


def test_common_neighbors_path(path_5):
    cn = pair_map(common_neighbors(path_5))
    assert cn == {(0, 2): 1.0, (1, 3): 1.0, (2, 4): 1.0}


def test_adamic_adar_values(path_5):
    aa = pair_map(adamic_adar(path_5))
    # common neighbor of (0,2) is 1 with degree 2 → 1/ln 2
    assert abs(aa[(0, 2)] - 1 / math.log(2)) < 1e-12


def test_resource_allocation(path_5):
    ra = pair_map(resource_allocation(path_5))
    assert abs(ra[(0, 2)] - 0.5) < 1e-12


def test_jaccard(two_triangles_bridge):
    j = pair_map(jaccard_index(two_triangles_bridge))
    # Γ(0)={1,2}, Γ(1)={0,2} → cn={2}, union={0,1,2} → 1/3
    assert abs(j[(0, 1)] - 1 / 3) < 1e-12


def test_preferential_attachment(path_5):
    pa = pair_map(preferential_attachment(path_5))
    assert pa[(0, 2)] == 1.0 * 2.0


def test_missing_links_excludes_edges(complete_k4, path_5):
    # K4: every CN pair IS an edge → nothing missing
    assert missing_links(complete_k4, common_neighbors(complete_k4)).count() == 0
    # path: all three CN pairs are non-edges
    assert missing_links(path_5, common_neighbors(path_5)).count() == 3


def test_hub_cap_drops_superhub_wedges(spark, star_8):
    # the hub (deg 8) is every leaf pair's only common neighbor; capping
    # wedge degree below 8 removes all pairs
    assert common_neighbors(star_8).count() == 28
    assert common_neighbors(star_8, max_wedge_degree=7).count() == 0
