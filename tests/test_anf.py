"""ANF sketches and the profile battery."""

from linkgraph.algs.anf import (
    effective_diameter,
    neighborhood_function,
    per_vertex_neighborhood_size,
)
from linkgraph.profiling import profile, profile_markdown


def test_neighborhood_function_monotone(path_5):
    nf = neighborhood_function(path_5, max_h=8, registers=16)
    vals = [v for _, v in nf]
    assert all(b >= a * 0.999 for a, b in zip(vals, vals[1:]))
    # N(4) covers all 25 pairs; FM with 16 registers is rough — sanity band
    assert 10 <= vals[-1] <= 60


def test_effective_diameter_path(path_5):
    ed = effective_diameter(path_5, ratio=0.9, registers=16)
    assert 2.0 <= ed <= 4.5  # true diameter 4; estimate must be in range


def test_effective_diameter_clique(complete_k4):
    ed = effective_diameter(complete_k4, ratio=0.9, registers=16)
    assert ed <= 1.5  # one hop reaches everyone


def test_per_vertex_neighborhood(cycle_6):
    est = {r.id: r.est for r in per_vertex_neighborhood_size(cycle_6, 1, registers=16).collect()}
    # 1-hop ball of a 6-cycle has 3 vertices; FM noise band
    assert all(1.5 <= v <= 7 for v in est.values())


def test_profile_battery(two_triangles_bridge):
    p = profile(two_triangles_bridge, max_iter=20)
    assert p["nodes"] == 6 and p["edges"] == 7
    assert p["n_components"] == 1
    assert p["plp_communities"] == 2
    assert p["plp_modularity"] > 0.3
    md = profile_markdown(p)
    assert "# Graph profile" in md and "pagerank" in md
