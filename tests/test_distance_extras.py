"""AlgebraicDistance + CommuteTimeDistance parity tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from linkgraph.algs.bfs import algebraic_distance
from linkgraph.algs.electrical import commute_time_distance, effective_resistance
from tests.conftest import make_graph


def test_algebraic_distance_bottleneck(spark):
    """Bridge edge between two K4s must score larger algebraic distance
    than every intra-clique edge."""
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    g = make_graph(spark, edges)
    d = {(r["src"], r["dst"]): r["dist"] for r in algebraic_distance(g).collect()}
    bridge = d[(3, 4)]
    intra = [v for k, v in d.items() if k != (3, 4)]
    assert bridge > max(intra)


def test_algebraic_distance_deterministic(two_triangles_bridge):
    a = {(r["src"], r["dst"]): r["dist"]
         for r in algebraic_distance(two_triangles_bridge, n_iters=8).collect()}
    b = {(r["src"], r["dst"]): r["dist"]
         for r in algebraic_distance(two_triangles_bridge, n_iters=8).collect()}
    for k in a:
        assert np.isclose(a[k], b[k], rtol=1e-9)


def test_commute_time_path(spark):
    """On a path, R_eff(u,v) = hops(u,v) so C(u,v) = 2m·hops."""
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    c = commute_time_distance(g, 0, 3, tol=1e-10)
    # 2W = 6 (3 unit edges, both directions), r_eff = 3
    assert abs(c - 18.0) < 1e-6
    r = effective_resistance(g, 0, 3, tol=1e-10)
    assert abs(c - 6.0 * r) < 1e-9


def test_jaccard_distance_exact(spark):
    """Triangle + pendant: hand-computed neighbor Jaccard per edge."""
    from linkgraph.algs.bfs import jaccard_distance

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    d = {(r["src"], r["dst"]): r["dist"] for r in jaccard_distance(g).collect()}
    # N(0)={1,2}, N(1)={0,2}: common={2}, union={0,1,2} -> J=1/3
    assert abs(d[(0, 1)] - (1 - 1 / 3)) < 1e-9
    # N(2)={0,1,3}, N(3)={2}: common={}, union size 4 -> dist 1
    assert abs(d[(2, 3)] - 1.0) < 1e-9


def test_powerlaw_degree_sequence(spark):
    from linkgraph.generators import powerlaw_degree_sequence

    seq = powerlaw_degree_sequence(spark, 2000, gamma=2.5, min_deg=1, max_deg=100)
    rows = seq.collect()
    assert len(rows) == 2000
    degs = [r["degree"] for r in rows]
    assert min(degs) >= 1 and max(degs) <= 100
    # heavy head: min degree dominates; some heavy tail exists
    frac_min = sum(1 for d in degs if d == 1) / len(degs)
    assert frac_min > 0.4
    assert max(degs) > 10
    # deterministic
    again = [r["degree"] for r in powerlaw_degree_sequence(
        spark, 2000, gamma=2.5, min_deg=1, max_deg=100).collect()]
    assert sorted(again) == sorted(degs)


def test_diameter_exact_vs_networkx(spark):
    import networkx as nx
    import random

    from linkgraph.algs.bfs import diameter_exact, diameter_lower_bound
    from tests.conftest import make_graph

    cases = {
        "path": [(i, i + 1) for i in range(9)],
        "cycle": [(i, (i + 1) % 11) for i in range(11)],
        "star": [(0, i) for i in range(1, 9)],
    }
    for seed in (21, 22, 23):
        rng = random.Random(seed)
        edges = {(i, i + 1) for i in range(13)}
        for _ in range(12):
            u, v = rng.randrange(14), rng.randrange(14)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        cases[f"rand{seed}"] = sorted(edges)
    for name, edges in cases.items():
        g = make_graph(spark, edges)
        want = nx.diameter(nx.Graph(edges))
        got = diameter_exact(g)
        assert got == want, (name, got, want)
        # the double-sweep estimate must lower-bound the exact value
        assert diameter_lower_bound(g) <= want, name


def test_diameter_range_brackets_exact(spark):
    import networkx as nx
    import random

    from linkgraph.algs.bfs import diameter_range
    from tests.conftest import make_graph

    for seed in (31, 32):
        rng = random.Random(seed)
        edges = {(i, i + 1) for i in range(17)}
        for _ in range(10):
            u, v = rng.randrange(18), rng.randrange(18)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        g = make_graph(spark, sorted(edges))
        want = nx.diameter(nx.Graph(sorted(edges)))
        for err in (0.0, 0.25, 1.0):
            lb, ub = diameter_range(g, error=err)
            assert lb <= want <= ub, (seed, err, lb, want, ub)
            assert ub - lb <= err * lb + 1e-9, (seed, err, lb, ub)
        lb0, ub0 = diameter_range(g, error=0.0)
        assert lb0 == ub0 == want, (seed, lb0, ub0, want)
