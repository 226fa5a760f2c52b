"""Metamorphic properties (SURVEY §5.2.3): relabel-invariance, mass
conservation, nesting invariants — run on a few seeded random graphs."""

import numpy as np
from conftest import collect_map, make_graph
from pyspark.sql import functions as F

from linkgraph.algs.centrality import core_decomposition
from linkgraph.algs.components import connected_components
from linkgraph.algs.pagerank import pagerank
from linkgraph.algs.triangles import per_vertex_triangles
from linkgraph.generators import erdos_renyi
from linkgraph.graph import Graph


def _er(spark, seed, n=30, p=0.15):
    return Graph.from_edges(erdos_renyi(spark, n, p, seed=seed))


def test_pagerank_mass_conservation_random(spark):
    for seed in (1, 2, 3):
        g = _er(spark, seed)
        s = pagerank(g, tol=1e-10).agg(F.sum("rank")).collect()[0][0]
        assert abs(s - 1.0) < 1e-9, (seed, s)


def test_pagerank_relabel_invariance(spark):
    g = _er(spark, 5)
    perm = {i: (i * 7 + 3) % 97 for i in range(97)}  # injective on ids
    mapped = g.edges.select(
        F.udf(lambda x: perm[x], "bigint")("src").alias("src"),
        F.udf(lambda x: perm[x], "bigint")("dst").alias("dst"),
        "weight",
    )
    g2 = Graph.from_edges(mapped)
    a = collect_map(pagerank(g, tol=1e-10), "id", "rank")
    b = collect_map(pagerank(g2, tol=1e-10), "id", "rank")
    assert np.allclose(
        [a[i] for i in sorted(a)], [b[perm[i]] for i in sorted(a)], atol=1e-9
    )


def test_triangles_relabel_invariance(spark):
    g = _er(spark, 6)
    perm = {i: 1000 - i for i in range(1001)}
    mapped = g.edges.select(
        F.udf(lambda x: perm[x], "bigint")("src").alias("src"),
        F.udf(lambda x: perm[x], "bigint")("dst").alias("dst"),
        "weight",
    )
    a = collect_map(per_vertex_triangles(g), "id", "triangles")
    b = collect_map(per_vertex_triangles(Graph.from_edges(mapped)), "id", "triangles")
    assert all(b[perm[i]] == a[i] for i in a)


def test_symmetrize_idempotent(spark):
    g = _er(spark, 7)
    s1 = g.symmetric_edges()
    g2 = Graph(s1, directed=True)  # treat the symmetric table as stored edges
    s2 = g2.symmetric_edges()
    assert s1.count() == s2.count()


def test_kcore_nesting(spark):
    g = _er(spark, 8, n=40, p=0.2)
    cores = collect_map(core_decomposition(g), "id", "core")
    deg = collect_map(g.degrees(), "id", "degree")
    # core number never exceeds degree
    assert all(cores[i] <= deg[i] for i in cores)


def test_cc_labels_are_member_minima(spark):
    for seed in (11, 12):
        g = _er(spark, seed)
        cc = collect_map(connected_components(g), "id", "component")
        by_comp: dict = {}
        for node, comp in cc.items():
            by_comp.setdefault(comp, []).append(node)
        assert all(comp == min(members) for comp, members in by_comp.items())


def test_edge_switching_invariants_random(spark):
    from linkgraph.algs.sparsification import edge_switching

    for seed in (21, 22):
        g = _er(spark, seed, n=30, p=0.15)
        g2 = edge_switching(g, rounds=3, seed=seed)
        d1 = sorted(collect_map(g.degrees(), "id", "degree").items())
        d2 = sorted(collect_map(g2.degrees(), "id", "degree").items())
        assert d1 == d2
        # canonical, duplicate-free edge set
        e = [(r["src"], r["dst"]) for r in g2.edges.collect()]
        assert len(e) == len(set(e))
        assert all(u < v for u, v in e)


def test_lfr_degree_bounds(spark):
    from linkgraph.generators import lfr

    edges, _ = lfr(spark, n=200, mu=0.2, avg_degree=6, max_degree=20,
                   min_community=40, seed=9)
    from linkgraph.graph import Graph as _G

    degs = collect_map(_G.from_edges(edges).degrees(), "id", "degree")
    # stub-sampling + dedup keeps degrees in a sane envelope of the target
    assert max(degs.values()) <= 3 * 20
    assert sum(degs.values()) / len(degs) > 2
