"""LouvainMapEquation tests — code-length oracle in numpy + structure."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from linkgraph.algs.infomap import louvain_map_equation, map_equation
from linkgraph.graph import Graph
from tests.conftest import make_graph


def _np_map_equation(edges, labels):
    """Independent numpy two-level map equation (undirected, weights 1)."""
    import collections

    deg = collections.Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    two_w = sum(deg.values())
    comms = collections.defaultdict(set)
    for i, c in labels.items():
        comms[c].add(i)
    def plogp(x):
        return x * math.log2(x) if x > 0 else 0.0
    qs, terms = [], 0.0
    for c, members in comms.items():
        vol = sum(deg[i] for i in members)
        # exit rate: each cut edge contributes its weight ONCE per side's
        # community (random walker at i picks the edge with prob w/k_i,
        # weighted by p_i = k_i/2W -> q_c = w_cut(c)/2W, single count)
        cut = sum(1 for u, v in edges if (u in members) != (v in members))
        q = cut / two_w
        p = vol / two_w
        qs.append(q)
        terms += -2.0 * plogp(q) + plogp(q + p)
    qt = sum(qs)
    spi = sum(plogp(deg[i] / two_w) for i in deg)
    return plogp(qt) + terms - spi


def test_map_equation_matches_numpy(spark, karate):
    edges = [
        (r["src"], r["dst"])
        for r in karate.symmetric_edges().where(F.col("src") < F.col("dst")).collect()
    ]
    # arbitrary fixed partition: id mod 3
    lab_py = {i: i % 3 for i in {x for e in edges for x in e}}
    lab_df = spark.createDataFrame(
        list(lab_py.items()), "id bigint, label bigint"
    )
    ours = map_equation(karate, lab_df)
    ref = _np_map_equation(edges, lab_py)
    assert abs(ours - ref) < 1e-9


def test_two_cliques_split(spark):
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    g = make_graph(spark, edges)
    lab = {r["id"]: r["label"] for r in louvain_map_equation(g).collect()}
    assert len({lab[i] for i in range(4)}) == 1
    assert len({lab[i] for i in range(4, 8)}) == 1
    assert lab[0] != lab[7]


def test_beats_trivial_partitions_on_karate(spark, karate):
    lab_df = louvain_map_equation(karate)
    ours = map_equation(karate, lab_df)
    nodes = [r["id"] for r in karate.nodes().collect()]
    singleton = spark.createDataFrame(
        [(i, i) for i in nodes], "id bigint, label bigint"
    )
    one = spark.createDataFrame(
        [(i, 0) for i in nodes], "id bigint, label bigint"
    )
    assert ours < map_equation(karate, singleton)
    assert ours < map_equation(karate, one)


def test_deterministic_and_portable(two_triangles_bridge):
    a = louvain_map_equation(two_triangles_bridge)
    b = louvain_map_equation(two_triangles_bridge)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    p = louvain_map_equation(two_triangles_bridge, portable=True)
    labs = {r["id"]: r["label"] for r in p.collect()}
    assert labs[0] == labs[1] == labs[2]
    assert labs[3] == labs[4] == labs[5]
    assert labs[0] != labs[3]
