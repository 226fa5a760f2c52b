"""Bow-tie decomposition tests — hand-built canonical bow-tie + randomized
networkx replays of Broder's taxonomy (core/in/out/tube/tendrils)."""

from __future__ import annotations

import pytest

from linkgraph.algs.bowtie import bowtie_decomposition, set_reachable
from linkgraph.graph import Graph


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-bowtie")


def _graph(spark, edges):
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src bigint, dst bigint, weight double"
    )
    return Graph(df, directed=True, weighted=False)


# Canonical bow-tie: core 0↔1↔2; IN chain 10→3→0; OUT chain 2→4→11;
# tube 3→5→4 (IN→OUT avoiding core); tendril-in 3→6; tendril-out 7→4;
# disconnected pair 8→9.
BOWTIE_EDGES = [
    (0, 1), (1, 2), (2, 0),          # core SCC
    (10, 3), (3, 0),                 # IN
    (2, 4), (4, 11),                 # OUT
    (3, 5), (5, 4),                  # tube
    (3, 6),                          # tendril hanging off IN
    (7, 4),                          # tendril feeding OUT
    (8, 9),                          # disconnected
]

EXPECT = {
    0: "core", 1: "core", 2: "core",
    3: "in", 10: "in",
    4: "out", 11: "out",
    5: "tube",
    6: "tendril_in",
    7: "tendril_out",
    8: "disconnected", 9: "disconnected",
}


def test_set_reachable(spark):
    g = _graph(spark, BOWTIE_EDGES)
    seeds = spark.createDataFrame([(10,)], "id bigint")
    got = {r.id for r in set_reachable(g.edges.select("src", "dst"), seeds).collect()}
    assert got == {10, 3, 0, 1, 2, 4, 11, 5, 6}


def test_bowtie_canonical(spark):
    got = {
        r.id: r.region
        for r in bowtie_decomposition(_graph(spark, BOWTIE_EDGES)).collect()
    }
    assert got == EXPECT


def _nx_bowtie(edges):
    """Independent reference: Broder taxonomy via networkx reachability."""
    import networkx as nx

    g = nx.DiGraph(edges)
    sccs = list(nx.strongly_connected_components(g))
    # engine tie-break: largest size, then smallest min-id component label
    core = max(sccs, key=lambda s: (len(s), -min(s)))
    fwd = set(core)
    for v in core:
        fwd |= nx.descendants(g, v)
    bwd = set(core)
    for v in core:
        bwd |= nx.ancestors(g, v)
    out_, in_ = fwd - core, bwd - core
    main = fwd | bwd
    f_in = set(in_)
    for v in in_:
        f_in |= nx.descendants(g, v)
    f_in -= main
    b_out = set(out_)
    for v in out_:
        b_out |= nx.ancestors(g, v)
    b_out -= main
    regions = {}
    for n in g.nodes:
        if n in core:
            regions[n] = "core"
        elif n in in_:
            regions[n] = "in"
        elif n in out_:
            regions[n] = "out"
        elif n in f_in and n in b_out:
            regions[n] = "tube"
        elif n in f_in:
            regions[n] = "tendril_in"
        elif n in b_out:
            regions[n] = "tendril_out"
        else:
            regions[n] = "disconnected"
    return regions


@pytest.mark.parametrize("seed", [1, 7])
def test_bowtie_random_vs_networkx(spark, seed):
    import random

    rng = random.Random(seed)
    n = 40
    edges = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(90)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r.id: r.region for r in bowtie_decomposition(_graph(spark, edges)).collect()
    }
    assert got == _nx_bowtie(edges)
