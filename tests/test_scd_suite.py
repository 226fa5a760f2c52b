"""Seed-set community detectors (scd/ remainder) — recovery fixtures."""

from __future__ import annotations

from linkgraph.algs.scd import (
    clique_detect,
    combined_scd,
    conductance_of,
    gce,
    lfm_local,
    local_tightness_expansion,
    random_bfs_community,
    tce,
)
from tests.conftest import make_graph


def _two_k4_bridge(spark):
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    return make_graph(spark, edges)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_gce_recovers_clique(spark):
    g = _two_k4_bridge(spark)
    assert _ids(gce(g, [0])) == [0, 1, 2, 3]


def test_lfm_recovers_clique(spark):
    g = _two_k4_bridge(spark)
    assert _ids(lfm_local(g, [5])) == [4, 5, 6, 7]


def test_tightness_recovers_clique(spark):
    g = _two_k4_bridge(spark)
    out = _ids(local_tightness_expansion(g, [0]))
    assert set(out) >= {0, 1, 2} and 5 not in out and 6 not in out


def test_tce_recovers_clique(spark):
    g = _two_k4_bridge(spark)
    assert _ids(tce(g, [0])) == [0, 1, 2, 3]


def test_clique_detect(spark):
    g = _two_k4_bridge(spark)
    assert _ids(clique_detect(g, 0)) == [0, 1, 2, 3]
    # vertex 3 sits in K4 {0,1,2,3} and on the bridge; max clique is the K4
    assert _ids(clique_detect(g, 3)) == [0, 1, 2, 3]


def test_random_bfs_budget(spark):
    g = _two_k4_bridge(spark)
    out = _ids(random_bfs_community(g, 0, size=4))
    assert len(out) == 4 and 0 in out


def test_combined_picks_low_conductance(spark):
    g = _two_k4_bridge(spark)
    out = combined_scd(g, [0])
    phi = conductance_of(g, out)
    # the K4 side has conductance 1/13; nothing beats it from seed 0
    assert phi <= 1.0 / 12.0 + 1e-9
    assert set(_ids(out)) == {0, 1, 2, 3}
