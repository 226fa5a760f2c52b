"""PathGrowingMatcher tests — matching validity, ½-approximation vs the
networkx optimum, hand-traced path case, determinism."""

from __future__ import annotations

import networkx as nx
import pytest

from linkgraph.algs.matching import path_growing_matching
from tests.conftest import KARATE_EDGES, make_graph


def _as_set(df):
    return {(r["u"], r["v"]) for r in df.collect()}


def _check_matching(pairs):
    seen = set()
    for u, v in pairs:
        assert u < v
        assert u not in seen and v not in seen, (u, v)
        seen.add(u)
        seen.add(v)


def test_path_growing_hand_case(spark):
    """Path 0-1-2-3 with weights 1,2,1: DH keeps the heavy middle edge
    (M1={1-2} w2 beats M2={2-3} w1)."""
    g = make_graph(
        spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)], weighted=True
    )
    m = _as_set(path_growing_matching(g))
    assert m == {(1, 2)}


def test_path_growing_validity_karate(spark, karate):
    m = path_growing_matching(karate)
    pairs = _as_set(m)
    _check_matching(pairs)
    edge_set = {tuple(sorted(e)) for e in KARATE_EDGES}
    assert pairs <= edge_set


@pytest.mark.parametrize("seed", [1, 5, 9])
def test_path_growing_half_approx_random(spark, seed):
    rng = nx.utils.create_random_state(seed)
    nxg = nx.gnp_random_graph(16, 0.25, seed=seed)
    for u, v in nxg.edges():
        nxg[u][v]["weight"] = round(1.0 + 9.0 * rng.rand(), 3)
    g = make_graph(
        spark,
        [(u, v, nxg[u][v]["weight"]) for u, v in nxg.edges()],
        weighted=True,
    )
    got = path_growing_matching(g)
    pairs = {(r["u"], r["v"]): r["weight"] for r in got.collect()}
    _check_matching(set(pairs))
    w_got = sum(pairs.values())
    opt = nx.max_weight_matching(nxg)
    w_opt = sum(nxg[u][v]["weight"] for u, v in opt)
    assert w_got >= 0.5 * w_opt - 1e-9, (w_got, w_opt)


def test_path_growing_deterministic(spark, karate):
    a = _as_set(path_growing_matching(karate))
    b = _as_set(path_growing_matching(karate))
    assert a == b
