"""PrunedLandmarkLabeling parity tests — queries vs networkx distances,
pruning effectiveness, directed two-sided labels, k-capped hub mode."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.algs.labeling import pll_query, pruned_landmark_labeling
from tests.conftest import KARATE_EDGES, make_graph


def _all_pairs_df(spark, nodes):
    return spark.createDataFrame(
        [(u, v) for u in nodes for v in nodes if u != v], "u bigint, v bigint"
    )


def _query_map(fwd, bwd, pairs):
    return {
        (r["u"], r["v"]): r["dist"] for r in pll_query(fwd, bwd, pairs).collect()
    }


def test_pll_exact_undirected_random(spark):
    nxg = nx.gnp_random_graph(24, 0.12, seed=7)
    g = make_graph(spark, list(nxg.edges()))
    fwd, bwd = pruned_landmark_labeling(g, batch_size=5)
    got = _query_map(fwd, bwd, _all_pairs_df(spark, sorted(nxg.nodes())))
    truth = dict(nx.all_pairs_shortest_path_length(nxg))
    for u in nxg.nodes():
        for v in nxg.nodes():
            if u == v:
                continue
            want = truth[u].get(v)
            assert got.get((u, v)) == want, (u, v, got.get((u, v)), want)


def test_pll_exact_directed_random(spark):
    nxg = nx.gnp_random_graph(18, 0.15, seed=11, directed=True)
    g = make_graph(spark, list(nxg.edges()), directed=True)
    fwd, bwd = pruned_landmark_labeling(g, batch_size=4)
    got = _query_map(fwd, bwd, _all_pairs_df(spark, sorted(nxg.nodes())))
    truth = dict(nx.all_pairs_shortest_path_length(nxg))
    for u in nxg.nodes():
        for v in nxg.nodes():
            if u == v:
                continue
            want = truth[u].get(v)
            assert got.get((u, v)) == want, (u, v, got.get((u, v)), want)


def test_pll_pruning_shrinks_index(spark):
    """On karate (hub-heavy), pruned labels must be far below the
    unpruned n-BFS index (n rows per reachable pair = 34*34); the Akiba
    pruning is the whole point of the structure."""
    g = make_graph(spark, KARATE_EDGES)
    fwd, _ = pruned_landmark_labeling(g, batch_size=4)
    n_labels = fwd.count()
    assert n_labels < 34 * 34 / 2, n_labels
    # and queries stay exact
    nxg = nx.Graph(KARATE_EDGES)
    got = _query_map(fwd, fwd, _all_pairs_df(g.edges.sparkSession, [0, 5, 16, 26, 33]))
    truth = dict(nx.all_pairs_shortest_path_length(nxg))
    for (u, v), d in got.items():
        assert d == truth[u][v]


def test_pll_k_capped_upper_bound(spark):
    """Top-k hub mode: query >= true distance, exact when a shortest
    path crosses a hub, null allowed only for uncovered pairs."""
    nxg = nx.gnp_random_graph(30, 0.1, seed=3)
    g = make_graph(spark, list(nxg.edges()))
    fwd, bwd = pruned_landmark_labeling(g, k=6, batch_size=6)
    hubs = {r["hub"] for r in fwd.select("hub").distinct().collect()}
    assert len(hubs) == 6
    truth = dict(nx.all_pairs_shortest_path_length(nxg))
    got = _query_map(fwd, bwd, _all_pairs_df(spark, sorted(nxg.nodes())))
    for (u, v), d in got.items():
        want = truth[u].get(v)
        if d is None:
            continue
        assert want is not None and d >= want
        # exact through-hub bound: d equals min over hubs of the two legs
        best = min(
            (truth[u].get(h, 10**9) + truth[h].get(v, 10**9) for h in hubs),
            default=None,
        )
        assert d == best


def test_pll_disconnected_null(spark):
    g = make_graph(spark, [(0, 1), (2, 3)])
    fwd, bwd = pruned_landmark_labeling(g, batch_size=2)
    rows = pll_query(
        fwd, bwd, g.edges.sparkSession.createDataFrame([(0, 3)], "u bigint, v bigint")
    ).collect()
    assert rows[0]["dist"] is None


def test_pll_k_capped_multi_batch_pruning(spark):
    """k-capped AND multi-batch (batch_size < k): the prune path runs
    against earlier-batch labels, and the through-hub min must be
    unaffected (the min-rank-minimizer cover argument)."""
    nxg = nx.gnp_random_graph(26, 0.11, seed=9)
    g = make_graph(spark, list(nxg.edges()))
    fwd, bwd = pruned_landmark_labeling(g, k=6, batch_size=2)
    hubs = sorted({r["hub"] for r in fwd.select("hub").distinct().collect()})
    truth = dict(nx.all_pairs_shortest_path_length(nxg))
    got = _query_map(fwd, bwd, _all_pairs_df(spark, sorted(nxg.nodes())))
    for (u, v), d in got.items():
        best = min(
            (truth[u].get(h, 10**9) + truth[h].get(v, 10**9) for h in hubs),
            default=10**9,
        )
        want = best if best < 10**9 else None
        assert d == want, (u, v, d, want)
