"""Randomized cross-checks for the session's newest operators: seeded
random graphs, independent ground truth (networkx / full recompute)."""

from __future__ import annotations

import random

import networkx as nx
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from tests.conftest import make_graph


def _random_graph(seed, n=14, p=0.25):
    rng = random.Random(seed)
    edges = [
        (u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < p
    ]
    # ensure no isolated ids confuse fixtures: add a spanning chain
    edges += [(i, i + 1) for i in range(n - 1) if (i, i + 1) not in edges]
    return sorted(set(edges))


def test_dyn_betweenness_random_graphs(spark):
    from linkgraph.algs.betweenness import (
        betweenness,
        brandes_state,
        dyn_betweenness_additions,
        scores_from_state,
    )

    for seed in (1, 2, 3):
        edges = _random_graph(seed)
        g0 = make_graph(spark, edges)
        st = brandes_state(g0)
        rng = random.Random(100 + seed)
        existing = set(edges)
        adds = []
        while len(adds) < 2:
            u, v = rng.randrange(14), rng.randrange(14)
            if u != v and (min(u, v), max(u, v)) not in existing:
                adds.append((min(u, v), max(u, v)))
                existing.add((min(u, v), max(u, v)))
        extra = spark.createDataFrame(
            [(u, v, 1.0) for u, v in adds], "src bigint, dst bigint, weight double"
        )
        g1 = Graph.from_edges(g0.edges.unionByName(extra), directed=False)
        st1 = dyn_betweenness_additions(g1, st, adds)
        dyn = {r["id"]: r["score"] for r in scores_from_state(g1, st1).collect()}
        ful = {r["id"]: r["score"] for r in betweenness(g1).collect()}
        for k in ful:
            assert abs(dyn[k] - ful[k]) < 1e-9, (seed, k)


def test_p2p_random_graphs(spark):
    from linkgraph.algs.bfs import bfs, bidirectional_bfs, spsp

    for seed in (4, 5):
        edges = _random_graph(seed)
        g = make_graph(spark, edges)
        G = nx.Graph(edges)
        rng = random.Random(seed)
        for _ in range(3):
            s, t = rng.randrange(14), rng.randrange(14)
            want = (
                nx.shortest_path_length(G, s, t) if nx.has_path(G, s, t) else None
            )
            got = bidirectional_bfs(g, s, t)
            assert got == want, (seed, s, t, got, want)
            got_w = spsp(g, s, t)
            if want is None:
                assert got_w is None
            else:
                assert abs(got_w - want) < 1e-9


def test_map_equation_random_partitions(spark):
    """map_equation scalar vs the independent numpy formula on random
    graphs and random partitions."""
    from linkgraph.algs.infomap import map_equation
    from tests.test_infomap import _np_map_equation

    for seed in (6, 7):
        edges = _random_graph(seed)
        g = make_graph(spark, edges)
        rng = random.Random(seed)
        nodes = sorted({x for e in edges for x in e})
        lab_py = {i: rng.randrange(4) for i in nodes}
        lab_df = spark.createDataFrame(
            list(lab_py.items()), "id bigint, label bigint"
        )
        ours = map_equation(g, lab_df)
        ref = _np_map_equation(edges, lab_py)
        assert abs(ours - ref) < 1e-9, seed


def test_pivot_mds_svd_parity_random(spark):
    """PivotMDS vs numpy SVD on a random connected graph (same pivots)."""
    import numpy as np

    from linkgraph.algs.layout import pivot_mds

    edges = _random_graph(8)
    g = make_graph(spark, edges)
    out = pivot_mds(g, k=6, dims=1, iters=80, seed=9)
    xs = {r["id"]: r["x0"] for r in out.collect()}
    ids = sorted(xs)
    piv = [
        r["id"]
        for r in g.nodes().orderBy(F.xxhash64("id", F.lit(9)), F.asc("id"))
        .limit(6)
        .collect()
    ]
    G = nx.Graph(edges)
    D = np.array(
        [[nx.shortest_path_length(G, p, i) for i in ids] for p in piv],
        dtype=float,
    )
    D2 = D**2
    C = -0.5 * (
        D2
        - D2.mean(axis=1, keepdims=True)
        - D2.mean(axis=0, keepdims=True)
        + D2.mean()
    )
    _, s, vt = np.linalg.svd(C, full_matrices=False)
    ours = np.array([xs[i] for i in ids])
    ref = s[0] * vt[0]
    cos = abs(ours @ ref) / (np.linalg.norm(ours) * np.linalg.norm(ref))
    assert cos > 0.99, cos


def test_dyn_approx_betweenness_random_graphs(spark):
    """DynApproxBetweenness: repaired sampled state ≡ fresh sampled
    estimator of the post-addition graph (same n_samples/seed — the
    source set depends only on node set + seed, so scores must match to
    1e-9, and at least one source must survive un-recomputed so the dyn
    path is actually exercised)."""
    from linkgraph.algs.betweenness import (
        betweenness,
        dyn_approx_betweenness_additions,
        sampled_brandes_state,
        scores_from_sampled_state,
    )

    for seed in (11, 12, 13):
        edges = _random_graph(seed)
        g0 = make_graph(spark, edges)
        st = sampled_brandes_state(g0, n_samples=6, seed=seed)
        rng = random.Random(200 + seed)
        existing = set(edges)
        adds = []
        while len(adds) < 2:
            u, v = rng.randrange(14), rng.randrange(14)
            if u != v and (min(u, v), max(u, v)) not in existing:
                adds.append((min(u, v), max(u, v)))
                existing.add((min(u, v), max(u, v)))
        extra = spark.createDataFrame(
            [(u, v, 1.0) for u, v in adds], "src bigint, dst bigint, weight double"
        )
        g1 = Graph.from_edges(g0.edges.unionByName(extra), directed=False)
        st1 = dyn_approx_betweenness_additions(g1, st, adds)
        dyn = {
            r["id"]: r["score"]
            for r in scores_from_sampled_state(g1, st1).collect()
        }
        ful = {
            r["id"]: r["score"]
            for r in betweenness(g1, n_samples=6, seed=seed).collect()
        }
        assert set(dyn) == set(ful)
        for k in ful:
            assert abs(dyn[k] - ful[k]) < 1e-9, (seed, k, dyn[k], ful[k])


def test_global_curveball_invariants(spark):
    """Degree sequence EXACTLY preserved, edge count preserved, no
    self-loops/duplicates, deterministic, and the chain actually mixes."""
    from linkgraph.algs.sparsification import global_curveball

    for seed in (31, 32):
        edges = _random_graph(seed, n=20, p=0.3)
        g = make_graph(spark, edges)
        before = {
            r["id"]: r["degree"] for r in g.degrees().collect()
        }
        out = global_curveball(g, rounds=6, seed=seed)
        rows = [(r["src"], r["dst"]) for r in out.edges.collect()]
        assert len(rows) == len(edges)                     # |E| preserved
        assert len(set(rows)) == len(rows)                 # no duplicates
        assert all(s < d for s, d in rows)                 # canonical, no loops
        after = {r["id"]: r["degree"] for r in out.degrees().collect()}
        assert after == before                             # exact degrees
        # mixing: at least one edge moved
        assert set(rows) != set(edges)
        # determinism across partitioning
        again = sorted(
            (r["src"], r["dst"])
            for r in global_curveball(g, rounds=6, seed=seed).edges.collect()
        )
        assert sorted(rows) == again
