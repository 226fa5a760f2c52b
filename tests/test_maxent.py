"""MaxentStress parity tests — numpy replica of the exact iteration
(portable-hash init and anchor draws) + stress-descent property."""

from __future__ import annotations

import hashlib

import networkx as nx
import numpy as np

from linkgraph.algs.maxent import edge_stress, maxent_stress
from tests.conftest import make_graph

EPS = 1e-9


def _phash(*parts) -> int:
    s = ":".join(str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _numpy_maxent(edges, n, dims, iters, alpha, q, n_anchors, seed):
    sym = {}
    for u, v in edges:
        if u != v:
            sym[(u, v)] = 1.0
            sym[(v, u)] = 1.0
    X = np.array(
        [
            [(_phash(i, seed, c) % 1_000_000) / 1_000_000.0 for c in range(dims)]
            for i in range(n)
        ]
    )
    # anchor pool = edge-endpoint ids only (Graph.nodes() is edge-derived,
    # so isolated vertices never enter the Spark-side anchor draw)
    ids = sorted({u for e in edges for u in e})
    for it in range(iters):
        anchors = sorted(ids, key=lambda i: (_phash(i, seed, 1000 + it), i))[
            :n_anchors
        ]
        newX = X.copy()
        for u in ids:
            neigh = [(v, d) for (a, v), d in sym.items() if a == u]
            # note: attraction groups by dst=u over edges (src=v, dst=u)
            inc = [(v, d) for (v, a), d in sym.items() if a == u]
            if not inc:
                continue
            wsum = sum(d for _, d in inc)
            s = np.zeros(dims)
            for v, d in inc:
                diff = X[u] - X[v]
                nrm = max(np.sqrt((diff**2).sum()), EPS)
                s += d * (X[v] + d * diff / nrm)
            r = np.zeros(dims)
            for a in anchors:
                if a == u:
                    continue
                diff = X[u] - X[a]
                nrm = max(np.sqrt((diff**2).sum()), EPS)
                r += diff / nrm**q
            newX[u] = (s + alpha * r) / wsum
        X = newX
    return X


def test_maxent_numpy_parity(spark):
    nxg = nx.gnp_random_graph(18, 0.18, seed=4)
    n = nxg.number_of_nodes()
    g = make_graph(spark, list(nxg.edges()))
    got = maxent_stress(g, dims=2, iters=12, alpha=0.02, n_anchors=5, seed=7)
    want = _numpy_maxent(list(nxg.edges()), n, 2, 12, 0.02, 2.0, 5, 7)
    rows = {r["id"]: (r["x0"], r["x1"]) for r in got.collect()}
    for i in sorted(nxg.nodes()):
        if i not in rows:
            continue
        assert abs(rows[i][0] - want[i][0]) < 1e-6, (i, rows[i], want[i])
        assert abs(rows[i][1] - want[i][1]) < 1e-6, (i, rows[i], want[i])


def test_maxent_reduces_stress(spark):
    nxg = nx.cycle_graph(24)
    g = make_graph(spark, list(nxg.edges()))
    from linkgraph.algs.maxent import _init_positions

    before = edge_stress(g, _init_positions(g.nodes().select("id"), 2, 42))
    pos = maxent_stress(g, dims=2, iters=25, alpha=0.005, seed=42)
    after = edge_stress(g, pos)
    assert after < 0.5 * before, (before, after)
    # maxent term prevents collapse: layout keeps nonzero spread
    import pyspark.sql.functions as F

    spread = pos.agg(
        (F.max("x0") - F.min("x0")) + (F.max("x1") - F.min("x1"))
    ).collect()[0][0]
    assert spread > 0.1, spread
