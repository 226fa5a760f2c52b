"""Regression tests for the round-2 ADVICE findings.

Each test pins the exact failure mode the driver review described:
A* landmark admissibility under sub-unit weights, push-relabel
termination certification, cover-reader blank-line shift, Kadabra
batch_size=1 division, and streaming staging-dir cleanup.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from linkgraph.graph import Graph
from tests.conftest import make_graph


def test_astar_subunit_weights(spark):
    # ADVICE(high): direct s-t edge w=1.0 vs path s-a-b-t of 0.1 hops.
    # Hop-count landmark potentials overestimate and prune the cheap
    # path; weighted landmark distances must return 0.3, not 1.0.
    from linkgraph.algs.bfs import astar_landmarks

    rows = [(0, 3, 1.0), (0, 1, 0.1), (1, 2, 0.1), (2, 3, 0.1)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=False, weighted=True)
    for k in (1, 2, 4):
        assert abs(astar_landmarks(g, 0, 3, n_landmarks=k) - 0.3) < 1e-9


def test_astar_subunit_weights_random(spark):
    # random weighted graph with weights in (0.05, 2.0): A* == SSSP
    import random

    from linkgraph.algs.bfs import astar_landmarks, sssp

    rng = random.Random(7)
    rows = []
    n = 24
    for u in range(n):
        for _ in range(3):
            v = rng.randrange(n)
            if v != u:
                rows.append((u, v, round(rng.uniform(0.05, 2.0), 3)))
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=False, weighted=True)
    full = {r["id"]: r["dist"] for r in sssp(g, 0).collect()}
    for t in sorted(full)[-3:]:
        assert abs(astar_landmarks(g, 0, t, n_landmarks=3) - full[t]) < 1e-9


def test_max_flow_certified_unreachable(spark):
    # the empty-active exit now runs a residual s→t reachability
    # certificate on EVERY call; re-pin the classic diamond value and a
    # networkx cross-check on a fresh seed through the new exit path
    import networkx as nx

    from linkgraph.algs.flow import max_flow

    rows = [
        (0, 1, 3.0), (0, 2, 2.0), (1, 2, 5.0), (1, 3, 2.0),
        (2, 4, 3.0), (3, 5, 2.0), (4, 5, 3.0), (3, 4, 1.0),
    ]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=True, weighted=True)
    value, flows = max_flow(g, 0, 5)
    G = nx.DiGraph()
    for u, v, c in rows:
        G.add_edge(u, v, capacity=c)
    assert abs(value - nx.maximum_flow_value(G, 0, 5)) < 1e-9
    # certificate holds: no residual augmenting path remains
    from linkgraph.algs.flow import _residual_of

    res = _residual_of(flows)
    reach = {0}
    arcs = [(r["u"], r["v"]) for r in res.collect()]
    changed = True
    while changed:
        changed = False
        for u, v in arcs:
            if u in reach and v not in reach:
                reach.add(v)
                changed = True
    assert 5 not in reach


def test_cover_reader_blank_line(spark, tmp_path):
    # ADVICE(low): a node in no subset (blank line) must not shift ids
    from linkgraph.io import read_cover

    f = tmp_path / "c.cover"
    f.write_text("0 1\n\n1\n")
    cov = read_cover(spark, str(f))
    got = {(r.id, r.label) for r in cov.collect()}
    assert got == {(0, 0), (0, 1), (2, 1)}


def test_kadabra_batch_size_one(spark):
    # ADVICE(low): samples=1 in the first adaptive check divided by zero
    from linkgraph.algs.kadabra import kadabra_betweenness

    g = make_graph(spark, [(0, 1), (1, 2), (2, 3)])
    out = kadabra_betweenness(g, epsilon=0.5, batch_size=1, max_batches=2).collect()
    assert len(out) == 4


def test_streaming_staging_cleanup(spark, tmp_path):
    # ADVICE(low): staging dirs must not accumulate across micro-batches
    from linkgraph.streaming.deltas import stream_apply_deltas

    ddir = tmp_path / "deltas"
    ddir.mkdir()
    (ddir / "b1.json").write_text(
        json.dumps({"op": "add_edge", "src": 1, "dst": 2, "weight": 1.0, "ts": "2026-01-01T00:00:00"})
        + "\n"
        + json.dumps({"op": "add_edge", "src": 2, "dst": 3, "weight": 1.0, "ts": "2026-01-01T00:01:00"})
    )
    (ddir / "b2.json").write_text(
        json.dumps({"op": "remove_edge", "src": 1, "dst": 2, "weight": 0.0, "ts": "2026-01-01T00:02:00"})
    )
    q = stream_apply_deltas(
        spark, str(ddir), str(tmp_path / "table"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = {(r.src, r.dst) for r in spark.read.parquet(str(tmp_path / "table")).collect()}
    assert out == {(2, 3)}
    leftovers = [
        p.name
        for p in tmp_path.iterdir()
        if "._staging_" in p.name or "._retired_" in p.name
    ]
    assert leftovers == []
