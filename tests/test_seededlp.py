"""Seeded label propagation — first-arrival semantics + determinism."""

from conftest import make_graph

from pyspark.sql import functions as F

from linkgraph.algs.seededlp import seeded_label_propagation


def _seeds(spark, pairs):
    return spark.createDataFrame(pairs, "id bigint, label bigint")


def test_two_seed_path_split(spark):
    g = make_graph(spark, [(i, i + 1) for i in range(4)])  # path 0..4
    out = seeded_label_propagation(g, _seeds(spark, [(0, 100), (4, 200)]))
    lab = {r.id: r.label for r in out.collect()}
    assert lab[0] == 100 and lab[4] == 200  # seeds clamped
    assert lab[1] == 100 and lab[3] == 200  # nearest seed wins
    assert lab[2] in (100, 200)  # equidistant: deterministic hash tie
    again = {r.id: r.label for r in
             seeded_label_propagation(g, _seeds(spark, [(0, 100), (4, 200)])).collect()}
    assert lab == again


def test_weight_majority_at_arrival(spark):
    # 3 reaches {1 (w=5, label A), 2 (w=1, label B)} in the same round
    g = make_graph(
        spark, [(1, 3, 5.0), (2, 3, 1.0)], weighted=True
    )
    seeds = _seeds(spark, [(1, 7), (2, 8)])
    lab = {r.id: r.label for r in seeded_label_propagation(g, seeds).collect()}
    assert lab[3] == 7  # heavier labeled neighbor wins


def test_unreachable_stays_null(spark):
    g = make_graph(spark, [(0, 1), (5, 6)])
    lab = {r.id: r.label for r in
           seeded_label_propagation(g, _seeds(spark, [(0, 42)])).collect()}
    assert lab[0] == 42 and lab[1] == 42
    assert lab[5] is None and lab[6] is None


def test_monotone_no_flip(spark):
    # star center first labeled from the heavy seed; later rounds cannot
    # re-vote it even though more B-labeled leaves appear afterwards
    edges = [(0, 1, 9.0)] + [(0, i, 1.0) for i in range(2, 6)] + [
        (i, i + 10, 1.0) for i in range(2, 6)
    ]
    g = make_graph(spark, edges, weighted=True)
    seeds = _seeds(spark, [(1, 111)] + [(i + 10, 222) for i in range(2, 6)])
    lab = {r.id: r.label for r in seeded_label_propagation(g, seeds).collect()}
    assert lab[0] == 111  # arrived round 1 via the heavy edge, locked
    assert all(lab[i] == 222 for i in range(2, 6))  # leaves labeled by 222


def test_portable_mode_valid(karate, spark):
    seeds = _seeds(spark, [(0, 1), (33, 2)])
    a = {r.id: r.label for r in
         seeded_label_propagation(karate, seeds, portable=True).collect()}
    assert a[0] == 1 and a[33] == 2
    assert all(v in (1, 2) for v in a.values())  # karate is connected
