"""Luby maximal independent set — invariants + determinism.

Luby's algorithm is randomized in the reference (independentset/Luby.cpp);
the engine's seeded-hash variant is deterministic, so the oracle here is
the MIS contract itself: independence (no edge inside the set) and
maximality (every outside vertex has a set neighbor), checked on fixed and
random graphs, plus parallelism-stable determinism and the portable-mode
identity the DuckDB gate replays.
"""

import random

from conftest import make_graph

from pyspark.sql import functions as F

from linkgraph.algs.independentset import luby_independent_set, luby_rounds_fixed


def _check_mis(g, res):
    mis = {r.id for r in res.where(F.col("in_mis") == 1).collect()}
    allv = {r.id for r in res.collect()}
    edges = {
        (r.src, r.dst)
        for r in g.symmetric_edges().where(F.col("src") != F.col("dst")).collect()
    }
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    # independence
    for a, b in edges:
        assert not (a in mis and b in mis), f"edge ({a},{b}) inside MIS"
    # maximality
    for v in allv - mis:
        assert nbrs.get(v, set()) & mis, f"vertex {v} addable — not maximal"
    return mis


def test_luby_triangle(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (2, 0)])
    res = luby_independent_set(g)
    mis = _check_mis(g, res)
    assert len(mis) == 1  # any MIS of a triangle is a single vertex


def test_luby_star(spark):
    # star: MIS is either the hub alone or all leaves
    g = make_graph(spark, [(0, i) for i in range(1, 8)])
    mis = _check_mis(g, luby_independent_set(g))
    assert mis == {0} or mis == set(range(1, 8))


def test_luby_karate(karate):
    res = luby_independent_set(karate)
    _check_mis(karate, res)
    # covers every vertex exactly once
    assert res.count() == 34
    assert res.select("id").distinct().count() == 34


def test_luby_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.12
        ] or [(0, 1)]
        g = make_graph(spark, edges)
        _check_mis(g, luby_independent_set(g, seed=trial))


def test_luby_deterministic(karate):
    a = {(r.id, r.in_mis) for r in luby_independent_set(karate, seed=9).collect()}
    b = {(r.id, r.in_mis) for r in luby_independent_set(karate, seed=9).collect()}
    assert a == b


def test_luby_portable_matches_fixed_replay(karate):
    # portable mode is a valid MIS too, and the fixed-round gate entry
    # agrees with the run-to-completion loop when rounds suffice
    res = luby_rounds_fixed(karate, rounds=8, seed=42, portable=True)
    _check_mis(karate, res)
    assert res.where(F.col("undecided") == 1).count() == 0
    full = luby_independent_set(karate, seed=42, portable=True)
    assert {(r.id, r.in_mis) for r in res.select("id", "in_mis").collect()} == {
        (r.id, r.in_mis) for r in full.collect()
    }


def test_luby_isolated_and_selfloop(spark):
    # self-loop vertex stays eligible; isolated-in-sym vertices join
    g = make_graph(spark, [(0, 0), (1, 2)])
    res = luby_independent_set(g)
    mis = {r.id for r in res.where(F.col("in_mis") == 1).collect()}
    assert 0 in mis
    assert len(mis & {1, 2}) == 1
