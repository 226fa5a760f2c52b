"""Sketch operators: FM distinct bands + exact merge identities,
count-min one-sided bounds + merge ≡ concatenation."""

from pyspark.sql import functions as F

from linkgraph.sketches import (
    cms_merge,
    cms_query,
    count_min_sketch,
    fm_distinct,
    fm_merge,
    fm_sketch,
)


def _vals(spark, xs, col="v"):
    return spark.createDataFrame([(x,) for x in xs], f"{col} string")


def test_fm_distinct_band(spark):
    df = _vals(spark, [f"x{i}" for i in range(1000)] * 3)  # 1000 distinct
    est = fm_distinct(fm_sketch(df, "v", registers=32)).collect()[0]["est"]
    assert 400 < est < 2500  # FM band at R=32


def test_fm_grouped_and_duplicates_invariant(spark):
    rows = [("a", f"u{i}") for i in range(100)] + [("b", "u0")] * 50
    df = spark.createDataFrame(rows, "g string, v string")
    sk = fm_sketch(df, "v", ["g"])
    est = {r.g: r.est for r in fm_distinct(sk).collect()}
    assert est["b"] < 4  # 1 distinct value, duplicates don't inflate
    assert 30 < est["a"] < 400
    # duplicate rows leave the sketch bit-identical
    sk2 = fm_sketch(df.unionAll(df), "v", ["g"])
    a = {(r.g, r.r): r.bits for r in sk.collect()}
    b = {(r.g, r.r): r.bits for r in sk2.collect()}
    assert a == b


def test_fm_merge_equals_whole(spark):
    xs = [f"k{i}" for i in range(500)]
    whole = fm_sketch(_vals(spark, xs), "v")
    left = fm_sketch(_vals(spark, xs[:300]), "v")
    right = fm_sketch(_vals(spark, xs[200:]), "v")  # overlapping halves
    merged = fm_merge(left, right)
    a = {r.r: r.bits for r in whole.collect()}
    b = {r.r: r.bits for r in merged.collect()}
    assert a == b  # bit_or is exactly associative/idempotent


def test_cms_upper_bound_and_small_exactness(spark):
    xs = ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + [f"noise{i}" for i in range(40)]
    df = _vals(spark, xs)
    sk = count_min_sketch(df, "v", depth=4, width=256)
    q = cms_query(sk, _vals(spark, ["a", "b", "c", "zzz"]), "v", width=256)
    got = {r.v: r.est for r in q.collect()}
    true = {"a": 7, "b": 3, "c": 1, "zzz": 0}
    for k, t in true.items():
        assert got[k] >= t  # one-sided error
        assert got[k] <= t + 51  # total mass bound
    # at width 256 / 51 items, collisions are unlikely: exact for a
    assert got["a"] == 7


def test_cms_merge_equals_concat(spark):
    a = _vals(spark, ["x"] * 5 + ["y"] * 2)
    b = _vals(spark, ["x"] * 4 + ["z"] * 3)
    sk = cms_merge(
        count_min_sketch(a, "v", depth=3, width=64),
        count_min_sketch(b, "v", depth=3, width=64),
        width=64,
    )
    whole = count_min_sketch(a.unionAll(b), "v", depth=3, width=64)
    ca = {r.d: list(r.cells) for r in sk.collect()}
    cb = {r.d: list(r.cells) for r in whole.collect()}
    assert ca == cb


def test_portable_mode_deterministic(spark):
    df = _vals(spark, [f"x{i}" for i in range(50)])
    a = {r.r: r.bits for r in fm_sketch(df, "v", portable=True).collect()}
    b = {r.r: r.bits for r in fm_sketch(df.repartition(9), "v", portable=True).collect()}
    assert a == b
