"""Exact quantiles vs numpy, plan shape, and degenerate cases."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.stats import exact_quantiles, grouped_exact_quantiles

QS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]


def _np_lower(xs, q):
    s = sorted(xs)
    return s[int(np.floor(q * (len(s) - 1)))]


def test_exact_quantiles_vs_numpy(spark):
    rng = random.Random(5)
    xs = [rng.randint(-1000, 1000) for _ in range(997)]  # odd n, dups likely
    df = spark.createDataFrame([(x,) for x in xs], "x bigint")
    got = {r.q: r.value for r in exact_quantiles(df, "x", QS).collect()}
    for q in QS:
        assert got[q] == _np_lower(xs, q), q


def test_exact_quantiles_duplicates_and_nulls(spark):
    df = spark.createDataFrame(
        [(v,) for v in [5, 5, 5, 1, None, 9, 5]], "x bigint"
    )
    got = {r.q: r.value for r in exact_quantiles(df, "x", [0.0, 0.5, 1.0]).collect()}
    assert got == {0.0: 1, 0.5: 5, 1.0: 9}  # nulls excluded, ties fine
    with pytest.raises(ValueError):
        exact_quantiles(df.where(F.col("x").isNull()), "x", [0.5])


def test_exact_quantiles_partition_invariant(spark):
    xs = list(range(500))
    df = spark.createDataFrame([(x,) for x in xs], "x bigint")
    a = sorted(map(tuple, exact_quantiles(df, "x", QS).collect()))
    b = sorted(map(tuple, exact_quantiles(df.repartition(13), "x", QS).collect()))
    assert a == b


def test_grouped_quantiles_vs_numpy(spark):
    rng = random.Random(9)
    rows = [(f"g{i % 3}", rng.randint(0, 99)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, x bigint")
    got = {
        (r.g, r.q): r.value
        for r in grouped_exact_quantiles(df, "x", [0.25, 0.5, 1.0], "g").collect()
    }
    for g in ("g0", "g1", "g2"):
        xs = [x for gg, x in rows if gg == g]
        for q in (0.25, 0.5, 1.0):
            assert got[(g, q)] == _np_lower(xs, q), (g, q)


def test_quantile_plan_no_single_partition(spark):
    from tests.test_sampling import _plan

    df = spark.createDataFrame([(x,) for x in range(100)], "x bigint")
    p = _plan(exact_quantiles(df, "x", [0.5]))
    assert "SinglePartition" not in p
    p2 = _plan(grouped_exact_quantiles(
        df.withColumn("g", F.col("x") % 3), "x", [0.5], "g"))
    assert "SinglePartition" not in p2
