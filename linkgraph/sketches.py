"""Relational sketch operators — approximate statistics over 100-TB-class
tables where exact aggregation is affordable but REPEATED / composable
statistics are not: mergeable per-group sketches you can store, union
across partitions/days, and query without rescanning the corpus.

Two classic sketches, both as pure JVM expressions (no UDFs), both with a
``portable=True`` mode whose md5 hash DuckDB computes identically, so the
gate replays them bit-for-bit:

- Flajolet–Martin distinct-count registers (the same machinery as
  algs/anf.py, lifted from per-vertex neighborhoods to arbitrary
  group-by cardinality estimation). Sketch state = R int64 registers per
  group; merge = ``bit_or``; estimate = 2^b̄/φ.
- Count-min frequency sketch (Cormode & Muthukrishnan 2005): a d×w
  counter matrix per group as d rows of w array cells; build = one
  explode + hash agg; merge = element-wise array sum; point query =
  min over d hashed cells. Heavy-hitter candidates come from an exact
  top-k pass over the same scan (count-min only BOUNDS counts; the
  candidate set is where the sketch's one-sided error actually bites,
  and the exact pass is one combinable agg).

Spark's built-ins (approx_count_distinct, count_min_sketch) cover the
one-shot cases; these operators exist for the pipeline shape — sketches
as STORED, mergeable columns with a cross-engine-replayable definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tz_hash(col, salt, portable: bool):
    """Trailing-zero count of the salted hash, capped at 62 (FM bit)."""
    if portable:
        from linkgraph.portable import phash

        h = phash(col, salt)
    else:
        h = F.xxhash64(col, salt)
    low = h.bitwiseAND(-h)
    return F.least(F.bit_count(low - 1), F.lit(62)).cast("int")


def fm_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    registers: int = 8,
    portable: bool = False,
) -> DataFrame:
    """(group…, r, bits) — per-group FM registers over ``value_col``.
    One explode over R registers + one ``bit_or`` hash agg (map-side
    combinable); sketches for different days/partitions union with
    another bit_or on the same key."""
    group_cols = list(group_cols or [])
    spark = df.sparkSession
    regs = F.broadcast(spark.range(int(registers)).withColumnRenamed("id", "r"))
    tzc = _tz_hash(F.col(value_col), F.col("r"), portable)
    return (
        df.select(*group_cols, value_col)
        .crossJoin(regs)
        .withColumn("tzc", tzc)
        .select(
            *group_cols,
            "r",
            F.expr("shiftleft(CAST(1 AS BIGINT), tzc)").alias("bits"),
        )
        .groupBy(*group_cols, "r")
        .agg(F.bit_or("bits").alias("bits"))
    )


def fm_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches built on the same keys: one more bit_or."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "bits"]
    return out.groupBy(*keys).agg(F.bit_or("bits").alias("bits"))


def fm_distinct(sketch: DataFrame, phi: float = 0.77351) -> DataFrame:
    """(group…, est) — FM cardinality estimate per group (mean
    lowest-zero-bit over registers, 2^b̄/φ)."""
    keys = [c for c in sketch.columns if c not in ("r", "bits")]
    lowest_zero = (F.col("bits") + 1).bitwiseAND(F.bitwise_not(F.col("bits")))
    b = F.bit_count(lowest_zero - 1).cast("double")
    est = F.pow(F.lit(2.0), F.avg(b)) / F.lit(float(phi))
    grouped = sketch.groupBy(*keys) if keys else sketch.groupBy()
    return grouped.agg(est.alias("est"))


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    portable: bool = False,
) -> DataFrame:
    """(d, cells array<bigint>) — a depth×width count-min matrix over
    ``value_col`` occurrences: one explode over d rows + one hash agg on
    (d, cell), pivoted to arrays with a deterministic aggregate (cells
    summed positionally). Merge two sketches with :func:`cms_merge`."""
    spark = df.sparkSession
    rows = F.broadcast(spark.range(int(depth)).withColumnRenamed("id", "d"))
    if portable:
        from linkgraph.portable import phash

        cell = F.pmod(phash(F.col(value_col), F.col("d")), F.lit(int(width)))
    else:
        cell = F.pmod(F.xxhash64(value_col, F.col("d")), F.lit(int(width)))
    counts = (
        df.select(value_col)
        .crossJoin(rows)
        .select("d", cell.cast("int").alias("cell"))
        .groupBy("d", "cell")
        .agg(F.count("*").alias("c"))
    )
    return _gather_cells(counts, int(width))


def _gather_cells(counts: DataFrame, width: int) -> DataFrame:
    """(d, cells[width]) from sparse (d, cell, c) rows: collect the ≤width
    populated cells per row into a map, densify with one transform."""
    return (
        counts.groupBy("d")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("cell", "c"))).alias("m")
        )
        .select(
            "d",
            F.transform(
                F.sequence(F.lit(0), F.lit(int(width) - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("bigint")
                ),
            ).alias("cells"),
        )
    )


def cms_merge(a: DataFrame, b: DataFrame, width: int = 256) -> DataFrame:
    """Element-wise sum of two same-shape count-min matrices."""
    sparse = (
        a.unionByName(b)
        .select("d", F.posexplode("cells").alias("cell", "c"))
        .groupBy("d", "cell")
        .agg(F.sum("c").alias("c"))
    )
    return _gather_cells(sparse, int(width))


def cms_query(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int = 256,
    portable: bool = False,
) -> DataFrame:
    """(value, est) — point-query upper bounds: min over depth rows of
    the hashed cell. Broadcast the d-row sketch against the query table
    (the sketch IS broadcast-sized — that's its point)."""
    if portable:
        from linkgraph.portable import phash

        cell = F.pmod(phash(F.col(value_col), F.col("d")), F.lit(int(width)))
    else:
        cell = F.pmod(F.xxhash64(value_col, F.col("d")), F.lit(int(width)))
    joined = queries.select(value_col).distinct().crossJoin(
        F.broadcast(sketch)
    )
    return (
        joined.select(
            value_col,
            F.element_at(F.col("cells"), cell.cast("int") + 1).alias("c"),
        )
        .groupBy(value_col)
        .agg(F.min("c").alias("est"))
    )
