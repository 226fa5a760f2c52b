"""Exact order statistics at scale.

Spark ships ``approxQuantile`` (Greenwald-Khanna) because exact
quantiles naively need a global sort; this module computes EXACT
quantiles without one, using the engine's range-partition linearization
discipline (the roc_auc pattern): range-partition by the value, rank
within each partition, add per-partition prefix offsets (one row per
partition to the driver), and select the rows at the target positions.
No SinglePartition exchange anywhere; the only driver state is
``#partitions`` counts.

Quantile definition: ``type 1`` / "lower" — the element at index
``floor(q·(n−1))`` of the ascending sort (deterministic for every q,
duplicates included; the definition the DuckDB oracle replays with a
ROW_NUMBER filter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def distributed_row_number(
    df: DataFrame, order_by: list, rank_col: str = "rank"
) -> DataFrame:
    """``df`` plus a 1-based global row_number under ``order_by`` (sort
    column expressions, e.g. ``[F.desc("degree"), F.asc("id")]``) with NO
    SinglePartition window: range-partition on the sort keys, rank within
    each partition, add per-partition prefix offsets (driver state =
    one count per partition). The order must be total (include a
    tie-break key) for the result to be deterministic."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pids across the two uses
    )
    part_tot = ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    offsets, acc = {}, 0
    for r in sorted(part_tot, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["c"]
    off_df = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()] or [(0, 0)], "_pid int, _off bigint"
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.withColumn("_r", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, F.col("_r") + F.col("_off"))
        .drop("_pid", "_r", "_off")
    )


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float]
) -> DataFrame:
    """(q, value) — exact corpus-wide quantiles of ``value_col``. Two
    passes over the data (count + ranked scan), shuffles bounded by the
    range partitioning; positions are matched with a broadcast of the
    |qs|-row target table."""
    n = df.where(F.col(value_col).isNotNull()).count()
    if n == 0:
        raise ValueError("exact_quantiles on an empty/all-null column")
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(float(q), int(math.floor(q * (n - 1)))) for q in qs],
        "q double, pos bigint",
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.select(F.col(value_col).alias("v"))
        .where(F.col("v").isNotNull())
        .repartitionByRange(n_parts, "v")
        .sortWithinPartitions("v")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pids across the two uses
    )
    part_tot = ranged.groupBy("pid").agg(F.count("*").alias("c")).collect()
    offsets, acc = {}, 0
    for r in sorted(part_tot, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["c"]
    off_df = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()] or [(0, 0)], "pid int, off bigint"
    )
    w = Window.partitionBy("pid").orderBy("v")
    ranked = (
        ranged.withColumn("_r", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "pid")
        .select("v", (F.col("_r") + F.col("off")).alias("pos"))
    )
    return (
        ranked.join(F.broadcast(targets), "pos")
        .select("q", F.col("v").alias("value"))
    )


def grouped_exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], group_col: str
) -> DataFrame:
    """(group, q, value) — exact per-group quantiles: rank inside each
    group with a group-partitioned window (task size bounded by the
    group's cardinality, never a global sort), join per-group counts,
    keep the rows whose rank hits a target index."""
    base = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull())
    counts = base.groupBy("g").agg(F.count("*").alias("n"))
    w = Window.partitionBy("g").orderBy("v")
    ranked = base.withColumn("_r", F.row_number().over(w) - 1).join(counts, "g")
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # one pass: broadcast the |qs|-row table, keep rank==target rows
    return (
        ranked.crossJoin(F.broadcast(qdf))
        .where(F.col("_r") == F.floor(F.col("q") * (F.col("n") - 1)))
        .select(F.col("g").alias(group_col), "q", F.col("v").alias("value"))
    )
