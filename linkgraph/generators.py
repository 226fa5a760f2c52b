"""Graph generators — R-MAT (bench/scale graph), Erdős–Rényi, planted SBM.

Reference parity: networkit/cpp/generators/{RmatGenerator, ErdosRenyi
Generator, ClusteredRandomGraphGenerator}.cpp. R-MAT is the P0 bench
generator (SURVEY §2A): power-law degree skew with tunable hub intensity —
exactly the shape that stresses the skew handling the north rule demands.

Determinism: every edge's quadrant path derives from splitmix64(edge_id,
level) — counter-based hashing, no sequential RNG state — so the SAME
graph comes out regardless of partitioning or cluster size, and generation
is embarrassingly parallel (mapInPandas over spark.range, numpy-vectorized
per Arrow batch; no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — public-domain mixing function."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def rmat(
    spark: SparkSession,
    scale: int = 16,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    d: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """R-MAT edge table (src, dst, weight=1.0): 2^scale vertices,
    edge_factor·2^scale edges (with natural multi-edge collapse via the
    caller's dedup if desired). Kept directed; self-loops possible (as in
    the reference generator)."""
    n_edges = edge_factor << scale
    probs = np.array([a, b, c, d], dtype=np.float64)
    cum = np.cumsum(probs) / probs.sum()
    base = np.uint64(seed) * np.uint64(0x100000001B3)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            src = np.zeros(len(ids), dtype=np.uint64)
            dst = np.zeros(len(ids), dtype=np.uint64)
            for level in range(scale):
                u = _u01(base + ids * np.uint64(scale) + np.uint64(level))
                quad = np.searchsorted(cum, u, side="right")
                src = (src << np.uint64(1)) | np.uint64(1) * (quad >= 2)
                dst = (dst << np.uint64(1)) | np.uint64(1) * (quad % 2 == 1)
            yield pd.DataFrame(
                {
                    "src": src.astype(np.int64),
                    "dst": dst.astype(np.int64),
                    "weight": np.ones(len(ids)),
                }
            )

    return (
        spark.range(n_edges)
        .mapInPandas(gen, "src bigint, dst bigint, weight double")
    )


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> DataFrame:
    """G(n, p) via per-pair Bernoulli filter over the candidate-pair range.

    Candidate enumeration is O(n²) rows streamed through a filter — fine
    for fixtures (n ≤ ~10^4); large sparse graphs should use rmat().
    """
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
    )
    pairs = pairs.where(
        F.col("src") < F.col("dst") if not directed else F.col("src") != F.col("dst")
    )
    # deterministic per-pair coin: xxhash64 → [0,1)
    coin = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007)) / 1_000_000_007.0
    return pairs.where(coin < p).withColumn("weight", F.lit(1.0))


def planted_sbm(
    spark: SparkSession,
    n: int = 60,
    blocks: int = 2,
    p_in: float = 0.3,
    p_out: float = 0.01,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Planted-partition SBM (fixture oracle for PLP): returns (edges,
    planted_labels(id, label)); block of vertex v = v % blocks-interleaved →
    contiguous ranges for canonical min-id labels."""
    size = n // blocks
    pairs = (
        spark.range(n).withColumnRenamed("id", "src")
        .crossJoin(spark.range(n).withColumnRenamed("id", "dst"))
        .where(F.col("src") < F.col("dst"))
    )
    same = (F.col("src") / size).cast("int") == (F.col("dst") / size).cast("int")
    coin = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000_007)) / 1_000_000_007.0
    edges = pairs.where(
        (same & (coin < p_in)) | (~same & (coin < p_out))
    ).withColumn("weight", F.lit(1.0))
    labels = spark.range(n).select(
        F.col("id"),
        ((F.col("id") / size).cast("int") * size).cast("bigint").alias("label"),
    )
    return edges, labels
