"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, JVM-side (zip_with/aggregate
expressions, no Python). Scale path: LSH (random-hyperplane) bucketing —
candidates only compare within matching buckets, turning the n·q cross
product into bucket-local joins; signature computation is a vectorized
Arrow pandas UDF (one numpy matmul per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def _dot(a, b):
    # cast float32 elements to double BEFORE multiplying: float32 products
    # lose bits that the DuckDB oracle (computing on DOUBLE[]) keeps
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(a, b):
    """Cosine similarity of two array<float/double> columns as a JVM
    expression (zero-vector guarded)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(0.0)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: (query_id, neighbor_id, cos) with the k
    most-similar non-identical vectors per query.

    ``queries`` is (id_col, vec_col) and is BROADCAST — the archetypal
    small-dim × big-fact join; the big side streams once, fully parallel.
    Tie-break on neighbor id keeps top-k deterministic across partitioning.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        e.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_similarity_col(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _portable_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic hyperplanes from the md5 portable hash (uniform on
    [-0.5, 0.5) per coordinate — symmetric about 0, so sign-hash LSH
    semantics hold), bit-identical to the DuckDB oracle's regeneration."""
    import hashlib

    arr = np.empty((dim, n_planes))
    for d in range(dim):
        for j in range(n_planes):
            h = int(hashlib.md5(f"{d}:{j}:{seed}".encode()).hexdigest()[:15], 16)
            arr[d, j] = h / float(1 << 60) - 0.5
    return arr


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """(id, bucket) — random-hyperplane LSH: bucket = sign-bit pattern of
    ``n_planes`` seeded Gaussian projections. Vectorized pandas UDF: one
    (batch × dim) @ (dim × planes) matmul per Arrow batch. portable=True
    swaps Gaussian planes for md5 portable-hash planes the DuckDB oracle
    regenerates exactly."""
    planes = (
        _portable_planes(dim, n_planes, seed)
        if portable
        else np.random.default_rng(seed).standard_normal((dim, n_planes))
    )

    @F.pandas_udf(T.LongType())
    def bucket_of(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return embeddings.select(
        F.col(id_col).alias("id"), bucket_of(F.col(vec_col)).alias("bucket")
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane buckets.

    Recall/cost dial = n_planes (more planes → smaller buckets → faster,
    lower recall). At 10^9 vectors the bucket join shuffles each side once
    on a 64-bit key instead of forming the full cross product.
    """
    sig = hyperplane_signatures(embeddings, n_planes, dim, seed, id_col, vec_col, portable)
    qsig = hyperplane_signatures(queries, n_planes, dim, seed, id_col, vec_col, portable)
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")).join(
        sig.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).join(
        qsig.withColumnRenamed("id", "query_id"), "query_id"
    )
    scored = (
        e.join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_similarity_col(F.col("qv"), F.col("nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def banded_hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """(id, band, bucket) — OR-banded hyperplane LSH (the MinHash-banding
    trick applied to hyperplane bits): the n_planes sign bits split into
    ``bands`` groups; a pair is a candidate if ANY band's bit-group matches
    exactly. Single-bucket LSH's recall collapses as n_planes grows (P[all
    n bits agree] = (1−θ/π)^n); banding holds recall at
    1 − (1 − (1−θ/π)^{n/b})^b while keeping buckets selective."""
    assert n_planes % bands == 0, "bands must divide n_planes"
    rpb = n_planes // bands
    planes = (
        _portable_planes(dim, n_planes, seed)
        if portable
        else np.random.default_rng(seed).standard_normal((dim, n_planes))
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(rpb)).astype(np.int64)
        out = [
            [int(row[b * rpb:(b + 1) * rpb] @ weights) for b in range(bands)]
            for row in bits
        ]
        return pd.Series(out)

    return embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(band_buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def lsh_cosine_topk_banded(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k with graceful recall: candidates from ANY matching
    band (OR over bands), deduplicated, then exactly scored. The bucket
    join shuffles on (band, bucket) — bands× the single-probe shuffle
    volume for recall that no single-table probe reaches."""
    sig = banded_hyperplane_signatures(embeddings, n_planes, bands, dim, seed, id_col, vec_col, portable)
    qsig = banded_hyperplane_signatures(queries, n_planes, bands, dim, seed, id_col, vec_col, portable)
    cand = (
        sig.withColumnRenamed("id", "neighbor_id")
        .join(qsig.withColumnRenamed("id", "query_id"), ["band", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        cand.join(e, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("qv"), F.col("nv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
