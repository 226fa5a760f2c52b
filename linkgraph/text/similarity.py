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


def embedding_near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(a, b, cos) embedding-cosine near-duplicate pairs with a < b and
    cos ≥ threshold — the embedding-space member of the dedup family
    (exact / n-gram Jaccard / MinHash / SimHash live in text.dedup).

    Candidates come from OR-banded hyperplane LSH (any band's sign-bit
    group matching), then every candidate is EXACTLY cosine-verified, so
    precision is 1.0 by construction; recall is the banding curve
    1 − (1 − (1−θ/π)^{n/b})^b. ``max_bucket_size`` applies the same
    mega-bucket discipline as minhash_lsh_candidates: a (band, bucket)
    cell shared by d vectors emits d² pairs, so buckets over the cap
    degrade to a STAR around the bucket's min id (O(d) pairs). Star pairs
    are still exactly verified; within a boilerplate bucket of
    near-identical vectors the verified star plus the transitive closure
    in :func:`embedding_near_duplicate_groups` recovers the same dedup
    groups, and only cross-signature pairs inside the capped bucket can
    be missed. Pass ``None`` for unbounded exact-LSH semantics."""
    sig = banded_hyperplane_signatures(
        embeddings, n_planes, bands, dim, seed, id_col, vec_col, portable
    )
    if max_bucket_size is not None:
        bsz = sig.groupBy("band", "bucket").agg(F.count("*").alias("_n"))
        sig = sig.join(bsz, ["band", "bucket"])
        over = sig.where(F.col("_n") > max_bucket_size)
        sig = sig.where(F.col("_n") <= max_bucket_size).drop("_n")
        rep = over.groupBy("band", "bucket").agg(F.min("id").alias("_rep"))
        star = (
            over.join(rep, ["band", "bucket"])
            .where(F.col("id") != F.col("_rep"))
            .select(
                F.least("_rep", "id").alias("a"),
                F.greatest("_rep", "id").alias("b"),
            )
        )
    else:
        star = None
    cand = (
        sig.alias("x")
        .join(sig.alias("y"), ["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    va = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", cosine_similarity_col(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_duplicate_groups(
    embeddings: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, group_id, keep) — transitive closure of embedding near-dup
    pairs into dedup groups (group_id = min reachable id, keep flags the
    canonical representative); delegates to the connected-components
    machinery shared with the text dedup family."""
    from linkgraph.text.dedup import near_duplicate_groups

    docs = embeddings.select(F.col(id_col).alias("doc_id"))
    return near_duplicate_groups(docs, pairs).withColumnRenamed("doc_id", id_col)


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


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------

def ivf_centroids(
    embeddings: DataFrame,
    n_list: int = 16,
    refine_rounds: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """(cell, cv: array<double>) — coarse-quantizer centroids for an IVF
    index: ``n_list`` seed vectors chosen deterministically (the rows with
    the smallest seeded hash of id — a uniform sample both engines can
    replay), optionally refined by ``refine_rounds`` Lloyd iterations
    (assign every vector to its max-cosine cell, recentre each cell at the
    element-wise mean of its members).

    Scale shape: seed selection is a TakeOrdered of n_list rows (no global
    sort materialization); each Lloyd round is one broadcast-join
    assignment pass over the corpus plus one (cell, coordinate) hash
    aggregation — all map-side combinable. The only window runs over the
    ≤ n_list selected seed rows (documented-tiny). Cells that lose all
    members during refinement drop out (n_list is an upper bound)."""
    if portable:
        from linkgraph.portable import phash

        h = phash(F.col(id_col), F.lit(seed))
    else:
        h = F.xxhash64(F.col(id_col), F.lit(seed))
    seeds = (
        embeddings.select(
            F.col(id_col).alias("sid"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("cv"),
            h.alias("_h"),
        )
        .orderBy("_h", "sid")
        .limit(n_list)
    )
    cents = seeds.withColumn(
        "cell", F.row_number().over(Window.orderBy("_h", "sid")) - 1
    ).select("cell", "cv")
    for _ in range(refine_rounds):
        cents = F.broadcast(cents.localCheckpoint(eager=True))
        assign = ivf_assign(embeddings, cents, id_col, vec_col)
        cents = (
            embeddings.join(
                assign.withColumnRenamed("id", id_col), id_col
            )
            .select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            # round the mean to 12dp: float summation order varies with
            # partitioning/agg-tree shape, and an ulp-different centroid
            # can flip a near-tie assignment — rounding pins the refined
            # centroids (and everything downstream) across parallelism
            .agg(F.round(F.avg(F.col("v").cast("double")), 12).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) — each vector's max-cosine centroid. One broadcast join
    (centroids are tiny by construction) + one max_by hash aggregation:
    map-side combinable, no window, ties broken toward the lower cell."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    scored = e.crossJoin(F.broadcast(centroids)).select(
        "id",
        "cell",
        cosine_similarity_col(F.col("v"), F.col("cv")).alias("cos"),
    )
    return scored.groupBy("id").agg(
        F.max_by("cell", F.struct(F.col("cos"), -F.col("cell"))).alias("cell")
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    refine_rounds: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """IVF approximate top-k: (query_id, neighbor_id, cos) scanning only
    the ``n_probe`` cells whose centroids are most cosine-similar to each
    query — the inverted-file alternative to hyperplane LSH (recall dial =
    n_probe/n_list; n_probe == n_list degenerates to exact brute force).

    At corpus scale the cost is one assignment pass at index-build time,
    then per query a centroid scan (n_list rows, broadcast) plus an exact
    scan of ~n_probe/n_list of the corpus, shuffled once on the cell key
    — no all-pairs product. Cell skew (a hub cell holding a large corpus
    share) is bounded by refinement and, at the extreme, by raising
    n_list; candidates are exactly scored so precision is 1.0."""
    cents = F.broadcast(
        ivf_centroids(
            embeddings, n_list, refine_rounds, seed, id_col, vec_col, portable
        ).localCheckpoint(eager=True)
    )
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qscore = q.crossJoin(cents).select(
        "query_id",
        "cell",
        cosine_similarity_col(F.col("qv"), F.col("cv")).alias("ccos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cell"))
    probes = (
        qscore.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "cell")
    )
    cand = (
        probes.join(assign, "cell")
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
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


def semantic_dedup(
    embeddings: DataFrame,
    eps: float = 0.05,
    n_list: int = 16,
    refine_rounds: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
    max_cell_size: int | None = 100_000,
) -> DataFrame:
    """(vec_id, cell, centroid_cos, group_id, keep) — SemDeDup semantic
    deduplication (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space with the IVF coarse quantizer, call two docs
    semantic duplicates when they share a cluster and their EXACT cosine
    is ≥ 1 − eps, close the duplicate pairs into groups, and keep exactly
    one doc per group — the member with the LOWEST cosine to its cluster
    centroid (the paper's rule: retain the least prototypical example;
    ties broken toward min id). ``filter(keep = 1)`` is the dedup
    decision a pipeline applies. REF⚠ (reference empty): no NetworKit
    counterpart — this is a training-data-pipeline op, the embedding-space
    sibling of minhash/simhash dedup that catches paraphrases exact
    shingling cannot.

    Scale shape: the quadratic pair join is confined within k-means cells,
    so ``n_list`` is the scale dial (the paper runs 50k clusters at
    LAION-440M scale ⇒ ~9k docs/cell); assignment is one broadcast join +
    one max_by hash agg over the corpus; the group closure reuses the
    distributed CC machinery. Cells larger than ``max_cell_size`` degrade
    to a STAR around the cell's min-(centroid_cos, id) member — O(d)
    instead of d² pairs, the same mega-bucket discipline as
    minhash_lsh_candidates / embedding_near_duplicate_pairs; star edges
    are still exactly verified, so precision stays 1.0 and only
    star-periphery pairs that both fail the star test can be missed.
    """
    cents = F.broadcast(
        ivf_centroids(
            embeddings, n_list, refine_rounds, seed, id_col, vec_col, portable
        ).localCheckpoint(eager=True)
    )
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )
    scored = e.crossJoin(cents).select(
        "id", "cell", cosine_similarity_col(F.col("v"), F.col("cv")).alias("cos")
    )
    assign = (
        scored.groupBy("id")
        .agg(
            F.max_by(
                F.struct("cell", "cos"), F.struct(F.col("cos"), -F.col("cell"))
            ).alias("best")
        )
        .select(
            "id",
            F.col("best.cell").alias("cell"),
            F.col("best.cos").alias("centroid_cos"),
        )
    )
    if max_cell_size is not None:
        csz = assign.groupBy("cell").agg(F.count("*").alias("_n"))
        a2 = assign.join(csz, "cell")
        small = a2.where(F.col("_n") <= max_cell_size).drop("_n")
        over = a2.where(F.col("_n") > max_cell_size).drop("_n")
        rep = (
            over.groupBy("cell")
            .agg(
                F.min(
                    F.struct(
                        F.round("centroid_cos", 9).alias("r"), F.col("id").alias("i")
                    )
                ).alias("mn")
            )
            .select("cell", F.col("mn.i").alias("_rep"))
        )
        star = (
            over.join(rep, "cell")
            .where(F.col("id") != F.col("_rep"))
            .select(
                F.least("_rep", "id").alias("a"), F.greatest("_rep", "id").alias("b")
            )
        )
    else:
        small, star = assign, None
    cand = (
        small.select("cell", "id").alias("x")
        .join(small.select("cell", "id").alias("y"), "cell")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
    )
    if star is not None:
        cand = cand.unionByName(star).distinct()
    va = e.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = e.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    pairs = (
        cand.join(va, "a")
        .join(vb, "b")
        .where(cosine_similarity_col(F.col("va"), F.col("vb")) >= 1.0 - eps)
        .select("a", "b")
    )
    from linkgraph.text.dedup import near_duplicate_groups

    grp = near_duplicate_groups(
        embeddings.select(F.col(id_col).alias("doc_id")), pairs
    ).select(F.col("doc_id").alias("id"), "group_id")
    out = assign.join(grp, "id")
    wmin = out.groupBy("group_id").agg(
        F.min(
            F.struct(F.round("centroid_cos", 9).alias("r"), F.col("id").alias("i"))
        ).alias("mn")
    )
    return out.join(wmin, "group_id").select(
        F.col("id").alias(id_col),
        "cell",
        "centroid_cos",
        "group_id",
        (F.col("id") == F.col("mn.i")).cast("int").alias("keep"),
    )
