"""Product quantization (PQ) — compressed ANN for the 100-TB scale path.

PQ (Jégou et al. TPAMI 2011) splits each d-dim vector into m contiguous
subvectors and replaces each with its nearest of n_codes learned
centroids: the corpus shrinks to m small-int codes per vector (64-dim
float32 → 4 bytes at m=4/n_codes=256 — 64×), and query scoring becomes
table lookups (ADC: precompute <q_sub, centroid> for every (sub, code),
then a vector's approximate inner product is a sum of m lookups). The
standard memory-bounded alternative to scanning raw vectors; composes
with the IVF router (`ivf_cosine_topk`) into IVFPQ.

Spark shapes (no per-row Python anywhere):
- training: one hash-sampled seed set (same uniform-sample trick as
  ivf_centroids), then Lloyd rounds where assignment is a broadcast
  join + max_by hash-agg over (id, sub) subvector rows and recentring
  is one (sub, code, pos) hash-agg;
- encoding: the same broadcast-join argmin, m codes collected per id;
- search: broadcast LUT join on (sub, code) + one (query, id) sum agg
  (the distributed ADC scan), a per-query shortlist window, then EXACT
  cosine re-ranking of the shortlist (two-stage retrieval: the ADC
  approximation bounds memory, the rerank restores precision@k).

Subvector L2 is the training metric (the PQ standard); scoring is
inner-product ADC over the raw (unit-norm in the test corpus) vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _hash_col(id_col: str, seed: int, portable: bool):
    if portable:
        from linkgraph.portable import phash

        return phash(F.col(id_col), F.lit(seed))
    return F.xxhash64(F.col(id_col), F.lit(seed))


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    row = embeddings.select(F.size(vec_col)).first()
    if row is None:
        raise ValueError("cannot infer embedding dim from an empty DataFrame")
    return int(row[0])


def _subvectors(embeddings: DataFrame, id_col: str, vec_col: str, m: int, w: int) -> DataFrame:
    """(id, sub, sv: array<double>) — m contiguous slices per vector."""
    slices = F.array(
        *[
            F.transform(
                F.slice(F.col(vec_col), j * w + 1, w), lambda x: x.cast("double")
            )
            for j in range(m)
        ]
    )
    return embeddings.select(
        F.col(id_col).alias("id"), F.posexplode(slices).alias("sub", "sv")
    )


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_codes(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(id, sub, code) — argmin subvector L2 to the sub's codebook, ties
    to the lower code. One broadcast join + one max_by hash-agg."""
    scored = sv.join(F.broadcast(codebooks), "sub").select(
        "id", "sub", "code", _l2sq(F.col("sv"), F.col("cv")).alias("d")
    )
    return scored.groupBy("id", "sub").agg(
        F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code")
    )


def _query_lut(queries, books, m, w, id_col, vec_col):
    """(query_id, sub, code, ip) — per-query ADC lookup table (inner
    products of each query subvector with every codebook centroid);
    shared by pq_topk and ivfpq_topk."""
    qsub = _subvectors(queries, id_col, vec_col, m, w).withColumnRenamed(
        "id", "query_id"
    )
    return qsub.join(F.broadcast(books), "sub").select(
        "query_id",
        "sub",
        "code",
        F.aggregate(
            F.zip_with(F.col("sv"), F.col("cv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("ip"),
    )


def _adc_shortlist(adc, k, shortlist_factor):
    """Shortlist on the 6dp-ROUNDED ADC score: double summation order
    differs across engines/partitionings, retrieval quality is
    insensitive at this precision, and rounding makes the ranking
    deterministic — the shared determinism rule of both PQ paths."""
    wsl = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("adc", 6)), F.asc("id")
    )
    return (
        adc.withColumn("_rn", F.row_number().over(wsl))
        .where(F.col("_rn") <= k * shortlist_factor)
        .select("query_id", F.col("id").alias("neighbor_id"))
    )


def _exact_rerank(short, embeddings, queries, k, id_col, vec_col):
    """Exact-cosine re-rank of a (query_id, neighbor_id) shortlist."""
    from linkgraph.text.similarity import cosine_similarity_col

    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        short.join(e, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("qv"), F.col("nv")).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(wk))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    refine_rounds: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """(sub, code, cv: array<double>) — per-subspace codebooks. Seeds =
    the ``n_codes`` vectors of smallest seeded hash, sliced per subspace
    (sample-then-slice, deterministic on both engines), refined by
    ``refine_rounds`` Lloyd iterations. Requires dim % m == 0.
    ``dim`` skips the inference scan when the caller already knows it."""
    dim = dim or _dim_of(embeddings, vec_col)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    w = dim // m
    h = _hash_col(id_col, seed, portable)
    seeds = (
        embeddings.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("v"), h.alias("_h"))
        .orderBy("_h", "sid")
        .limit(n_codes)
    )
    seeds = seeds.withColumn(
        "code", F.row_number().over(Window.orderBy("_h", "sid")) - 1
    )
    books = seeds.select(
        "code",
        F.posexplode(
            F.array(
                *[
                    F.transform(
                        F.slice(F.col("v"), j * w + 1, w), lambda x: x.cast("double")
                    )
                    for j in range(m)
                ]
            )
        ).alias("sub", "cv"),
    ).select("sub", "code", "cv")
    sv = _subvectors(embeddings, id_col, vec_col, m, w)
    for _ in range(refine_rounds):
        books = F.broadcast(books.localCheckpoint(eager=True))
        assign = _assign_codes(sv, books)
        books = (
            sv.join(assign, ["id", "sub"])
            .select("sub", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("cv")
            )
        )
    return books.localCheckpoint(eager=True)


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, codes: array<int>) — each vector's m nearest-centroid codes,
    ordered by subspace. This IS the compressed index (m small ints per
    corpus vector). ``dim`` skips the inference scan when known."""
    dim = dim or _dim_of(embeddings, vec_col)
    w = dim // m
    assign = _assign_codes(_subvectors(embeddings, id_col, vec_col, m, w), codebooks)
    return assign.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 16,
    refine_rounds: int = 1,
    shortlist_factor: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — two-stage PQ retrieval: ADC scan
    over the codes shortlists ``k × shortlist_factor`` candidates per
    query (sum of m LUT lookups — never touches raw corpus vectors),
    then EXACT cosine re-ranks the shortlist. ``cos`` is exact.

    Scale: the corpus-side state is the code table (m ints/vector); the
    ADC scan shuffles (query, id, partial) rows with map-side combine;
    only shortlist×queries raw vectors are ever re-read. Compose with
    ivf_cosine_topk's router for IVFPQ when even the full code scan is
    too much."""
    dim = _dim_of(embeddings, vec_col)
    w = dim // m
    books = pq_codebooks(
        embeddings, m, n_codes, refine_rounds, seed, id_col, vec_col, portable,
        dim=dim,
    )
    codes = pq_encode(embeddings, books, m, id_col, vec_col, dim=dim)
    lut = _query_lut(queries, books, m, w, id_col, vec_col)
    corpus_codes = codes.select("id", F.posexplode("codes").alias("sub", "code"))
    adc = (
        corpus_codes.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("ip").alias("adc"))
    )
    short = _adc_shortlist(adc, k, shortlist_factor)
    return _exact_rerank(short, embeddings, queries, k, id_col, vec_col)


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    refine_rounds: int = 1,
    shortlist_factor: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cos) — IVFPQ: the IVF coarse router
    confines each query to its ``n_probe`` best cells, then the PQ ADC
    scan + exact rerank runs over ONLY those cells' codes. The standard
    billion-scale index shape (Jégou et al. 2011 §IV): corpus state =
    one cell id + m code ints per vector; per query the scanned
    fraction is ~n_probe/n_list of the codes, never raw vectors until
    the shortlist rerank.

    Plan: reuses ivf_centroids/ivf_assign (broadcast quantizer) and the
    PQ LUT; candidate confinement is a (cell) join before the ADC agg —
    the only corpus-sized shuffle keys on cell then (query, id)."""
    from linkgraph.text.similarity import (
        cosine_similarity_col,
        ivf_assign,
        ivf_centroids,
    )

    dim = _dim_of(embeddings, vec_col)
    w = dim // m
    cents = F.broadcast(
        ivf_centroids(
            embeddings, n_list, refine_rounds, seed, id_col, vec_col, portable
        ).localCheckpoint(eager=True)
    )
    assign = ivf_assign(embeddings, cents, id_col, vec_col)
    books = pq_codebooks(
        embeddings, m, n_codes, refine_rounds, seed + 1, id_col, vec_col,
        portable, dim=dim,
    )
    codes = pq_encode(embeddings, books, m, id_col, vec_col, dim=dim)
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
    lut = _query_lut(queries, books, m, w, id_col, vec_col)
    cand = probes.join(assign.withColumnRenamed("id", "cid"), "cell").select(
        "query_id", F.col("cid").alias("id")
    )
    corpus_codes = codes.select("id", F.posexplode("codes").alias("sub", "code"))
    adc = (
        cand.join(corpus_codes, "id")
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .where(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("ip").alias("adc"))
    )
    short = _adc_shortlist(adc, k, shortlist_factor)
    return _exact_rerank(short, embeddings, queries, k, id_col, vec_col)
