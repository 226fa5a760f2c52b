"""Deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All signature computation is JVM-side (xxhash64 + hash-agg) — no Python in
the hot path; candidate generation is always bucket-join shaped so the
quadratic all-pairs comparison never materializes.

Scale shapes:
- exact: groupBy(sha2(text)) — one shuffle on the hash, partial agg.
- ngram-Jaccard: explode DISTINCT shingles → self-join on shingle →
  pair-count agg. A shingle shared by d docs creates d² pairs, so super-
  common shingles are dropped via ``max_shingle_freq`` (the same heavy-
  hitter discipline as the link-prediction wedge join).
- MinHash: H independent min-aggregations over shingle hashes (one
  hash-agg, H columns); LSH bands of r rows → band-hash bucket join with
  a per-bucket size cap (oversized boilerplate buckets degrade to O(d)
  identical-signature stars); candidates verified with exact signature
  similarity.
- SimHash: 64 per-bit weighted sums in one agg; near-dup candidates via
  block-combination buckets (n_blocks=4 → the classic 16-bit chunk
  tables; n_blocks=6 → C(6,3)=20 tables on ~32-bit keys for ≥10⁹ docs),
  same per-bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.text.quality import shingles, tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(group_id, doc_id) for docs whose text is byte-identical; group_id =
    min doc_id of the group. Single-member groups excluded."""
    keyed = docs.select("doc_id", F.sha2(F.col(text_col), 256).alias("k"))
    groups = keyed.groupBy("k").agg(
        F.min("doc_id").alias("group_id"), F.count("*").alias("n")
    ).where(F.col("n") > 1)
    return keyed.join(groups, "k").select("group_id", "doc_id")


def deduplicate_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative of every identical-text group."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy("doc_id")
    return docs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_shingle_freq: int | None = 10_000,
) -> DataFrame:
    """(a, b, jaccard) for doc pairs with Jaccard(shingle sets) ≥ threshold.

    EXACT similarity (not probabilistic): |A∩B| from the shingle join,
    |A∪B| = |A|+|B|−|A∩B| from per-doc distinct-shingle counts.

    ``max_shingle_freq`` bounds the self-join fan-out: a shingle shared by
    d docs emits d² pairs, so one boilerplate shingle ("all rights
    reserved …") at corpus scale is a cartesian bomb. The default drops
    shingles shared by >10k docs — any pair connected ONLY through such a
    shingle is boilerplate-similar, not content-similar. Pass ``None``
    for the exact unbounded semantics (safe at fixture scale only).
    """
    sh = (
        docs.select("doc_id", F.explode(shingles(F.col(text_col), k)).alias("sh"))
        .distinct()
    )
    if max_shingle_freq is not None:
        freq = sh.groupBy("sh").agg(F.count("*").alias("f"))
        sh = sh.join(freq.where(F.col("f") <= max_shingle_freq), "sh", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb"), "b")
        .select(
            "a",
            "b",
            (F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, k: int = 3, text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>) — sig[h] = min over shingles of
    hash(shingle, seed=h). One explode + one hash-agg with H min
    columns; entirely JVM-side. ``portable=True`` uses the md5-based hash
    (linkgraph.portable) reproducible in DuckDB for the oracle gate;
    xxhash64 is the production default."""
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("sh")
    )
    if portable:
        from linkgraph.portable import phash

        mins = [
            F.min(phash(F.col("sh"), F.lit(h))).alias(f"m{h}")
            for h in range(num_hashes)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("sh"), F.lit(h))).alias(f"m{h}")
            for h in range(num_hashes)
        ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"m{h}") for h in range(num_hashes)]).alias("sig")
    )


def lsh_band_keys(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, band, bh) — the LSH bucket keys of a signature table:
    THE pinned banding definition, shared by the batch candidate
    generator below and the streaming stage
    (linkgraph.streaming.neardup_stream), so persisted bucket tables
    stay compatible across both paths."""
    if portable:
        from linkgraph.portable import phash

        def band_hash(b):
            return phash(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )

    else:

        def band_hash(b):
            return F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * rows_per_band + r]
                        for r in range(rows_per_band)
                    ],
                ),
                F.lit(b),
            )

    return signatures.select(
        "doc_id",
        F.posexplode(F.array(*[band_hash(b) for b in range(bands)])).alias(
            "band", "bh"
        ),
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4,
    portable: bool = False, max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(a, b) candidate near-dup pairs: docs agreeing exactly on at least
    one LSH band. bands*rows_per_band must equal the signature length.

    ``max_bucket_size`` bounds the bucket-join fan-out — the same heavy-
    hitter discipline as ``max_shingle_freq``: a (band, band-hash) bucket
    shared by d docs emits d² pairs, so one boilerplate mega-bucket at
    corpus scale is a shuffle bomb. Buckets over the cap are routed to
    full-signature grouping instead: docs there agree on a whole band, so
    they are overwhelmingly signature-identical boilerplate, and emitting
    a STAR over each identical-full-signature group (min doc_id → others,
    O(d) pairs) preserves both the est_jaccard=1.0 pairs and the
    transitive-closure groups that near_duplicate_groups builds, while
    dropping only cross-signature pairs inside the capped bucket. Pass
    ``None`` for the unbounded exact-LSH semantics (fixture scale)."""
    banded = lsh_band_keys(signatures, bands, rows_per_band, portable)
    if max_bucket_size is not None:
        bsz = banded.groupBy("band", "bh").agg(F.count("*").alias("_n"))
        banded = banded.join(bsz, ["band", "bh"])
        over = banded.where(F.col("_n") > max_bucket_size)
        banded = banded.where(F.col("_n") <= max_bucket_size).drop("_n")
        # oversized buckets → full-signature star pairs (O(d) not d²)
        big_sigs = (
            over.select("doc_id")
            .distinct()
            .join(signatures, "doc_id")
            .select("doc_id", F.xxhash64("sig").alias("_fk"))
        )
        reps = (
            big_sigs.groupBy("_fk")
            .agg(F.min("doc_id").alias("_rep"), F.count("*").alias("_cnt"))
            .where(F.col("_cnt") > 1)
        )
        star = (
            big_sigs.join(reps, "_fk")
            .where(F.col("doc_id") != F.col("_rep"))
            .select(
                F.least("_rep", "doc_id").alias("a"),
                F.greatest("_rep", "doc_id").alias("b"),
            )
        )
    else:
        star = None
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def minhash_dedup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    portable: bool = False,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Full MinHash near-dup pipeline: signatures → LSH candidates →
    verify candidates by estimated Jaccard (fraction of agreeing hashes).
    Returns (a, b, est_jaccard ≥ threshold). ``max_bucket_size`` — see
    minhash_lsh_candidates (mega-bucket fan-out cap)."""
    rows_per_band = num_hashes // bands
    # localCheckpoint (not persist): materialized once for the three uses
    # below, and the blocks are released by the ContextCleaner when the
    # result is dropped — an explicit persist would leak cached blocks
    # across calls in a long-lived session.
    sigs = minhash_signatures(docs, num_hashes, k, text_col, portable).localCheckpoint(
        eager=True
    )
    cand = minhash_lsh_candidates(sigs, bands, rows_per_band, portable, max_bucket_size)
    est = (
        cand.join(sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sa")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
                        lambda z: z == 1,
                    )
                )
                / F.lit(num_hashes)
            ).alias("est_jaccard"),
        )
    )
    return est.where(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """(doc_id, simhash BIGINT) — 64-bit SimHash over token frequencies:
    bit i of the signature is 1 iff Σ_tokens freq·(±1 per token-hash bit i)
    is positive. One explode + token-count agg + 64 conditional sums.
    ``portable=True`` hashes tokens with the DuckDB-reproducible md5 hash
    (60-bit → the top 4 signature bits are always 0 on both sides)."""
    if portable:
        from linkgraph.portable import phash

        th = phash(F.col("t"))
    else:
        th = F.xxhash64("t")
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("f"))
        .withColumn("h", th)
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("f"))
            .otherwise(-F.col("f"))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for i in range(64):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        shifted = F.shiftleft(term, i)
        sig = shifted if sig is None else sig.bitwiseXOR(shifted)
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text",
    portable: bool = False, n_blocks: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """(a, b, hamming ≤ max_hamming) — candidates from block-combination
    buckets (the permuted-table scheme of Manku et al., WWW'07), verified
    with bit_count of the XOR.

    Pigeonhole: split the 64-bit signature into ``n_blocks`` blocks; a
    pair within Hamming distance d differs in at most d blocks, so it
    agrees EXACTLY on some (n_blocks − d)-subset of blocks — one bucket
    table per subset, keyed on that subset's concatenated block values.
    ``n_blocks=4`` with d=3 (default) is the classic single-16-bit-chunk
    scheme: 4 tables × 65k buckets, fine to ~10⁸ docs. ``n_blocks=6``
    gives C(6,3)=20 tables keyed on ~32 signature bits (≈4·10⁹ buckets
    per table) — the ≥10⁹-doc corpus variant: identical exact-recall
    guarantee, wider keys, 5× the explode. ``max_bucket_size`` routes
    over-full buckets (signature-identical boilerplate) to identical-
    simhash STAR pairs, the same O(d)-not-d² discipline as the MinHash
    path — hamming-0 pairs and group closure are preserved.

    ``n_blocks=None`` (default) picks max(4, max_hamming+1) — the
    smallest exact scheme; pigeonhole needs n_blocks > max_hamming."""
    from itertools import combinations

    if n_blocks is None:
        n_blocks = max(4, max_hamming + 1)
    if n_blocks <= max_hamming:
        raise ValueError("n_blocks must exceed max_hamming (pigeonhole bound)")
    sigs = simhash_signatures(docs, text_col, portable).localCheckpoint(eager=True)
    sizes = [64 // n_blocks + (1 if i < 64 % n_blocks else 0) for i in range(n_blocks)]
    offs = [sum(sizes[:i]) for i in range(n_blocks)]

    def block_val(i):
        mask = (1 << sizes[i]) - 1
        return F.shiftright(F.col("simhash"), offs[i]).bitwiseAND(F.lit(mask))

    combos = list(combinations(range(n_blocks), n_blocks - max_hamming))
    keys = [
        F.concat_ws(",", *[block_val(i).cast("string") for i in combo])
        for combo in combos
    ]
    chunks = sigs.select(
        "doc_id", F.posexplode(F.array(*keys)).alias("tbl", "key")
    )
    if max_bucket_size is not None:
        bsz = chunks.groupBy("tbl", "key").agg(F.count("*").alias("_n"))
        chunks = chunks.join(bsz, ["tbl", "key"])
        over = chunks.where(F.col("_n") > max_bucket_size)
        chunks = chunks.where(F.col("_n") <= max_bucket_size).drop("_n")
        big = over.select("doc_id").distinct().join(sigs, "doc_id")
        reps = (
            big.groupBy("simhash")
            .agg(F.min("doc_id").alias("_rep"), F.count("*").alias("_cnt"))
            .where(F.col("_cnt") > 1)
        )
        star = (
            big.join(reps, "simhash")
            .where(F.col("doc_id") != F.col("_rep"))
            .select(
                F.least("_rep", "doc_id").alias("a"),
                F.greatest("_rep", "doc_id").alias("b"),
            )
        )
    else:
        star = None
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["tbl", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.distinct()
    return (
        cand.join(sigs.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb")), "b")
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Pair → group closure (what a training-data pipeline actually consumes)
# ---------------------------------------------------------------------------

def near_duplicate_groups(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, group_id, keep) — transitive closure of a near-dup pair
    table into dedup groups: group_id = min doc_id reachable through pair
    edges (distributed hash-to-min, the connected-components machinery);
    docs in no pair form singleton groups. ``keep`` marks the canonical
    representative (min doc_id) — ``filter(keep)`` IS the dedup decision a
    pipeline applies.

    ``pairs`` is any (a, b, …) near-dup table (minhash_dedup_pairs,
    simhash_near_duplicates, ngram_jaccard_pairs output)."""
    from linkgraph.algs.components import connected_components
    from linkgraph.graph import Graph

    edge_df = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1.0).alias("weight")
    )
    comp = connected_components(Graph.from_edges(edge_df, directed=False))
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("group_id"),
        )
        .withColumn("keep", (F.col("doc_id") == F.col("group_id")).cast("int"))
    )


# ---------------------------------------------------------------------------
# Exact-substring (duplicate-span) dedup — Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better". The reference method finds
# ≥50-token substrings shared across documents with a suffix array; the
# distributed formulation slides a k-token window over every document and
# marks a window DUPLICATED when the identical token sequence appears in
# ≥min_docs distinct documents. Same signal, join-shaped:
#
#   explode windows → group by window key → distinct-doc count → semi-join
#
# Scale shape: the explode multiplies rows by ~n_tokens (the same Θ(total
# tokens) working set the suffix array holds); the shuffle key is an
# 8-byte hash of the window, never the window text, and the distinct-doc
# count is a partial-aggregated groupBy — a bucket shared by d docs costs
# O(d), not O(d²) (no pair materialization anywhere).
# ---------------------------------------------------------------------------


def _span_windows(docs: DataFrame, k: int, text_col: str, portable: bool) -> DataFrame:
    """(doc_id, pos, key) — one row per k-token window; pos is the 0-based
    start-token index; key is the dedup grouping key (xxhash64 of the
    window text by default; the window TEXT itself in portable mode so
    the DuckDB oracle replays equality bit-exactly)."""
    w = docs.select(
        "doc_id", F.posexplode(shingles(F.col(text_col), k)).alias("pos", "gram")
    )
    key = F.col("gram") if portable else F.xxhash64("gram")
    return w.select("doc_id", "pos", key.alias("key"))


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, n_windows, n_dup_windows, dup_frac) — per-document
    duplicate-span statistics: how many of a doc's k-token windows occur
    verbatim in ≥``min_docs`` distinct documents. ``dup_frac`` near 1
    marks template/boilerplate documents that survive whole-doc dedup.

    Default keying hashes each window to 64 bits (collision probability
    ~m²/2⁶⁵ for m distinct windows — negligible at any corpus size that
    fits 64-bit doc ids); ``portable=True`` keys on the window text so
    the gate's DuckDB oracle matches bit-for-bit."""
    w = _span_windows(docs, k, text_col, portable)
    dup_keys = (
        w.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("key")
    )
    per_doc = (
        w.join(dup_keys, "key", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_windows"))
    )
    n_tok = F.size(tokens(F.col(text_col)))
    base = docs.select(
        "doc_id",
        F.greatest(n_tok - (k - 1), F.lit(0)).cast("bigint").alias("n_windows"),
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.when(
                F.col("n_windows") > 0,
                F.coalesce("n_dup_windows", F.lit(0)) / F.col("n_windows"),
            )
            .otherwise(0.0)
            .alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, text_clean) — drop every token covered by a duplicated
    k-window (the Lee et al. removal step: cut the shared substring out
    of all copies). Tokens outside any duplicated window keep their
    relative order; fully-boilerplate documents come back empty.

    Plan: duplicated window positions → explode to covered token indices
    (distinct) → anti-join the token table → per-doc ordered
    re-assembly (sort_array over (index, token) structs — grouped, never
    a global sort)."""
    w = _span_windows(docs, k, text_col, portable)
    dup_keys = (
        w.groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("key")
    )
    covered = (
        w.join(dup_keys, "key", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("ti"),
        )
        .distinct()
    )
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("ti", "tok")
    )
    rebuilt = (
        tok.join(covered, ["doc_id", "ti"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("text_clean")
        )
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select("doc_id", F.coalesce("text_clean", F.lit("")).alias("text_clean"))
    )


# ---------------------------------------------------------------------------
# Corpus-level line dedup (C4 span removal / RefinedWeb line-wise dedup)
# ---------------------------------------------------------------------------

def dedup_lines(
    docs: DataFrame,
    min_docs: int = 2,
    min_line_chars: int = 1,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, text_clean, n_lines, n_dup_lines) — remove every line that
    occurs verbatim (after trim) in ≥``min_docs`` DISTINCT documents: the
    C4 "discard repeated spans" rule at line granularity / RefinedWeb's
    line-wise dedup, the pass that kills boilerplate (nav bars, cookie
    banners, footers) that whole-document dedup cannot touch.

    Lines shorter than ``min_line_chars`` after trimming are never treated
    as duplicates (empty/near-empty lines are structure, not content) and
    are preserved verbatim.

    Plan: posexplode lines → key = xxhash64(trimmed line) (the trimmed
    TEXT itself in portable mode so the DuckDB oracle replays equality
    bit-exactly) → count_distinct(doc_id) per key with partial agg (a
    line shared by d docs costs O(d), never pairs) → semi-join the dup
    keys → anti-join back → per-doc ordered reassembly via
    array_sort(collect_list(struct(pos, line))) — grouped, never a global
    sort. Two shuffles total (the key agg, the reassembly groupBy);
    nothing ever materializes cross-document pairs.
    """
    trimmed = F.transform(F.split(F.col(text_col), r"\n"), lambda ln: F.trim(ln))
    lines = docs.select(
        "doc_id", F.posexplode(trimmed).alias("pos", "line")
    ).withColumn(
        "key",
        F.when(
            F.length("line") >= min_line_chars,
            F.col("line") if portable else F.xxhash64("line").cast("string"),
        ),
    )
    dup_keys = (
        lines.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("key")
    )
    flagged = lines.join(dup_keys, "key", "left_semi").select(
        "doc_id", "pos"
    ).withColumn("dup", F.lit(1))
    rebuilt = (
        lines.join(flagged, ["doc_id", "pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("dup").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
            F.count("*").alias("n_lines"),
            F.sum(F.coalesce("dup", F.lit(0))).alias("n_dup_lines"),
        )
    )
    return (
        docs.select("doc_id")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_dup_lines", F.lit(0)).cast("bigint").alias("n_dup_lines"),
        )
    )


def keep_representative(
    groups: DataFrame, prefer: DataFrame, prefer_col: str = "score"
) -> DataFrame:
    """(doc_id, group_id, keep) — re-elect each dedup group's kept copy as
    the member MAXIMIZING ``prefer_col`` (ties → min doc_id), replacing
    the default min-doc_id rule of :func:`near_duplicate_groups` /
    :func:`exact_duplicate_groups`. This is the quality-aware dedup
    decision real pipelines apply (keep the longest / highest-quality /
    most-recent copy); ``prefer`` is any (doc_id, score) table — a
    quality scorer's output, n_chars, a recency stamp.

    One join against the score table + one per-group min_by agg (map-side
    partial, no window): docs missing a score sort last."""
    j = groups.select("doc_id", "group_id").join(
        prefer.select("doc_id", F.col(prefer_col).cast("double").alias("_p")),
        "doc_id",
        "left",
    ).withColumn("_p", F.coalesce("_p", F.lit(float("-inf"))))
    rep = j.groupBy("group_id").agg(
        F.min_by(
            F.col("doc_id"), F.struct((-F.col("_p")).alias("np"), F.col("doc_id"))
        ).alias("_rep")
    )
    return j.join(rep, "group_id").select(
        "doc_id",
        "group_id",
        (F.col("doc_id") == F.col("_rep")).cast("int").alias("keep"),
    )
