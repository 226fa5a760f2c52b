"""Bloom-filter dedup screen — memory-bounded membership over text units.

The Dolma pipeline (Soldaini et al. 2024) dedups paragraphs against a
Bloom filter instead of materializing a paragraph-hash table: the filter
is a fixed ``m_bits``-bit array, so screening a new crawl snapshot against
everything already ingested costs O(filter) memory regardless of corpus
size — the standard incremental-ingest shape (build once on the retained
corpus, probe every new snapshot). False positives (rate ≈
``(1 - e^{-k·n/m})^k``) drop a few extra units; false negatives are
impossible, which is the right asymmetry for a dedup screen.

Spark formulation — JVM bitwise expressions only, no UDFs:

- build: explode units → k hash positions each (``xxhash64(unit, i)``,
  or the portable md5 ``phash`` for DuckDB replay) → one ``bit_or``
  hash-agg keyed by 62-bit word index. The filter IS a DataFrame
  ``(word_idx, bits)`` of at most ``m_bits/62`` rows — 1 GiB of filter
  is ~138 M rows of 16 bytes, but the defaults (2^23 bits = 135 K rows
  ≈ 2 MiB) broadcast.
- probe: explode units → k (word_idx, mask) lookups → broadcast join
  against the filter → a unit is "seen" iff ALL k bits are set
  (``bool_and``) → per-doc dup fraction. One broadcast join + two
  partial-combine aggs; nothing is O(corpus²).

Word size is 62 bits, not 64: masks stay positive BIGINTs on both Spark
and DuckDB, so the portable replay never touches sign-bit semantics.

At 100 TB: the filter rows are tiny and static — build once, persist;
probing shuffles only (doc_id, unit) exploded rows with map-side
partial aggregation on the doc key. For filters too big to broadcast,
the same plan degrades gracefully to a shuffle hash join on word_idx
(drop the broadcast hint) — word indices are uniform by construction,
so there is no skew to handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.portable import phash
from linkgraph.text.quality import shingles

_WORD_BITS = 62

DEFAULT_M_BITS = 1 << 23
DEFAULT_K = 4


def _unit_col(text: F.Column, unit: str, ngram_n: int) -> F.Column:
    """Array of text units: 'paragraph' (split blank line), 'line',
    'doc' (whole text), or 'ngram' (word n-grams — the decontamination
    screen unit). Empty segments are structure, not content."""
    if unit == "doc":
        return F.array(text)
    if unit == "ngram":
        return shingles(text, ngram_n)
    sep = {"paragraph": "\n\n", "line": "\n"}[unit]
    return F.filter(F.split(text, sep, -1), lambda x: x != F.lit(""))


def _positions(df: DataFrame, m_bits: int, k: int, portable: bool) -> DataFrame:
    """Explode k hash positions per unit row; adds word_idx + mask."""
    h = phash(F.col("u"), F.col("i")) if portable else F.xxhash64("u", "i")
    return (
        df.select(
            "*", F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("i")
        )
        .withColumn("pos", F.pmod(h, F.lit(m_bits)))
        .withColumn("word_idx", F.expr(f"pos DIV {_WORD_BITS}"))
        .withColumn(
            "mask",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"),
        )
        .drop("i", "pos")
    )


def bloom_build(
    docs: DataFrame,
    text_col: str = "text",
    unit: str = "paragraph",
    ngram_n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    portable: bool = False,
) -> DataFrame:
    """Build the filter: ``(word_idx, bits)`` with only the non-zero
    words materialized (absent word_idx ≡ all-zero word). One explode +
    one bit_or hash-agg; duplicates among build units are free."""
    units = docs.select(F.explode(_unit_col(F.col(text_col), unit, ngram_n)).alias("u"))
    return (
        _positions(units, m_bits, k, portable)
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    unit: str = "paragraph",
    ngram_n: int = 8,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    portable: bool = False,
    broadcast_filter: bool = True,
) -> DataFrame:
    """(doc_id, n_units, n_dup_units, dup_frac) per probed doc — a unit
    counts as duplicate iff all k of its bits are set in ``bloom``
    (occurrences counted separately: a paragraph repeated twice in the
    probe doc is two units). Docs with no units report (0, 0, 0.0).

    ``unit``/``ngram_n``/``m_bits``/``k``/``portable`` MUST match the
    build call — the filter is only meaningful under its own hash family.
    """
    base = docs.select(F.col(doc_col).alias("doc_id"), F.col(text_col).alias("_t"))
    units = base.select(
        "doc_id",
        F.posexplode(_unit_col(F.col("_t"), unit, ngram_n)).alias("uidx", "u"),
    )
    flt = F.broadcast(bloom) if broadcast_filter else bloom
    hits = (
        _positions(units, m_bits, k, portable)
        .join(flt, "word_idx", "left")
        .select(
            "doc_id",
            "uidx",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
            ).alias("hit"),
        )
    )
    per_unit = hits.groupBy("doc_id", "uidx").agg(F.bool_and("hit").alias("present"))
    per_doc = per_unit.groupBy("doc_id").agg(
        F.count("*").alias("n_units"),
        F.sum(F.col("present").cast("bigint")).alias("n_dup_units"),
    )
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_units", F.lit(0)).alias("n_units"),
            F.coalesce("n_dup_units", F.lit(0)).alias("n_dup_units"),
            F.when(
                F.coalesce("n_units", F.lit(0)) > 0,
                F.col("n_dup_units") / F.col("n_units"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def bloom_dedup_flags(
    docs: DataFrame,
    prior: DataFrame,
    threshold: float = 0.8,
    **kw,
) -> DataFrame:
    """Incremental-snapshot screen: flag each doc of ``docs`` whose unit
    dup fraction against a filter built from ``prior`` reaches
    ``threshold``. Returns (doc_id, n_units, n_dup_units, dup_frac, keep);
    ``keep`` is the admission decision (False = screened out)."""
    # strip probe-only kwargs before the build call (broadcast_filter and
    # doc_col belong to bloom_probe; forwarding them crashed the
    # documented at-scale broadcast_filter=False path)
    probe_only = {"doc_col", "broadcast_filter"}
    flt = bloom_build(prior, **{k: v for k, v in kw.items() if k not in probe_only})
    probed = bloom_probe(docs, flt, **kw)
    return probed.withColumn("keep", F.col("dup_frac") < F.lit(float(threshold)))


def bloom_fpp(m_bits: int, k: int, n_inserted: int) -> float:
    """Theoretical false-positive probability (1 - e^{-kn/m})^k — the
    sizing aid: pick m_bits so this stays below the tolerable loss rate."""
    import math

    if m_bits <= 0 or n_inserted <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n_inserted / m_bits)) ** k
