"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Select raw-corpus documents that look like a small high-quality target
corpus: estimate hashed n-gram multinomial LMs of the target and the raw
source, weight every source document by its log likelihood ratio, then
Gumbel-top-k resample — sampling WITHOUT replacement proportional to
softmax(logw/T) in one distributed pass (no sequential draws).

    logw(d) = Σ_b cnt_d(b) · ( ln p_target(b) − ln p_source(b) )
    p_C(b) = (cnt_C(b) + 1) / (N_C + n_buckets)        (add-1 smoothing)

Everything is JVM expressions: token explode → bucket hash-agg for the
two LMs (each a ≤ n_buckets-row table, broadcast-join-able) → one join
back to per-doc bucket counts. The Gumbel keys are hash-derived
(xxhash64 fast path, portable md5 for the DuckDB gate), so selection is
deterministic, partitioning-invariant, and replayable. Nothing is
quadratic in the corpus and no per-row Python runs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.portable import phash
from linkgraph.text.quality import tokens


def _bucket(col: Column, n_buckets: int, portable: bool) -> Column:
    h = phash(col) if portable else F.xxhash64(col)
    return F.pmod(h, F.lit(n_buckets))


def _doc_buckets(
    docs: DataFrame, n_buckets: int, text_col: str, bigrams: bool, portable: bool
) -> DataFrame:
    """(doc_id, bucket, cnt) hashed n-gram counts per document."""
    toks = docs.select(
        "doc_id", F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != "").alias("ts")
    )
    grams = F.col("ts")
    if bigrams:
        pairs = F.zip_with(
            F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
            F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        grams = F.concat(grams, pairs)
    return (
        toks.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", _bucket(F.col("g"), n_buckets, portable).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 10_000,
    text_col: str = "text",
    bigrams: bool = False,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, logw) — importance log-weight of every ``docs`` row
    toward ``target``'s hashed n-gram distribution. Docs with no tokens
    get logw = 0 (the ratio of empty products).

    Plan: two LM aggregations (bucket-keyed, ≤ n_buckets rows each, so
    their join is broadcastable) + one per-doc bucket-count join + one
    per-doc sum. The source LM is estimated from ``docs`` itself, the
    target LM from ``target`` — pass the same frame to both to get a
    self-ratio of exactly 0 everywhere (useful as a null check)."""
    src_b = _doc_buckets(docs, n_buckets, text_col, bigrams, portable).persist()
    tgt_b = _doc_buckets(target, n_buckets, text_col, bigrams, portable)
    src_lm = src_b.groupBy("bucket").agg(F.sum("cnt").alias("sc"))
    tgt_lm = tgt_b.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    n_src = src_b.agg(F.sum("cnt")).collect()[0][0] or 0
    n_tgt = tgt_b.agg(F.sum("cnt")).collect()[0][0] or 0
    lm = (
        src_lm.join(tgt_lm, "bucket", "outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + F.lit(1.0))
                    / F.lit(float(n_tgt + n_buckets))
                )
                - F.log(
                    (F.coalesce("sc", F.lit(0)) + F.lit(1.0))
                    / F.lit(float(n_src + n_buckets))
                )
            ).alias("llr"),
        )
    )
    per_doc = (
        src_b.join(F.broadcast(lm), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("logw"))
        .localCheckpoint(eager=True)
    )
    src_b.unpersist()
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select("doc_id", F.coalesce("logw", F.lit(0.0)).alias("logw"))
    )


def dsir_sample(
    weights: DataFrame,
    k: int,
    seed: int = 42,
    temperature: float = 1.0,
    portable: bool = False,
) -> DataFrame:
    """Gumbel-top-k over (doc_id, logw) → the k selected rows plus their
    selection key. Equivalent to sampling k docs without replacement with
    probability ∝ exp(logw / temperature); temperature → 0 approaches
    deterministic top-k by weight. The Gumbel noise is hash-derived from
    (seed, doc_id): u = (h mod M + 0.5)/M, g = −ln(−ln u) — deterministic
    and identically computable by the SQL oracle. TakeOrdered top-k, no
    global sort materialization."""
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    m = 1 << 20
    h = (
        phash(F.lit(seed), F.col("doc_id"))
        if portable
        else F.xxhash64(F.lit(seed), F.col("doc_id"))
    )
    u = (F.pmod(h, F.lit(m)) + F.lit(0.5)) / F.lit(float(m))
    if temperature == 0.0:
        # the documented T→0 limit, taken exactly: deterministic top-k by
        # weight (an unguarded logw/0 aborts the job under ANSI mode)
        key = F.col("logw")
    else:
        key = F.col("logw") / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        weights.select("doc_id", "logw", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(k)
    )
