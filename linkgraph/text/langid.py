"""Trained character-n-gram language identification.

Multinomial Naive Bayes over character n-gram counts — the supervised
(fastText/cld3-shaped) upgrade over the marker-word heuristic in
``quality.py::language_id``. Public-knowledge model: Cavnar & Trenkle
(1994) n-gram text categorization + McCallum & Nigam (1998) multinomial
NB with add-alpha smoothing. Engine extra (the reference has no text
ops); it slots into the crawl pipeline between extraction and the
quality filters.

Scale shape (100-TB reading):

- training: one explode over the labeled sample, two hash aggregations
  with map-side partial combine (shuffle bounded by distinct
  (lang, gram), not by corpus size), one global top-V selection via
  TakeOrdered (no single-partition window);
- the fitted model is dense V×L rows (vocab_size × #languages — a few
  thousand rows), ALWAYS broadcastable;
- inference: one explode + per-(doc, gram) count agg + one BROADCAST
  join against the model + one (doc × L) aggregation. No per-row Python
  UDFs anywhere — every step is a JVM expression.

Cross-engine determinism: model log-probs, priors, and OOV mass are
rounded to 6 decimals (the PQ/ADC discipline, text/pq.py) so the DuckDB
oracle replays scoring comparably; prediction ties break on the
lexicographically smallest language code.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


def _normalize(text: Column) -> Column:
    """Lowercase + collapse runs of whitespace to single spaces + trim.

    Kept to operations with identical semantics in Spark and DuckDB so
    the oracle replays the exact gram stream.
    """
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Array of overlapping character n-grams of the NORMALIZED text.

    Guarded sequence (the shingles discipline, quality.py::shingles):
    ``F.sequence(1, m)`` would descend for m < 1, so short/empty texts
    return an explicit empty array.
    """
    t = _normalize(text)
    m = F.length(t) - (n - 1)
    return F.when(
        m >= 1,
        F.transform(F.sequence(F.lit(1), m), lambda i: F.substring(t, i, n)),
    ).otherwise(F.array().cast("array<string>"))


@dataclass
class LangIdModel:
    """Fitted NB model: ``grams`` is the dense (lang, gram, logp) table
    (V×L rows), ``langs`` carries per-language (lang, prior_lp, oov_lp).
    Both are small enough to broadcast by construction."""

    grams: DataFrame
    langs: DataFrame
    n: int


def train_langid(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n: int = 3,
    vocab_size: int = 2000,
    alpha: float = 1.0,
) -> LangIdModel:
    """Fit multinomial NB on labeled documents.

    Vocabulary = the ``vocab_size`` globally most frequent grams
    (ties broken lexicographically — deterministic across partitionings).
    Smoothed estimates use V+1 outcomes (the +1 is the out-of-vocabulary
    pseudo-gram, so OOV grams carry mass instead of being dropped):

        logp(g|l)  = ln((c_{l,g} + alpha) / (T_l + alpha·(V+1)))
        oov_lp(l)  = ln(alpha / (T_l + alpha·(V+1)))
        prior_lp(l)= ln(docs_l / docs_total)
    """
    labeled = docs.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("lang"), F.col(text_col).alias("_t")
    )
    grams = labeled.select(
        "lang", F.explode(char_ngrams(F.col("_t"), n)).alias("gram")
    )
    gcnt = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    vocab = (
        gcnt.groupBy("gram")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.desc("tot"), F.asc("gram"))
        .limit(vocab_size)
        .select("gram")
    )
    v = vocab.count()  # actual vocabulary size (≤ vocab_size); model scalar

    # per-language gram mass counted over the vocabulary only (OOV grams
    # are represented by the +1 pseudo-outcome, not by T_l)
    tl = (
        gcnt.join(F.broadcast(vocab), "gram")
        .groupBy("lang")
        .agg(F.sum("c").alias("t_mass"))
    )
    d_total = labeled.count()
    pri = labeled.groupBy("lang").agg(
        F.round(F.log(F.count(F.lit(1)) / F.lit(float(d_total))), 6).alias("prior_lp")
    )
    denom = F.col("t_mass") + F.lit(alpha) * F.lit(float(v + 1))
    langs = tl.join(pri, "lang").select(
        "lang",
        "prior_lp",
        F.round(F.log(F.lit(alpha) / denom), 6).alias("oov_lp"),
        "t_mass",
    )
    dense = (
        langs.select("lang", "t_mass")
        .crossJoin(F.broadcast(vocab))
        .join(gcnt, ["lang", "gram"], "left")
        .select(
            "lang",
            "gram",
            F.round(
                F.log((F.coalesce("c", F.lit(0.0)) + F.lit(alpha)) / denom), 6
            ).alias("logp"),
        )
    )
    return LangIdModel(dense, langs.select("lang", "prior_lp", "oov_lp"), n)


def classify_language(
    docs: DataFrame,
    model: LangIdModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, lang_pred, score) — argmax NB log-posterior per document.

    score(d, l) = prior_lp(l) + Σ_{g∈vocab} cnt(d,g)·logp(l,g)
                + (|grams(d)| − matched(d))·oov_lp(l)

    Documents with no grams at all (empty/too-short text) fall back to
    the prior argmax. Ties break on the smallest language code (min_by
    over (−score, lang) — deterministic, partition-order independent).
    """
    ga = char_ngrams(F.col(text_col), model.n)
    base = docs.select(F.col(id_col).alias("_id"), F.size(ga).alias("n_grams"))
    cnts = (
        docs.select(F.col(id_col).alias("_id"), F.explode(ga).alias("gram"))
        .groupBy("_id", "gram")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    matched = (
        cnts.join(F.broadcast(model.grams), "gram")
        .groupBy("_id", "lang")
        .agg(
            F.sum(F.col("cnt") * F.col("logp")).alias("s_match"),
            F.sum("cnt").alias("c_match"),
        )
    )
    scored = (
        base.crossJoin(F.broadcast(model.langs))
        .join(matched, ["_id", "lang"], "left")
        .select(
            "_id",
            "lang",
            (
                F.col("prior_lp")
                + F.coalesce("s_match", F.lit(0.0))
                + (F.col("n_grams") - F.coalesce("c_match", F.lit(0.0)))
                * F.col("oov_lp")
            ).alias("score"),
        )
    )
    return scored.groupBy("_id").agg(
        F.min_by("lang", F.struct(-F.col("score"), F.col("lang"))).alias("lang_pred"),
        F.round(F.max("score"), 6).alias("score"),
    ).select(F.col("_id").alias(id_col), "lang_pred", "score")
