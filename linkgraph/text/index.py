"""Inverted index + TF-IDF + BM25 — the web-search scoring tier.

Public-knowledge anchors: BM25 per Robertson & Zaragoza (2009), the
Lucene-default idf variant ln(1 + (N − df + 0.5)/(df + 0.5)); TF-IDF with
the classic ln(N/df) idf. Tokenization is the engine's pinned whitespace
definition (:func:`linkgraph.text.quality.tokens`) so every score is
replayable in the DuckDB gate via string_split.

Spark shape (100-TB read): postings = one explode + one hash aggregation
on (term, doc_id) — map-side partial combine, no window. Document-
frequency and length tables are one aggregation each. Query scoring
semi-joins the postings on a BROADCAST term list (queries are tiny),
then one per-doc aggregation; nothing materializes a doc × vocab matrix.
At corpus scale the postings table is the thing you'd bucket by term
(``linkgraph.tables`` CSR-block discipline applies unchanged — term is
the block key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from linkgraph.text.quality import tokens

__all__ = ["postings", "doc_freqs", "tf_idf", "bm25"]


def _terms(docs: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    t = F.explode(tokens(F.col(text_col))).alias("term")
    out = docs.select("doc_id", t).where(F.col("term") != "")
    if lowercase:
        out = out.select("doc_id", F.lower("term").alias("term"))
    return out


def postings(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(term, doc_id, tf) — the inverted-index postings list."""
    return (
        _terms(docs, text_col, lowercase)
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def doc_freqs(post: DataFrame) -> DataFrame:
    """(term, df, total_tf) — per-term document frequency + corpus term
    frequency (the index statistics / vocabulary table)."""
    return post.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )


def tf_idf(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(doc_id, term, w) with w = tf · ln(N/df) — classic TF-IDF weights
    (natural log; terms present in every document get w = 0)."""
    post = postings(docs, text_col, lowercase)
    n = docs.count()
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    return post.join(dfreq, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.log(F.lit(float(n)) / F.col("df"))).alias("w"),
    )


def bm25(
    docs: DataFrame,
    query: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    top_k: int | None = None,
) -> DataFrame:
    """(doc_id, score) — Okapi BM25 against a fixed term query:

        score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))        (Lucene variant)

    |d| = whitespace token count (the pinned definition). Docs matching no
    query term are omitted. ``top_k`` sorts by (score desc, doc_id) and
    limits — the interactive path; leave None for the full score column.
    """
    post = postings(docs, text_col, lowercase)
    n = docs.count()
    q = sorted({t.lower() if lowercase else t for t in query})
    qdf = post.sparkSession.createDataFrame([(t,) for t in q], "term string")
    # query is tiny → broadcast semi-restriction of the postings
    qpost = post.join(F.broadcast(qdf), "term")
    dfreq = qpost.groupBy("term").agg(F.count("*").alias("df"))
    lens = docs.select(
        "doc_id",
        F.size(F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))).alias(
            "dl"
        ),
    )
    avgdl = lens.agg(F.avg("dl")).collect()[0][0] or 1.0
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        qpost.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )
    if top_k is not None:
        scored = scored.orderBy(F.desc("score"), "doc_id").limit(top_k)
    return scored
