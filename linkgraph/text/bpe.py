"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
application.

Classic word-level BPE (Sennrich et al. 2016; the Hugging Face
``tokenizers`` training shape): the corpus is reduced to a (word, freq)
table once, then every merge round counts freq-weighted adjacent symbol
pairs and merges the most frequent pair in all words. The reference
algorithm's priority queue becomes, per round:

    explode adjacent pairs (weighted by word freq)
      → partial+final hash-agg on (a, b)
      → top-1 (count desc, pair asc — deterministic tie-break)
      → one expression pass rewriting every word's symbol array

The state that iterates is the DISTINCT-WORD table (vocabulary-sized,
not corpus-sized — the corpus is touched exactly once), so a round costs
one shuffle over |vocab| rows regardless of corpus size; rounds are
checkpointed so the plan never grows. Merging inside a word is a single
``F.aggregate`` left fold (leftmost-non-overlapping, BPE's greedy rule)
— JVM expression, no Python.

Application (``bpe_apply``) replays the merge list per word; that is an
inherently sequential per-word loop over N merges, so it runs as an
Arrow-batched pandas UDF with per-batch word caching (the documented
exception: expressions cannot express a data-dependent loop of string
rewrites).

No end-of-word marker is appended (word-internal merges only); the
pytest oracle replays the identical pure-Python algorithm.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.text.quality import tokens


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the corpus reduced to its distinct-word table
    (lowercased, whitespace tokens; empty tokens dropped). One explode +
    one combinable count agg — the only corpus-sized pass BPE makes."""
    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Left fold merging every leftmost-non-overlapping (a, b) adjacency
    into the single symbol a+b — the BPE greedy rewrite as one JVM
    expression (no Python per row)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt) — freq-weighted adjacent CHARACTER pair counts over the
    initial (unmerged) symbol sequences: round 1 of BPE training, exposed
    for the correctness gate (pure explode + hash-agg)."""
    syms = F.split(F.col("word"), "")
    pairs = words.select(
        F.col("freq"),
        F.explode(
            F.when(
                F.size(syms) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda i: F.struct(
                        F.element_at(syms, i).alias("a"),
                        F.element_at(syms, i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("cnt")
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 100,
    min_freq: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train BPE: returns the ordered merge list [(a, b), …]. Stops early
    when no remaining pair reaches ``min_freq``. Deterministic: ties
    break on (count desc, a asc, b asc) — partitioning-invariant."""
    state = (
        word_freqs(docs, text_col)
        .select(F.split(F.col("word"), "").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = state.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        state = state.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_vocab(docs: DataFrame, merges: list, text_col: str = "text") -> DataFrame:
    """(token, freq) — the symbol vocabulary after applying ``merges``:
    every surviving symbol with its corpus frequency."""
    state = word_freqs(docs, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    )
    for i, (a, b) in enumerate(merges):
        state = state.select(
            _merge_pair_expr(F.col("syms"), a, b).alias("syms"), "freq"
        )
        # keep the expression tree bounded for long merge lists —
        # PERIODICALLY (every 8th merge), not on every iteration
        if i % 8 == 7:
            state = state.localCheckpoint(eager=True)
    return (
        state.select(F.explode("syms").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python replay of the merge list on one word — the same
    leftmost-non-overlapping greedy as _merge_pair_expr."""
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bpe_tokens array<string>) — tokenize every document with a
    trained merge list. Arrow-batched pandas UDF with per-batch word
    caching (each distinct word is merged once per batch); the merge
    list ships inside the UDF closure (broadcast-sized: N pairs)."""
    mlist = [(str(a), str(b)) for a, b in merges]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _apply_merges(w, mlist)
                    toks.extend(got)
                out.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bpe_tokens": out})

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id bigint, bpe_tokens array<string>"
    )
