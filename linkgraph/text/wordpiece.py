"""WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer):
likelihood-scored merge training + greedy longest-match-first application.

Completes the engine's tokenizer family — BPE (text/bpe.py, frequency-max
merges), unigram-LM (text/unigram.py, EM + Viterbi), WordPiece (this
module). Training is the BPE loop with a different objective: each round
merges the adjacent symbol pair maximizing the likelihood ratio
count(ab) / (count(a) · count(b)) (the published WordPiece criterion —
prefers pairs that co-occur more than their parts predict, not just
frequent pairs). Application is greedy longest-match-first with the
``##`` continuation-prefix convention and ``[UNK]`` on unmatchable words.

Spark shape: identical discipline to text/bpe.py — the corpus reduces
once to the distinct-word table; every training round is one adjacency
explode + two hash aggs (pair counts and symbol counts) + a top-1; the
rewrite is the same JVM left-fold expression. Application is an
Arrow-batched pandas UDF with per-batch word caching (data-dependent
loop). The greedy matcher, unlike BPE/unigram application, is also
SQL-replayable (a pointer walk, not a DP) — gate entry
``doc_wordpiece_pieces`` replays it in DuckDB over an SQL-derived vocab.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from linkgraph.text.bpe import word_freqs


def _initial_syms(word_col) -> F.Column:
    """Char symbols with the ## continuation prefix on non-initial
    positions — WordPiece's working alphabet."""
    chars = F.split(word_col, "")
    return F.transform(
        chars, lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c))
    )


def wordpiece_train(
    docs: DataFrame,
    n_merges: int = 100,
    min_freq: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train WordPiece: ordered merge list [(a, b), …] over ##-prefixed
    symbols (merging ("a", "##b") yields "ab"; ("##a", "##b") yields
    "##ab"). Each round's winner maximizes count(ab)/(count(a)·count(b)),
    ties on (a asc, b asc); stops early when no pair reaches
    ``min_freq``. Deterministic and partitioning-invariant."""
    state = (
        word_freqs(docs, text_col)
        .select(_initial_syms(F.col("word")).alias("syms"), "freq")
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
        # min_freq gates CANDIDACY (as in the reference trainer), not the
        # stop condition — otherwise a count-1 exclusive pair (score 1.0)
        # tops the ranking and falsely ends training
        pc = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .where(F.col("cnt") >= int(min_freq))
        )
        sc = (
            state.select("freq", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("freq").alias("scnt"))
        )
        top = (
            pc.join(sc.withColumnRenamed("s", "a").withColumnRenamed("scnt", "ca"), "a")
            .join(sc.withColumnRenamed("s", "b").withColumnRenamed("scnt", "cb"), "b")
            .select(
                "a",
                "b",
                "cnt",
                (F.col("cnt") / (F.col("ca") * F.col("cb"))).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = a + (b[2:] if b.startswith("##") else b)
        state = state.select(
            _rewrite_expr(F.col("syms"), a, b, merged).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def _rewrite_expr(syms, a: str, b: str, merged: str):
    """The BPE left-fold rewrite with an explicit merged symbol (WordPiece
    strips b's ## prefix on concatenation)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def wordpiece_vocab(
    docs: DataFrame, merges: list, text_col: str = "text"
) -> set[str]:
    """The piece vocabulary a merge list induces: every surviving symbol
    across the corpus (##-prefixed for continuations) — what
    :func:`wordpiece_apply` consumes."""
    state = word_freqs(docs, text_col).select(
        _initial_syms(F.col("word")).alias("syms")
    )
    for i, (a, b) in enumerate(merges):
        merged = a + (b[2:] if b.startswith("##") else b)
        state = state.select(_rewrite_expr(F.col("syms"), a, b, merged).alias("syms"))
        if i % 8 == 7:  # periodic plan-growth bound, not every merge
            state = state.localCheckpoint(eager=True)
    return {r.s for r in state.select(F.explode("syms").alias("s")).distinct().collect()}


def greedy_segment(
    word: str, vocab: set[str], max_piece_len: int, unk: str = "[UNK]"
) -> list[str]:
    """Greedy longest-match-first (the BERT WordPiece matcher): at each
    position take the LONGEST vocab piece (##-prefixed after the first)
    matching the remaining text; if none matches, the whole word is
    ``unk`` (reference behavior — no partial output)."""
    out: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        hit = None
        for ln in range(min(max_piece_len, n - pos), 0, -1):
            cand = word[pos : pos + ln]
            key = cand if pos == 0 else "##" + cand
            if key in vocab:
                hit = key
                break
        if hit is None:
            return [unk]
        out.append(hit)
        pos += len(hit) - 2 if hit.startswith("##") else len(hit)
    return out


def wordpiece_apply(
    docs: DataFrame,
    vocab: set[str],
    max_piece_len: int = 16,
    unk: str = "[UNK]",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces array<string>) — greedy-tokenize every document
    (lowercased whitespace words, concatenated in order). Arrow-batched
    with per-batch word caching; the vocab set ships in the closure."""
    vset = {str(v) for v in vocab}
    mx = int(max_piece_len)

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
                        got = cache[w] = greedy_segment(w, vset, mx, unk)
                    toks.extend(got)
                out.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pieces": out})

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id bigint, pieces array<string>"
    )


def wordpiece_segment_words(
    words: DataFrame, vocab: set[str], max_piece_len: int = 4,
    unk: str = "[UNK]",
) -> DataFrame:
    """(word, pieces array<string>) — greedy-segment a word table (the
    gate-oracle entry point; gate_sql.wordpiece_sql replays the pointer
    walk exactly)."""
    vset = {str(v) for v in vocab}
    mx = int(max_piece_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [
                        greedy_segment(w, vset, mx, unk) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(
        run, "word string, pieces array<string>"
    )
