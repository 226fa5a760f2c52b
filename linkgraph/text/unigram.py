"""Unigram-LM tokenizer (Kudo 2018; SentencePiece's ``--model_type=unigram``):
distributed EM training + Viterbi application.

The unigram model scores a segmentation of a word as the product of
independent piece probabilities; training alternates an E-step (expected
piece counts over all segmentations, forward-backward on each word's
segmentation lattice) with an M-step (re-normalize counts), then prunes
the vocabulary toward the target size. SentencePiece's exact pruning drops
pieces by likelihood loss; this engine prunes by expected count (always
keeping single characters for coverage) — a documented simplification with
the same fixed point on the fixtures tested.

Spark shape (the same discipline as text/bpe.py):
- the corpus is reduced ONCE to the distinct-word table (word, freq) —
  every later pass iterates model-sized or vocab-sized state;
- seed-candidate generation and counting are pure expressions (substring
  transform + explode + hash agg);
- the E-step's per-word forward-backward is a data-dependent DP no
  expression can express → Arrow-batched pandas UDF over the word table,
  current model broadcast in the closure, emitting PRE-AGGREGATED per-batch
  (piece, expected_count) partials so the shuffle is vocab-sized;
- the M-step is a driver-side renormalize of the vocab-sized count table
  (model state, not data state — same budget class as bpe_train's top-1
  collect per round).

Viterbi application pins its tie-breaks (min NLL, then smallest split
point, i.e. longest last piece) so results are partitioning-invariant and
replayable: the gate entry (``doc_unigram_pieces``) rounds piece costs to
6 decimals and is replayed exactly by a DuckDB Bellman-Ford unroll over
the position lattice (gate_sql.unigram_sql).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from linkgraph.text.bpe import word_freqs

#: characters absent from the vocabulary segment as themselves at this NLL
#: (effectively -inf probability, but keeps every word segmentable)
UNK_NLL = 1.0e6


def substring_counts(
    words: DataFrame, max_piece_len: int = 8, min_len: int = 1
) -> DataFrame:
    """(piece, cnt) — freq-weighted occurrence counts of every substring
    of length ``min_len``..``max_piece_len`` across the word table. Pure
    expressions: one position transform + explode per length, unioned,
    then a single combinable hash agg."""
    parts = []
    for plen in range(min_len, max_piece_len + 1):
        n = F.length("word")
        subs = F.when(
            n >= plen,
            F.transform(
                F.sequence(F.lit(1), n - plen + 1),
                lambda i: F.col("word").substr(i, F.lit(plen)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(words.select("freq", F.explode(subs).alias("piece")))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("piece").agg(F.sum("freq").alias("cnt"))


def seed_vocab(
    words: DataFrame, max_piece_len: int = 8, seed_size: int = 2000
) -> DataFrame:
    """(piece, logp) — the EM starting model: the ``seed_size`` multi-char
    substrings with the highest count×length score (SentencePiece's seed
    heuristic, ties on piece asc) plus ALL single characters (coverage
    guarantee), probabilities ∝ counts."""
    cnts = substring_counts(words, max_piece_len).persist()
    chars = cnts.where(F.length("piece") == 1)
    multi = (
        cnts.where(F.length("piece") >= 2)
        .orderBy(
            F.desc(F.col("cnt") * F.length("piece")), F.asc("piece")
        )
        .limit(int(seed_size))
    )
    vocab = chars.unionByName(multi)
    total = vocab.agg(F.sum("cnt")).collect()[0][0]
    out = vocab.select(
        "piece", F.log(F.col("cnt") / F.lit(float(total))).alias("logp")
    ).localCheckpoint(eager=True)
    cnts.unpersist()
    return out


def _expected_counts_batch(
    word_freq: Iterator[tuple[str, int]], model: dict[str, float], max_len: int
) -> dict[str, float]:
    """Forward-backward expected piece counts over one batch of words —
    the pure-Python kernel (also the pytest replica's core)."""
    out: dict[str, float] = {}
    for word, freq in word_freq:
        n = len(word)
        # forward[i] = total prob of segmenting word[:i]
        fwd = [0.0] * (n + 1)
        fwd[0] = 1.0
        for j in range(1, n + 1):
            s = 0.0
            for i in range(max(0, j - max_len), j):
                lp = model.get(word[i:j])
                if lp is not None and fwd[i] > 0.0:
                    s += fwd[i] * math.exp(lp)
            fwd[j] = s
        if fwd[n] <= 0.0:
            continue  # unsegmentable word (char missing) contributes nothing
        bwd = [0.0] * (n + 1)
        bwd[n] = 1.0
        for i in range(n - 1, -1, -1):
            s = 0.0
            for j in range(i + 1, min(n, i + max_len) + 1):
                lp = model.get(word[i:j])
                if lp is not None and bwd[j] > 0.0:
                    s += math.exp(lp) * bwd[j]
            bwd[i] = s
        z = fwd[n]
        for i in range(n):
            for j in range(i + 1, min(n, i + max_len) + 1):
                lp = model.get(word[i:j])
                if lp is not None:
                    e = fwd[i] * math.exp(lp) * bwd[j] / z
                    if e > 0.0:
                        out[word[i : j]] = out.get(word[i:j], 0.0) + freq * e
    return out


def expected_counts(
    words: DataFrame, model: dict[str, float], max_piece_len: int = 8
) -> DataFrame:
    """(piece, ecnt) — corpus-wide E-step: per-batch forward-backward in an
    Arrow UDF, pre-aggregated per batch, final vocab-sized hash agg."""
    mdl = dict(model)
    mx = int(max_piece_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = _expected_counts_batch(
                zip(pdf["word"], pdf["freq"]), mdl, mx
            )
            yield pd.DataFrame(
                {"piece": list(acc.keys()), "ecnt": list(acc.values())}
            )

    return (
        words.select("word", "freq")
        .mapInPandas(run, "piece string, ecnt double")
        .groupBy("piece")
        .agg(F.sum("ecnt").alias("ecnt"))
    )


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 400,
    em_iters: int = 2,
    prune_rounds: int = 3,
    prune_keep: float = 0.75,
    max_piece_len: int = 8,
    seed_size: int = 2000,
    max_word_len: int = 32,
    text_col: str = "text",
) -> dict[str, float]:
    """Train the unigram model; returns {piece: logp}. Outer loop =
    SentencePiece's schedule: ``em_iters`` EM sweeps, then prune the
    vocabulary to ``prune_keep`` of its size (by expected count, single
    chars always kept), repeating ``prune_rounds`` times or until
    ``vocab_size`` is reached, then a final EM sweep on the final vocab."""
    words = (
        word_freqs(docs, text_col)
        .where(F.length("word") <= max_word_len)
        .persist()
    )
    model = {
        r["piece"]: r["logp"]
        for r in seed_vocab(words, max_piece_len, seed_size).collect()
    }

    def em(mdl: dict[str, float], iters: int) -> dict[str, float]:
        for _ in range(iters):
            rows = expected_counts(words, mdl, max_piece_len).collect()
            ec = {r["piece"]: r["ecnt"] for r in rows}
            # pieces with zero expectation keep a floor so chars survive
            total = sum(ec.values())
            mdl = {
                p: math.log(ec[p] / total) if ec.get(p, 0.0) > 0.0 else -100.0
                for p in mdl
            }
        return mdl

    for _ in range(prune_rounds):
        model = em(model, em_iters)
        multi = sorted(
            ((p, lp) for p, lp in model.items() if len(p) >= 2),
            key=lambda x: (-x[1], x[0]),
        )
        n_chars = sum(1 for p in model if len(p) == 1)
        target_multi = max(int(vocab_size) - n_chars, 0)
        keep = max(target_multi, int(len(multi) * prune_keep))
        if keep >= len(multi):  # shrink factor stalled — jump to target
            keep = target_multi
        kept = {p for p, _ in multi[:keep]}
        model = {p: lp for p, lp in model.items() if len(p) == 1 or p in kept}
        if len(model) <= vocab_size:
            break
    model = em(model, 1)
    words.unpersist()
    return model


def viterbi_segment(
    word: str, nll: dict[str, float], max_len: int
) -> list[str]:
    """Min-NLL segmentation with pinned tie-breaks: among equal-cost
    splits prefer the smaller split point (longest last piece). Characters
    absent from the model segment as themselves at UNK_NLL. This exact
    rule is what gate_sql.unigram_sql replays."""
    n = len(word)
    dp = [0.0] + [math.inf] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        best = math.inf
        bi = j - 1
        for i in range(max(0, j - max_len), j):
            c = nll.get(word[i:j])
            if c is None:
                if j - i == 1:
                    c = UNK_NLL
                else:
                    continue
            cand = dp[i] + c
            if cand < best:
                best, bi = cand, i
        dp[j] = best
        back[j] = bi
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    return pieces[::-1]


def unigram_apply(
    docs: DataFrame,
    model: dict[str, float],
    max_piece_len: int = 8,
    text_col: str = "text",
    round_costs: int | None = None,
) -> DataFrame:
    """(doc_id, pieces array<string>) — Viterbi-tokenize every document
    (lowercased whitespace words, concatenated in order). Arrow-batched
    with per-batch word caching; the model ships in the closure.
    ``round_costs`` rounds each piece NLL to that many decimals first —
    the cross-engine determinism switch the gate uses (float ties then
    resolve identically in Spark and DuckDB)."""
    if round_costs is None:
        nll = {p: -lp for p, lp in model.items()}
    else:
        nll = {p: round(-lp, int(round_costs)) for p, lp in model.items()}
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
                        got = cache[w] = viterbi_segment(w, nll, mx)
                    toks.extend(got)
                out.append(toks)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pieces": out})

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id bigint, pieces array<string>"
    )


def unigram_segment_words(
    words: DataFrame, nll: dict[str, float], max_piece_len: int = 4
) -> DataFrame:
    """(word, pieces array<string>) — Viterbi-segment a word table against
    an explicit piece→NLL cost map (costs pre-rounded by the caller when
    cross-engine determinism matters; the gate rounds to 6dp in SQL before
    collecting). Same pinned tie-breaks as :func:`viterbi_segment`."""
    costs = {str(p): float(c) for p, c in nll.items()}
    mx = int(max_piece_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [
                        viterbi_segment(w, costs, mx) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(
        run, "word string, pieces array<string>"
    )


def corpus_nll(
    docs: DataFrame,
    model: dict[str, float],
    max_piece_len: int = 8,
    text_col: str = "text",
) -> float:
    """Total corpus NLL under Viterbi segmentation — the training quality
    scalar (EM decreases the marginal NLL; Viterbi NLL is the reported
    proxy, as in SentencePiece's trainer log). Distributed: per-word DP in
    the same Arrow kernel, one scalar agg back."""
    nll = {p: -lp for p, lp in model.items()}
    mx = int(max_piece_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tot = 0.0
            for w, f_ in zip(pdf["word"], pdf["freq"]):
                segs = viterbi_segment(w, nll, mx)
                tot += float(f_) * sum(nll.get(s, UNK_NLL) for s in segs)
            yield pd.DataFrame({"nll": [tot]})

    return (
        word_freqs(docs, text_col)
        .mapInPandas(run, "nll double")
        .agg(F.sum("nll"))
        .collect()[0][0]
    )
