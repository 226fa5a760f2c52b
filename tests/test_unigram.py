"""Unigram-LM tokenizer — brute-force enumeration oracles + EM behavior."""

import math
import random

from pyspark.sql import functions as F

from linkgraph.text.unigram import (
    UNK_NLL,
    corpus_nll,
    expected_counts,
    seed_vocab,
    substring_counts,
    unigram_apply,
    unigram_train,
    viterbi_segment,
)
from linkgraph.text.bpe import word_freqs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _all_segmentations(word, pieces, max_len):
    """Every segmentation of word into pieces — independent brute force."""
    if word == "":
        return [[]]
    out = []
    for ln in range(1, min(len(word), max_len) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _all_segmentations(word[ln:], pieces, max_len):
                out.append([head] + rest)
    return out


def test_substring_counts_exact(spark):
    docs = _docs(spark, ["ab ab", "abc"])
    words = word_freqs(docs)
    got = {r.piece: r.cnt for r in substring_counts(words, 3).collect()}
    # "ab" freq 2, "abc" freq 1
    assert got["a"] == 3 and got["b"] == 3 and got["c"] == 1
    assert got["ab"] == 3 and got["bc"] == 1 and got["abc"] == 1


def test_seed_vocab_coverage_and_scores(spark):
    docs = _docs(spark, ["aaab aaab aaab b"])
    words = word_freqs(docs)
    v = {r.piece: r.logp for r in seed_vocab(words, 3, seed_size=2).collect()}
    assert "a" in v and "b" in v  # all chars always present
    assert all(lp < 0 for lp in v.values())
    # probabilities normalize over the selected vocab
    assert abs(sum(math.exp(lp) for lp in v.values()) - 1.0) < 1e-9


def test_expected_counts_vs_bruteforce(spark):
    model = {
        "a": math.log(0.3),
        "b": math.log(0.2),
        "ab": math.log(0.35),
        "ba": math.log(0.15),
    }
    docs = _docs(spark, ["abab ab", "abab"])
    words = word_freqs(docs)
    got = {r.piece: r.ecnt for r in expected_counts(words, model, 2).collect()}
    # independent oracle: enumerate segmentations per word
    expect: dict = {}
    for r in words.collect():
        segs = _all_segmentations(r.word, set(model), 2)
        z = sum(math.exp(sum(model[p] for p in s)) for s in segs)
        for s in segs:
            w = math.exp(sum(model[p] for p in s)) / z
            for p in s:
                expect[p] = expect.get(p, 0.0) + r.freq * w
    assert set(got) == set(expect)
    for p in expect:
        assert abs(got[p] - expect[p]) < 1e-9, p


def test_viterbi_vs_bruteforce_random_models(spark):
    rng = random.Random(3)
    chars = "abc"
    for trial in range(20):
        pieces = set(chars)
        for _ in range(5):
            ln = rng.randint(2, 3)
            pieces.add("".join(rng.choice(chars) for _ in range(ln)))
        nll = {p: round(rng.uniform(0.5, 5.0), 3) for p in pieces}
        word = "".join(rng.choice(chars) for _ in range(rng.randint(1, 8)))
        segs = _all_segmentations(word, pieces, 3)
        best = min(sum(nll[p] for p in s) for s in segs)
        got = viterbi_segment(word, nll, 3)
        assert "".join(got) == word
        assert abs(sum(nll[p] for p in got) - best) < 1e-12


def test_viterbi_tiebreak_prefers_longest_last_piece():
    # two equal-cost splits of "ab": [a,b] (2.0) vs [ab] (2.0) — the
    # smaller split point wins, i.e. the single longer piece
    nll = {"a": 1.0, "b": 1.0, "ab": 2.0}
    assert viterbi_segment("ab", nll, 2) == ["ab"]


def test_unk_characters_segment_as_chars():
    nll = {"a": 1.0}
    assert viterbi_segment("axa", nll, 2) == ["a", "x", "a"]
    assert nll.get("x") is None  # model untouched


def test_train_learns_frequent_piece(spark):
    texts = ["walking talking making baking " * 3, "walk talk make bake"]
    docs = _docs(spark, texts)
    model = unigram_train(
        docs, vocab_size=40, em_iters=2, prune_rounds=2, max_piece_len=4,
        seed_size=60,
    )
    assert all(c in model for c in "walkingtmbe")  # char coverage survives
    # the shared suffix survives pruning and wins Viterbi
    nll = {p: -lp for p, lp in model.items()}
    segs = viterbi_segment("walking", nll, 4)
    assert any("ing" in s for s in segs)


def test_em_improves_corpus_nll(spark):
    docs = _docs(spark, ["abab abab ab", "baba ab ab"])
    words = word_freqs(docs)
    m0 = {r.piece: r.logp for r in seed_vocab(words, 3, seed_size=10).collect()}
    nll0 = corpus_nll(docs, m0, 3)
    ec = {r.piece: r.ecnt for r in expected_counts(words, m0, 3).collect()}
    tot = sum(ec.values())
    m1 = {
        p: math.log(ec[p] / tot) if ec.get(p, 0.0) > 0 else -100.0 for p in m0
    }
    nll1 = corpus_nll(docs, m1, 3)
    assert nll1 <= nll0 + 1e-9


def test_apply_roundtrip_and_determinism(spark):
    docs = _docs(spark, ["Hello World", "hello hello"])
    model = {p: math.log(1.0 / 12) for p in "helowrd"}
    model["lo"] = math.log(1.0 / 12)
    model["he"] = math.log(1.0 / 12)
    a = unigram_apply(docs, model, 2).collect()
    b = unigram_apply(docs, model, 2).collect()
    got = {r.doc_id: r.pieces for r in a}
    assert {r.doc_id: r.pieces for r in b} == got
    assert "".join(got[0]) == "helloworld"  # lowercased concatenation
    assert "".join(got[1]) == "hellohello"


def test_apply_round_costs_mode(spark):
    docs = _docs(spark, ["aa"])
    model = {"a": -1.00000049, "aa": -2.0000001}
    # rounded to 6dp: a→1.0, aa→2.0 — tie resolves to the longer piece
    got = unigram_apply(docs, model, 2, round_costs=6).collect()[0].pieces
    assert got == ["aa"]
