"""Distributed BPE training vs an independent pure-Python reference:
identical merge sequences, vocabularies, and tokenizations."""

import pytest

from linkgraph.text.bpe import (
    bpe_apply,
    bpe_pair_counts,
    bpe_train,
    bpe_vocab,
    word_freqs,
)


def ref_train(word_freq: dict, n_merges: int, min_freq: int):
    """Independent pure-Python BPE (Sennrich et al.): overlapping adjacent
    pair counts, merge best (count desc, pair asc), leftmost-greedy
    rewrite."""
    words = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, f in word_freq.items():
            s = words[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append(best)
        a, b = best
        for w, s in words.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges, words


CORPUS = [
    (0, "low lower lowest"),
    (1, "new newer newest newest"),
    (2, "low low new wider wide"),
    (3, "the newest lower the the"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def py_word_freq():
    wf: dict = {}
    for _, t in CORPUS:
        for w in t.lower().split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def test_word_freqs(docs):
    got = {r.word: r.freq for r in word_freqs(docs).collect()}
    assert got == py_word_freq()


def test_pair_counts_round1(docs):
    wf = py_word_freq()
    want: dict = {}
    for w, f in wf.items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] = want.get((w[i], w[i + 1]), 0) + f
    got = {(r.a, r.b): r.cnt for r in bpe_pair_counts(word_freqs(docs)).collect()}
    assert got == want


def test_train_matches_reference(docs):
    merges = bpe_train(docs, n_merges=12, min_freq=2)
    want, ref_words = ref_train(py_word_freq(), 12, 2)
    assert merges == want
    assert len(merges) >= 5  # corpus has real merge structure
    # vocabulary after the merges matches the reference symbol counts
    vocab = {r.token: r.freq for r in bpe_vocab(docs, merges).collect()}
    ref_vocab: dict = {}
    for w, f in py_word_freq().items():
        for s in ref_words[w]:
            ref_vocab[s] = ref_vocab.get(s, 0) + f
    assert vocab == ref_vocab


def test_apply_matches_reference(docs):
    merges = bpe_train(docs, n_merges=12, min_freq=2)
    _, ref_words = ref_train(py_word_freq(), 12, 2)
    got = {r.doc_id: list(r.bpe_tokens) for r in bpe_apply(docs, merges).collect()}
    for doc_id, text in CORPUS:
        want = [s for w in text.lower().split(" ") if w for s in ref_words[w]]
        assert got[doc_id] == want


def test_min_freq_stops_early(docs):
    # min_freq above every pair count → no merges, apply = characters
    merges = bpe_train(docs, n_merges=5, min_freq=10_000)
    assert merges == []
    got = bpe_apply(docs, merges).where("doc_id = 0").collect()[0]
    assert list(got.bpe_tokens) == list("low") + list("lower") + list("lowest")


def test_determinism(docs):
    a = bpe_train(docs, n_merges=8, min_freq=2)
    b = bpe_train(docs, n_merges=8, min_freq=2)
    assert a == b
