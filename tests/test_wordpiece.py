"""WordPiece — pure-Python training replica + greedy matcher contracts."""

from collections import Counter

from linkgraph.text.bpe import word_freqs
from linkgraph.text.wordpiece import (
    greedy_segment,
    wordpiece_apply,
    wordpiece_train,
    wordpiece_vocab,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _replica_train(wf, n_merges, min_freq):
    """Independent pure-Python WordPiece trainer (same objective/ties)."""

    def syms_of(w):
        return tuple([w[0]] + ["##" + c for c in w[1:]])

    state = {syms_of(w): f for w, f in wf.items()}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for syms, f in state.items():
            for s in syms:
                sc[s] += f
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        elig = {ab: c for ab, c in pc.items() if c >= min_freq}
        if not elig:
            break
        best = min(
            elig, key=lambda ab: (-(pc[ab] / (sc[ab[0]] * sc[ab[1]])), ab[0], ab[1])
        )
        a, b = best
        merges.append((a, b))
        merged = a + (b[2:] if b.startswith("##") else b)
        new = {}
        for syms, f in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        state = new
    return merges


def test_train_matches_replica(spark):
    texts = ["the thin thing then " * 3, "other rather than that", "zz qq"]
    docs = _docs(spark, texts)
    wf = {r.word: r.freq for r in word_freqs(docs).collect()}
    got = wordpiece_train(docs, n_merges=6, min_freq=2)
    assert got == _replica_train(wf, 6, 2)
    assert len(got) == 6


def test_train_likelihood_beats_frequency(spark):
    # "ab" appears 4×; "xq" appears 2× but x and q appear ONLY together →
    # likelihood score(x,##q)=1/(2·2) > score(a,##b)=4/(6·4): WordPiece
    # merges the exclusive pair first, BPE would merge the frequent one
    docs = _docs(spark, ["ab ab ab ab xq xq", "ac bd"])
    got = wordpiece_train(docs, n_merges=1, min_freq=2)
    assert got == [("x", "##q")]


def test_greedy_segment_contract():
    vocab = {"un", "##aff", "##able", "u", "n", "a", "##a", "##f", "##b", "##l", "##e"}
    assert greedy_segment("unaffable", vocab, 5) == ["un", "##aff", "##able"]
    # no match at position → whole word collapses to [UNK]
    assert greedy_segment("zzz", vocab, 5) == ["[UNK]"]
    # longest-match preference: "un" chosen over "u"
    assert greedy_segment("un", vocab, 5) == ["un"]


def test_apply_and_vocab_roundtrip(spark):
    docs = _docs(spark, ["banana bandana " * 4])
    merges = wordpiece_train(docs, n_merges=8, min_freq=2)
    vocab = wordpiece_vocab(docs, merges)
    toks = {r.doc_id: r.pieces for r in wordpiece_apply(docs, vocab).collect()}
    joined = "".join(p[2:] if p.startswith("##") else p for p in toks[0])
    assert joined == "bananabandana" * 4
    again = {r.doc_id: r.pieces for r in wordpiece_apply(docs, vocab).collect()}
    assert again == toks
