"""Gopher repetition rules (Rae et al. 2021) vs a pure-Python replica."""

from __future__ import annotations

from collections import Counter

import pytest

from linkgraph.text.pipeline import gopher_repetition_flags


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-gopher-rep")


def _ref(text):
    """Independent replica of the documented semantics."""
    nc = len(text)

    def seg(parts):
        parts = [p for p in parts if p != ""]
        if not parts:
            return 0.0, 0.0
        cnt = Counter(parts)
        dups = sum(c - 1 for c in cnt.values())
        dupch = sum((c - 1) * len(s) for s, c in cnt.items())
        return dups / len(parts), (dupch / nc if nc else 0.0)

    def topg(n):
        toks = [t for t in text.split(" ") if t != ""]
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        reps = {g: c for g, c in Counter(grams).items() if c > 1}
        if not reps or nc == 0:
            return 0.0
        # max count, ties -> longest gram
        c, gl = max((c, len(g)) for g, c in reps.items())
        return c * gl / nc

    lf, lcf = seg(text.split("\n"))
    pf, pcf = seg(text.split("\n\n"))
    return {
        "dup_line_frac": lf, "dup_line_char_frac": lcf,
        "dup_para_frac": pf, "dup_para_char_frac": pcf,
        "top2_char_frac": topg(2), "top3_char_frac": topg(3),
        "top4_char_frac": topg(4),
    }


DOCS = [
    (0, "nav bar\ncontent one two three\nnav bar\nmore unique text here"),
    (1, "hello world hello world hello world hello"),  # heavy 2/3-gram rep
    (2, "para one\n\npara one\n\npara two body"),
    (3, "all unique words in this single line document today"),
    (4, ""),  # empty doc
    (5, "x\n\nx\n\nx\n\nx"),  # pure paragraph repetition
    (6, "a  b   a  b"),  # multiple spaces -> empty tokens filtered
]


def test_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {r.doc_id: r.asDict() for r in gopher_repetition_flags(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _ref(text)
        for k, v in want.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-12), (doc_id, k)


def test_passes_thresholds(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {r.doc_id: r.passes for r in gopher_repetition_flags(df).collect()}
    assert got[3] is True           # clean doc passes
    assert got[4] is True           # empty doc: all fractions 0
    assert got[1] is False          # keyword stuffing: top-gram caps
    assert got[5] is False          # pure paragraph repetition


def test_top_gram_tie_longest(spark):
    # "b c" and "dd ee" both occur twice; tie -> longest gram (len 5)
    text = "b c q dd ee r b c s dd ee"
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    row = gopher_repetition_flags(df).collect()[0]
    assert row.top2_char_frac == pytest.approx(2 * 5 / len(text), abs=1e-12)
