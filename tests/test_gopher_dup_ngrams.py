"""Gopher duplicated-5..10-gram char fractions: hand-computed interval
unions (disjoint + overlapping), caps, edge cases, and a pure-Python
interval-union replica on random docs."""

from __future__ import annotations

import random

from linkgraph.text.pipeline import (
    GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC,
    gopher_dup_ngram_fractions,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_fracs(text: str, ns=(5, 6, 7, 8, 9, 10)) -> dict:
    """Independent reference: n-gram occurrences with char offsets,
    grams with count>=2, union of their intervals."""
    toks = text.split(" ")
    starts, cum = [], 0
    for w in toks:
        starts.append(cum)
        cum += len(w) + 1
    out = {}
    for n in ns:
        occ = {}
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            occ.setdefault(g, []).append((starts[i], starts[i] + len(g)))
        ivs = sorted(
            iv for g, lst in occ.items() if len(lst) >= 2 for iv in lst
        )
        cov, cur = 0, 0
        for s, e in ivs:
            cov += max(e - max(s, cur), 0)
            cur = max(cur, e)
        out[n] = cov / len(text) if text else 0.0
    return out


def test_disjoint_repeat_exact(spark):
    text = "a b c d e a b c d e"  # the 5-gram repeats, occurrences disjoint
    row = gopher_dup_ngram_fractions(_docs(spark, [(1, text)])).collect()[0]
    assert abs(row["dup5_char_frac"] - 18 / 19) < 1e-12
    for n in (6, 7, 8, 9, 10):
        assert row[f"dup{n}_char_frac"] == 0.0
    assert not row["passes"]


def test_overlapping_occurrences_counted_once(spark):
    text = "x x x x x x"  # 5-grams at i=0,1 are identical and overlap
    row = gopher_dup_ngram_fractions(_docs(spark, [(1, text)])).collect()[0]
    assert row["dup5_char_frac"] == 1.0  # union [0,9)∪[2,11) = all 11 chars


def test_clean_short_empty(spark):
    rows = [(1, "all tokens here are completely distinct words now"),
            (2, "too short"), (3, "")]
    out = {r["doc_id"]: r for r in
           gopher_dup_ngram_fractions(_docs(spark, rows)).collect()}
    for d in (1, 2, 3):
        assert out[d]["passes"]
        for n in (5, 6, 7, 8, 9, 10):
            assert out[d][f"dup{n}_char_frac"] == 0.0


def test_matches_python_replica_on_random_docs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(30):
        # small vocab forces plenty of repeated long grams
        toks = [rng.choice("abcdef") for _ in range(rng.randint(0, 60))]
        rows.append((i, " ".join(toks)))
    got = {r["doc_id"]: r for r in
           gopher_dup_ngram_fractions(_docs(spark, rows)).collect()}
    for i, text in rows:
        want = _py_fracs(text)
        for n in (5, 6, 7, 8, 9, 10):
            assert abs(got[i][f"dup{n}_char_frac"] - want[n]) < 1e-9, (i, n)


def test_caps_table():
    assert GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC == {
        5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10
    }
