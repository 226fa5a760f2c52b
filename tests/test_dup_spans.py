"""Duplicate-span (exact-substring) dedup — Lee et al. 2021 shape:
planted shared spans are found and removed; within-doc repetition alone
does not count; hash and portable keying agree."""

import pytest

from linkgraph.text.dedup import duplicate_spans, remove_duplicate_spans

BOILER = "all rights reserved contact us terms of service"  # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, f"unique prose about graphs and spark {BOILER}"),
        (1, f"{BOILER} plus some other unique words here"),
        (2, "completely original text with no shared spans at all present"),
        (3, "short doc"),  # below k tokens → zero windows
        (4, "echo echo echo echo echo echo echo echo echo"),  # self-repeat only
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_span_stats(docs):
    got = {r.doc_id: r for r in duplicate_spans(docs, k=8).collect()}
    # docs 0 and 1 share exactly the one 8-token boilerplate window
    assert got[0].n_dup_windows == 1 and got[1].n_dup_windows == 1
    assert got[2].n_dup_windows == 0
    assert got[3].n_windows == 0 and got[3].dup_frac == 0.0
    # 9 identical tokens → 2 windows, both duplicated WITHIN the doc only:
    # distinct-doc count is 1, so nothing is flagged
    assert got[4].n_windows == 2 and got[4].n_dup_windows == 0
    assert got[0].n_windows == len(docs.collect()[0].text.split(" ")) - 7
    assert 0.0 < got[0].dup_frac < 1.0


def test_remove_duplicate_spans(docs):
    got = {r.doc_id: r.text_clean for r in
           remove_duplicate_spans(docs, k=8).collect()}
    # the shared 8-token span is cut from BOTH copies; unique text stays
    assert got[0] == "unique prose about graphs and spark"
    assert got[1] == "plus some other unique words here"
    assert got[2] == "completely original text with no shared spans at all present"
    assert got[3] == "short doc"
    assert got[4].startswith("echo")  # self-repetition untouched
    assert BOILER not in got[0] and BOILER not in got[1]


def test_fully_boilerplate_doc_empties(spark):
    rows = [(0, BOILER), (1, BOILER), (2, "something else entirely here")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.text_clean for r in
           remove_duplicate_spans(df, k=8).collect()}
    assert got[0] == "" and got[1] == ""
    assert got[2] == "something else entirely here"


def test_min_docs_threshold(docs):
    got = {r.doc_id: r.n_dup_windows for r in
           duplicate_spans(docs, k=8, min_docs=3).collect()}
    assert all(v == 0 for v in got.values())  # only 2 copies exist


def test_portable_matches_hashed(docs):
    a = {(r.doc_id, r.n_windows, r.n_dup_windows)
         for r in duplicate_spans(docs, k=8, portable=False).collect()}
    b = {(r.doc_id, r.n_windows, r.n_dup_windows)
         for r in duplicate_spans(docs, k=8, portable=True).collect()}
    assert a == b
    ra = {r.doc_id: r.text_clean
          for r in remove_duplicate_spans(docs, k=8, portable=False).collect()}
    rb = {r.doc_id: r.text_clean
          for r in remove_duplicate_spans(docs, k=8, portable=True).collect()}
    assert ra == rb


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    from linkgraph.text.dedup import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "cookie banner here\nreal content one\nsite footer text"),
            (2, "cookie banner here\nreal content two\nsite footer text"),
            (3, "totally unique doc\n\nwith an empty line"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert got[1].text_clean == "real content one"
    assert got[2].text_clean == "real content two"
    assert (got[1].n_lines, got[1].n_dup_lines) == (3, 2)
    # unique doc untouched; empty lines are never dup keys
    assert got[3].text_clean == "totally unique doc\n\nwith an empty line"
    assert got[3].n_dup_lines == 0
    assert got[4].text_clean == "" and got[4].n_lines == 1
    # min_docs=3: the pair-shared lines survive
    got3 = {r.doc_id: r.n_dup_lines for r in dedup_lines(docs, min_docs=3).collect()}
    assert got3 == {1: 0, 2: 0, 3: 0, 4: 0}
    # portable mode is bit-identical to the fast path
    fast = {(r.doc_id, r.text_clean, r.n_lines, r.n_dup_lines)
            for r in dedup_lines(docs).collect()}
    port = {(r.doc_id, r.text_clean, r.n_lines, r.n_dup_lines)
            for r in dedup_lines(docs, portable=True).collect()}
    assert fast == port
