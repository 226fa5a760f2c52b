import math

import pytest

from linkgraph.text.index import bm25, doc_freqs, postings, tf_idf


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-index")


DOCS = [
    (0, "spark joins hash Hash tables"),
    (1, "spark spark spark"),
    (2, "sort merge joins beat hash joins sometimes"),
    (3, "unrelated words entirely"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").persist()


def test_postings(docs):
    got = {(r.term, r.doc_id): r.tf for r in postings(docs).collect()}
    assert got[("hash", 0)] == 2  # lowercase folds Hash+hash
    assert got[("spark", 1)] == 3
    assert got[("joins", 2)] == 2
    assert ("beat", 2) in got and got[("beat", 2)] == 1
    # case preserved when lowercase=False
    raw = {(r.term, r.doc_id): r.tf for r in postings(docs, lowercase=False).collect()}
    assert raw[("Hash", 0)] == 1 and raw[("hash", 0)] == 1


def test_doc_freqs(docs):
    got = {r.term: (r.df, r.total_tf) for r in doc_freqs(postings(docs)).collect()}
    assert got["spark"] == (2, 4)
    assert got["hash"] == (2, 3)
    assert got["joins"] == (2, 3)


def test_tf_idf(docs):
    got = {(r.doc_id, r.term): r.w for r in tf_idf(docs).collect()}
    # tf=3, df=2, N=4 → 3·ln(2)
    assert got[(1, "spark")] == pytest.approx(3 * math.log(2), abs=1e-12)
    assert got[(0, "hash")] == pytest.approx(2 * math.log(2), abs=1e-12)
    # term in one doc: ln(4)
    assert got[(3, "unrelated")] == pytest.approx(math.log(4), abs=1e-12)


def _bm25_ref(query, k1=1.2, b=0.75):
    toks = [d[1].lower().split() for d in DOCS]
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks) / n
    scores = {}
    for t in set(query):
        df = sum(1 for d in toks if t in d)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(toks):
            tf = d.count(t)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return scores


def test_bm25_matches_reference(docs):
    q = ["hash", "spark"]
    got = {r.doc_id: r.score for r in bm25(docs, q).collect()}
    exp = _bm25_ref(q)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-12), i


def test_bm25_top_k(docs):
    q = ["joins"]
    rows = bm25(docs, q, top_k=1).collect()
    assert len(rows) == 1
    exp = _bm25_ref(q)
    assert rows[0].doc_id == max(exp, key=lambda i: (exp[i], -i))


def test_bm25_no_match(docs):
    assert bm25(docs, ["zzz"]).count() == 0
