import hashlib
import math

import pytest

from linkgraph.text.dsir import dsir_logweights, dsir_sample


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-dsir")


SRC = [
    (0, "science method and careful measurement of the data"),
    (1, "science theory with careful proofs and measurement"),
    (2, "buy cheap pills now cheap cheap deals"),
    (3, "click click free prize now"),
    (4, ""),
]
TGT = [
    (100, "science and measurement with careful method"),
    (101, "theory of measurement and data"),
]


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_logweights(src, tgt, n_buckets, bigrams=False):
    def buckets(text):
        toks = [t for t in text.lower().split(" ") if t]
        grams = list(toks)
        if bigrams:
            grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [_phash(g) % n_buckets for g in grams]

    sc, tc = {}, {}
    ns = nt = 0
    per_doc = {}
    for d, t in src:
        bs = buckets(t)
        per_doc[d] = bs
        ns += len(bs)
        for b in bs:
            sc[b] = sc.get(b, 0) + 1
    for _, t in tgt:
        bs = buckets(t)
        nt += len(bs)
        for b in bs:
            tc[b] = tc.get(b, 0) + 1
    out = {}
    for d, bs in per_doc.items():
        out[d] = sum(
            math.log((tc.get(b, 0) + 1.0) / (nt + n_buckets))
            - math.log((sc.get(b, 0) + 1.0) / (ns + n_buckets))
            for b in bs
        )
    return out


@pytest.mark.parametrize("bigrams", [False, True])
def test_python_parity_portable(spark, bigrams):
    src = spark.createDataFrame(SRC, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TGT, "doc_id bigint, text string")
    got = {
        r.doc_id: r.logw
        for r in dsir_logweights(
            src, tgt, n_buckets=512, bigrams=bigrams, portable=True
        ).collect()
    }
    want = _py_logweights(SRC, TGT, 512, bigrams=bigrams)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_target_like_docs_weigh_more(spark):
    src = spark.createDataFrame(SRC, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TGT, "doc_id bigint, text string")
    w = {r.doc_id: r.logw for r in dsir_logweights(src, tgt, 512).collect()}
    assert min(w[0], w[1]) > max(w[2], w[3])
    assert w[4] == 0.0  # empty doc: neutral


def test_self_ratio_is_zero(spark):
    src = spark.createDataFrame(SRC, "doc_id bigint, text string")
    w = {r.doc_id: r.logw for r in dsir_logweights(src, src, 512).collect()}
    assert all(v == pytest.approx(0.0, abs=1e-12) for v in w.values())


def test_gumbel_sample_deterministic_and_biased(spark):
    src = spark.createDataFrame(SRC, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TGT, "doc_id bigint, text string")
    w = dsir_logweights(src, tgt, 512)
    a = [r.doc_id for r in dsir_sample(w, 2, seed=7).collect()]
    b = [r.doc_id for r in dsir_sample(w, 2, seed=7).collect()]
    assert a == b and len(a) == 2
    # near-zero temperature → deterministic argmax by weight
    wv = {r.doc_id: r.logw for r in w.collect()}
    expect = {d for d, _ in sorted(wv.items(), key=lambda t: -t[1])[:2]}
    cold = {r.doc_id for r in dsir_sample(w, 2, seed=7, temperature=1e-9).collect()}
    assert cold == expect
    # portable keys are deterministic too and select valid rows
    p = [r.doc_id for r in dsir_sample(w, 3, seed=7, portable=True).collect()]
    assert len(set(p)) == 3 and set(p) <= {0, 1, 2, 3, 4}


def test_dsir_sample_zero_temperature_is_topk(spark):
    from linkgraph.text.dsir import dsir_sample

    w = spark.createDataFrame(
        [(i, float(-i)) for i in range(20)], "doc_id bigint, logw double"
    )
    got = [r.doc_id for r in dsir_sample(w, 5, temperature=0.0).collect()]
    assert sorted(got) == [0, 1, 2, 3, 4]  # deterministic top-k by logw
    import pytest as _pt

    with _pt.raises(ValueError):
        dsir_sample(w, 5, temperature=-1.0)
