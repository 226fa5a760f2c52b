"""Text pipeline: dedup (exact/ngram/minhash/simhash), quality, lang-id,
fingerprints — against hand-built documents with known relationships."""

import pytest
from pyspark.sql import functions as F

from linkgraph.text.dedup import (
    deduplicate_exact,
    exact_duplicate_groups,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from linkgraph.text.quality import (
    bpe_ish_token_count,
    fingerprints,
    language_id,
    quality_scores,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    near = "the quick brown fox jumps over the lazy dog near the old river bank now"
    rows = [
        (0, base, "en"),
        (1, base, "en"),                      # exact dup of 0
        (2, near, "en"),                      # near dup of 0 (1 word differs)
        (3, "der hund und die katze sind im haus und das ist gut", "de"),
        (4, "completely different text about spark dataframes and shuffles", "en"),
        (5, "el gato y el perro que viven en la casa grande es bonito", "es"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_exact_duplicates(docs):
    groups = exact_duplicate_groups(docs).collect()
    assert {(r.group_id, r.doc_id) for r in groups} == {(0, 0), (0, 1)}
    kept = deduplicate_exact(docs)
    assert kept.count() == 5
    assert kept.where("doc_id = 1").count() == 0  # min-id representative wins


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_minhash_estimates_jaccard(docs):
    sigs = {r.doc_id: r.sig for r in minhash_signatures(docs, num_hashes=64).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    est_02 = sum(a == b for a, b in zip(sigs[0], sigs[2])) / 64
    assert est_02 > 0.4  # true jaccard ~0.76 on 3-shingles
    est_04 = sum(a == b for a, b in zip(sigs[0], sigs[4])) / 64
    assert est_04 < 0.2


def test_minhash_lsh_pipeline(docs):
    pairs = {(r.a, r.b) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (0, 4) not in pairs


def test_simhash(docs):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    near = {(r.a, r.b): r.hamming for r in simhash_near_duplicates(docs, max_hamming=10).collect()}
    assert near[(0, 1)] == 0
    assert (0, 2) in near  # near-dup within 10 bits
    assert (0, 4) not in near


def test_token_counts(docs):
    tc = {r.doc_id: r.n_tokens for r in token_count(docs).collect()}
    assert tc[0] == 15
    sub = {r.doc_id: r.n_subtokens for r in bpe_ish_token_count(docs).collect()}
    assert sub[0] >= tc[0]


def test_quality_scores(docs):
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert q[0].n_tokens == 15
    assert abs(q[0].stopword_ratio - 3 / 15) < 1e-9  # 'the' x3
    assert q[0].quality > 0


def test_language_id(docs):
    pred = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert pred[0] == "en" and pred[3] == "de" and pred[5] == "es"


def test_fingerprints_overlap(docs):
    fp = fingerprints(docs, k=3, window=4)
    by_doc = {
        r.doc_id: set(x.fingerprint for x in fp.where(F.col("doc_id") == r.doc_id).collect())
        for r in fp.select("doc_id").distinct().collect()
    }
    assert by_doc[0] == by_doc[1]
    inter = len(by_doc[0] & by_doc[2]) / max(len(by_doc[0] | by_doc[2]), 1)
    assert inter > 0.4  # near-dups share most winnowed fingerprints
    assert len(by_doc[0] & by_doc[4]) == 0


def test_unigram_logloss_hand_oracle(spark):
    import math

    from linkgraph.text.quality import unigram_logloss

    rows = [(0, "a a b"), (1, "a c"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # corpus tokens: a a b a c → N=5; p(a)=3/5, p(b)=1/5, p(c)=1/5
    got = {r.doc_id: r for r in unigram_logloss(df).collect()}
    la = -math.log(3 / 5)
    lb = -math.log(1 / 5)
    assert got[0].n_tokens == 3
    assert got[0].logloss == pytest.approx((2 * la + lb) / 3)
    assert got[1].n_tokens == 2
    assert got[1].logloss == pytest.approx((la + lb) / 2)
    assert got[2].n_tokens == 0 and got[2].logloss == 0.0
    # gibberish (rare tokens) scores strictly worse than common text
    rows2 = [(0, "the the the the"), (1, "zxqv kjhw pqrs mnbv")]
    df2 = spark.createDataFrame(rows2, "doc_id bigint, text string")
    got2 = {r.doc_id: r.logloss for r in unigram_logloss(df2).collect()}
    assert got2[1] > got2[0]


def test_perplexity_buckets(spark):
    """CCNet head/middle/tail: common-vocabulary docs score low (head),
    rare-token soup scores high (tail), empties are tail by fiat."""
    from linkgraph.text.quality import perplexity_buckets, unigram_logloss

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "the cat sat near a mat"),
        (4, "zqx jvw plk qqq zzz xxx"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ll = {r.doc_id: r.logloss for r in unigram_logloss(df).collect()}
    # thresholds straddle the fluent docs and the gibberish doc
    t1 = ll[3] + 1e-9   # docs 1,2 (most common tokens) < doc 3 ≤ t1
    t2 = ll[4] - 1e-9
    out = {r.doc_id: r.bucket for r in
           perplexity_buckets(df, (t1, t2)).collect()}
    assert out[1] == "head" and out[2] == "head" and out[3] == "head"
    assert out[4] == "tail"
    assert out[5] == "tail"  # empty doc never rides logloss=0 into head
    mid = {r.doc_id: r.bucket for r in
           perplexity_buckets(df, (ll[1] + 1e-9, t2)).collect()}
    assert mid[3] == "middle"
    rounded = perplexity_buckets(df, (t1, t2), round_logloss=6).collect()
    assert all(r.logloss == round(r.logloss, 6) for r in rounded)


def test_script_profile(spark):
    from linkgraph.text.quality import script_profile

    docs = spark.createDataFrame(
        [
            (0, "hello world plain latin"),
            (1, "Привет мир entirely кириллица"),
            (2, "你好世界 with some latin"),
            (3, "12345 !!! ..."),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    assert got[0].dominant == "latin" and got[0].latin_frac > 0.5
    assert got[1].dominant == "cyrillic" and got[1].cyrillic_frac > 0.5
    assert got[2].dominant == "latin" or got[2].cjk_frac > 0  # mixed
    assert got[2].cjk_frac == round(4 / len("你好世界 with some latin"), 6)
    assert got[3].dominant == "none"


def test_mojibake_stats(spark):
    from linkgraph.text.quality import mojibake_stats

    docs = spark.createDataFrame(
        [
            (0, "clean text with tabs\tand\nnewlines"),
            (1, "broken �� decode"),
            (2, "ctrl\x01\x02heavy"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in mojibake_stats(docs).collect()}
    assert got[0].clean == 1 and got[0].n_replacement == 0
    assert got[1].n_replacement == 2 and got[1].clean == 0
    assert got[2].control_frac == round(2 / len("ctrl\x01\x02heavy"), 6)
    assert got[2].clean == 0
