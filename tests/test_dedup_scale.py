"""Adversarial scale tests for the dedup fan-out caps (VERDICT r2 #1).

A boilerplate mega-bucket (many byte-identical docs that exact dedup
didn't catch) must NOT emit d² candidate pairs; the capped paths route it
to O(d) identical-signature stars while keeping the planted genuine
near-dups and the transitive dedup groups unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.text.dedup import (
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    near_duplicate_groups,
    simhash_near_duplicates,
)

BOILER = "all rights reserved contact us about terms privacy cookie policy sitemap"
NEAR_A = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR_B = "the quick brown fox jumps over the lazy dog near the old river bank now"


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = [(i, BOILER, "en") for i in range(60)]
    rows += [(100, NEAR_A, "en"), (101, NEAR_B, "en")]
    rows += [(200, "completely different text about spark dataframes and shuffles", "en")]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_minhash_mega_bucket_capped(skewed_docs):
    sigs = minhash_signatures(skewed_docs, num_hashes=64).localCheckpoint(eager=True)
    capped = minhash_lsh_candidates(sigs, max_bucket_size=10)
    pairs = {(r.a, r.b) for r in capped.collect()}
    # boilerplate clique would be C(60,2)=1770 pairs; star is 59
    boiler_pairs = {(a, b) for a, b in pairs if a < 60 and b < 60}
    assert boiler_pairs == {(0, i) for i in range(1, 60)}
    # the planted near-dup lives in small buckets and survives the cap
    assert (100, 101) in pairs


def test_minhash_cap_preserves_groups(skewed_docs):
    verified = minhash_dedup_pairs(skewed_docs, threshold=0.5, max_bucket_size=10)
    groups = near_duplicate_groups(skewed_docs, verified)
    by_group = {}
    for r in groups.collect():
        by_group.setdefault(r.group_id, set()).add(r.doc_id)
    assert by_group[0] == set(range(60))        # one boilerplate group
    assert by_group[100] == {100, 101}          # planted near-dups
    assert by_group[200] == {200}               # singleton untouched
    keep = {r.doc_id for r in groups.where("keep = 1").collect()}
    assert keep == {0, 100, 200}


def test_minhash_cap_noop_at_fixture_scale(skewed_docs):
    # default cap (10k) never triggers here → identical to uncapped
    a = {(r.a, r.b, round(r.est_jaccard, 9)) for r in minhash_dedup_pairs(skewed_docs, threshold=0.5).collect()}
    b = {(r.a, r.b, round(r.est_jaccard, 9)) for r in minhash_dedup_pairs(skewed_docs, threshold=0.5, max_bucket_size=None).collect()}
    assert a == b


def test_simhash_blocks6_matches_blocks4(spark):
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
    rows = []
    for i in range(20):
        txt = " ".join(words[(i + j) % len(words)] for j in range(10))
        rows.append((i, txt, "en"))
    rows.append((50, rows[0][1] + " extra", "en"))  # near-dup of doc 0
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    p4 = {(r.a, r.b, r.hamming) for r in simhash_near_duplicates(docs, max_hamming=3, n_blocks=4).collect()}
    p6 = {(r.a, r.b, r.hamming) for r in simhash_near_duplicates(docs, max_hamming=3, n_blocks=6).collect()}
    # both schemes are exact by pigeonhole → identical verified output
    assert p4 == p6


def test_simhash_mega_bucket_capped(skewed_docs):
    out = simhash_near_duplicates(skewed_docs, max_hamming=3, max_bucket_size=10)
    pairs = {(r.a, r.b): r.hamming for r in out.collect()}
    boiler_pairs = {p for p in pairs if p[0] < 60 and p[1] < 60}
    assert boiler_pairs == {(0, i) for i in range(1, 60)}
    assert all(pairs[p] == 0 for p in boiler_pairs)
    groups = near_duplicate_groups(skewed_docs, out)
    sizes = {r.group_id: r.n for r in groups.groupBy("group_id").agg(F.count("*").alias("n")).collect()}
    assert sizes[0] == 60


def test_simhash_rejects_too_few_blocks(skewed_docs):
    with pytest.raises(ValueError):
        simhash_near_duplicates(skewed_docs, max_hamming=4, n_blocks=4)
