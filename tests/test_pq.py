"""Product quantization: codebook shapes, exact-at-full-codebook
degeneracy, compression recall vs brute force, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.text.pq import pq_codebooks, pq_encode, pq_topk
from linkgraph.text.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((32, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(32)]
    # planted near-dups: 3 clones with a small first-coordinate shift
    for i in range(3):
        v = vecs[i].copy()
        v[0] += 0.1
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df, vecs


def test_codebook_shapes(emb):
    df, _ = emb
    books = pq_codebooks(df, m=4, n_codes=8)
    rows = books.collect()
    assert {(r["sub"], r["code"]) for r in rows} <= {
        (s, c) for s in range(4) for c in range(8)
    }
    assert all(len(r["cv"]) == 4 for r in rows)
    codes = pq_encode(df, books, m=4)
    got = codes.collect()
    assert all(len(r["codes"]) == 4 for r in got)
    assert all(0 <= c < 8 for r in got for c in r["codes"])


def test_full_codebook_is_exact(spark):
    """n_codes = corpus size: every subvector is distance-0 from its own
    seed slice, so ADC is the exact inner product and PQ top-k equals
    brute force."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((12, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id bigint, embedding array<float>",
    )
    qs = df.where(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            df, qs, k=4, m=2, n_codes=12, refine_rounds=0, shortlist_factor=1
        ).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, qs, k=4).collect()
    }
    assert got == want


def test_compressed_recall(emb):
    """m=4 / n_codes=8 compresses 16 floats to 4 3-bit codes; with a 4×
    shortlist + exact rerank, recall@5 vs brute force stays high and the
    planted clones are always found for their sources."""
    df, _ = emb
    qs = df.where(F.col("vec_id") < 3)
    brute = {}
    for r in cosine_topk(df, qs, k=5).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in pq_topk(df, qs, k=5, m=4, n_codes=8, shortlist_factor=4).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    assert hits / total >= 0.6, (hits, total)
    for q in range(3):
        assert 100 + q in got[q]  # the planted clone survives compression
    # reranked scores are EXACT cosines
    for r in pq_topk(df, qs, k=1, m=4, n_codes=8).collect():
        if r["neighbor_id"] == 100 + r["query_id"]:
            assert r["cos"] > 0.98


def test_determinism_and_portable(emb):
    df, _ = emb
    qs = df.where(F.col("vec_id") < 2)
    a = sorted(map(tuple, pq_topk(df, qs, k=3, portable=True).collect()))
    b = sorted(map(tuple, pq_topk(df, qs, k=3, portable=True).collect()))
    assert a == b


def test_ivfpq_recall_and_confinement(emb):
    """IVFPQ: candidates confined to probed cells, recall vs brute force
    stays reasonable; with n_probe == n_list it degrades to plain PQ."""
    from linkgraph.text.pq import ivfpq_topk

    df, _ = emb
    qs = df.where(F.col("vec_id") < 3)
    brute = {}
    for r in cosine_topk(df, qs, k=5).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in ivfpq_topk(df, qs, k=5, n_list=4, n_probe=4, m=4, n_codes=8).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got[q] & brute[q]) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    assert hits / total >= 0.6, (hits, total)
    narrow = ivfpq_topk(df, qs, k=5, n_list=4, n_probe=1, m=4, n_codes=8)
    rows = narrow.collect()
    assert all(len([x for x in rows if x["query_id"] == q]) <= 5 for q in range(3))
    for q in range(3):  # the planted clone shares the query's cell
        assert any(
            r["neighbor_id"] == 100 + q for r in rows if r["query_id"] == q
        )
