"""ANN: brute-force cosine top-k vs numpy; LSH recall sanity; multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.text.multimodal import extract_media_features, synth_media
from linkgraph.text.similarity import (
    cosine_topk,
    embedding_near_duplicate_groups,
    embedding_near_duplicate_pairs,
    hyperplane_signatures,
    ivf_cosine_topk,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df, vecs


def test_cosine_topk_matches_numpy(emb):
    df, vecs = emb
    qs = df.where(F.col("vec_id") < 3)
    got = cosine_topk(df, qs, k=5).collect()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(3):
        s = sims[q].copy()
        s[q] = -2
        want = list(np.argsort(-s)[:5])
        have = [r.neighbor_id for r in sorted(
            (r for r in got if r.query_id == q), key=lambda r: (-r.cos, r.neighbor_id)
        )]
        assert have == want


def test_lsh_buckets_deterministic(emb):
    df, _ = emb
    a = {r.id: r.bucket for r in hyperplane_signatures(df, n_planes=8, dim=16).collect()}
    b = {r.id: r.bucket for r in hyperplane_signatures(df, n_planes=8, dim=16).collect()}
    assert a == b


def test_lsh_topk_subset_of_exact_space(emb):
    df, _ = emb
    qs = df.where(F.col("vec_id") < 3)
    approx = lsh_cosine_topk(df, qs, k=5, n_planes=4, dim=16)
    rows = approx.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    # with only 4 planes, buckets are coarse → decent recall vs exact top-5
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, qs, k=5).collect()}
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & exact) >= 3


@pytest.fixture(scope="module")
def emb_clones(spark):
    """40 base vectors + 10 planted near-identical clones (ids 100..109 of
    bases 0..9, first coordinate +0.05) — the only pairs above cosine 0.9."""
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    for i in range(10):
        v = vecs[i].copy()
        v[0] += 0.05
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    return df


def test_embedding_near_dup_pairs_find_planted_clones(emb_clones):
    pairs = embedding_near_duplicate_pairs(
        emb_clones, threshold=0.9, n_planes=16, bands=8, dim=16
    ).collect()
    got = {(r.a, r.b) for r in pairs}
    # banding with 8 bands of 2 bits gives near-1 recall at cos≥0.99
    want = {(i, 100 + i) for i in range(10)}
    assert want <= got
    # precision 1.0 by construction: every emitted pair exactly verified
    assert all(r.cos >= 0.9 for r in pairs)
    assert got == want  # no base-base pair reaches 0.9 in this fixture


def test_embedding_near_dup_groups_closure(emb_clones):
    pairs = embedding_near_duplicate_pairs(
        emb_clones, threshold=0.9, n_planes=16, bands=8, dim=16
    )
    groups = embedding_near_duplicate_groups(emb_clones, pairs).collect()
    by_id = {r.vec_id: r for r in groups}
    assert len(by_id) == 50
    for i in range(10):
        assert by_id[100 + i].group_id == i
        assert by_id[i].keep and not by_id[100 + i].keep
    # singletons keep themselves
    assert all(by_id[i].keep and by_id[i].group_id == i for i in range(10, 40))


def test_embedding_near_dup_bucket_cap_star_on_boilerplate_megabucket(spark):
    # The cap's design target: a boilerplate mega-bucket of near-identical
    # vectors (d² pair bomb without the cap). Star fallback keeps O(d)
    # pairs, and the group closure still recovers the whole dup group.
    rng = np.random.default_rng(13)
    base = rng.standard_normal(16)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(30):  # mega-group: 30 near-copies of one vector
        v = base + rng.standard_normal(16) * 0.01
        rows.append((i, [float(x) for x in v]))
    for i in range(30, 40):  # 10 distinct singletons
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = embedding_near_duplicate_pairs(
        df, threshold=0.9, n_planes=16, bands=8, dim=16, max_bucket_size=5
    )
    n_pairs = pairs.count()
    # linear star, not the 30*29/2=435 quadratic bomb per band
    assert n_pairs <= 8 * 30
    groups = embedding_near_duplicate_groups(df, pairs).collect()
    by_id = {r.vec_id: r.group_id for r in groups}
    assert all(by_id[i] == 0 for i in range(30))  # one dup group, rep = 0
    assert all(by_id[i] == i for i in range(30, 40))


def test_ivf_topk_matches_exact_at_full_probe(emb):
    df, _ = emb
    qs = df.where(F.col("vec_id") < 3)
    # n_probe == n_list scans every cell → identical to brute force
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, qs, k=5).collect()}
    full = ivf_cosine_topk(df, qs, k=5, n_list=4, n_probe=4, refine_rounds=1)
    assert {(r.query_id, r.neighbor_id) for r in full.collect()} == exact


def test_ivf_topk_partial_probe_recall(emb):
    df, _ = emb
    qs = df.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, qs, k=5).collect()}
    approx = ivf_cosine_topk(df, qs, k=5, n_list=4, n_probe=2, refine_rounds=1)
    rows = approx.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    got = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(got & exact) / len(exact) >= 0.5  # half the cells probed
    # determinism: hash-seeded centroids → identical output across runs
    again = ivf_cosine_topk(df, qs, k=5, n_list=4, n_probe=2, refine_rounds=1)
    assert {(r.query_id, r.neighbor_id, round(r.cos, 6)) for r in again.collect()} == {
        (r.query_id, r.neighbor_id, round(r.cos, 6)) for r in rows
    }


def test_media_feature_plumbing(spark):
    media = synth_media(spark, n=12)
    feats = extract_media_features(media, dim=8)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,feature:array<float>>"
    )
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 8 for r in rows)
    assert all(abs(sum(r.feature) - 1.0) < 1e-5 for r in rows if r.n_bytes > 0)
    # determinism across runs
    again = extract_media_features(synth_media(spark, n=12), dim=8).collect()
    assert {r.media_id: r.feature for r in rows} == {r.media_id: r.feature for r in again}
