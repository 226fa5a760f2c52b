import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from linkgraph.text.classifier import (
    hashed_features,
    quality_classifier,
    score_classifier,
    train_classifier,
)


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-classifier")


DOCS = [
    (0, "quality prose about the world and its ways"),
    (1, "quality writing with the good structure and depth"),
    (2, "quality text that reads like the real thing"),
    (3, "zzz spam spam buy now zzz"),
    (4, "zzz click here buy buy zzz"),
    (5, "zzz free free free now zzz"),
]
LABELS = [(i, 1.0) for i in range(3)] + [(i, 0.0) for i in range(3, 6)]


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _numpy_gd(docs, labels, n_features, iters, lr):
    """Independent reference: same features, same batch-GD updates."""
    feats = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        row = {}
        for t in toks:
            f = _phash(t) % n_features
            row[f] = row.get(f, 0) + 1
        feats[doc_id] = {f: c / len(toks) for f, c in row.items()} if toks else {}
    y = dict(labels)
    n = len(labels)
    w: dict[int, float] = {}
    b = 0.0
    for _ in range(iters):
        grads: dict[int, float] = {}
        gb = 0.0
        for d, yy in labels:
            m = sum(x * w.get(f, 0.0) for f, x in feats[d].items()) + b
            r = 1.0 / (1.0 + math.exp(-m)) - yy
            gb += r / n
            for f, x in feats[d].items():
                grads[f] = grads.get(f, 0.0) + x * r / n
        for f, g in grads.items():
            w[f] = w.get(f, 0.0) - lr * g
        b -= lr * gb
    probs = {}
    for d, _ in docs:
        m = sum(x * w.get(f, 0.0) for f, x in feats[d].items()) + b
        probs[d] = 1.0 / (1.0 + math.exp(-m))
    return probs


def test_numpy_gd_parity_portable(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    labels = spark.createDataFrame(LABELS, "doc_id bigint, y double")
    got = {
        r.doc_id: r.prob
        for r in quality_classifier(
            docs, labels, n_features=512, iters=3, lr=5.0, portable=True
        ).collect()
    }
    want = _numpy_gd(DOCS, LABELS, n_features=512, iters=3, lr=5.0)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_separates_planted_classes(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    labels = spark.createDataFrame(LABELS, "doc_id bigint, y double")
    probs = {
        r.doc_id: r.prob
        for r in quality_classifier(docs, labels, iters=8, lr=10.0).collect()
    }
    assert min(probs[d] for d in (0, 1, 2)) > max(probs[d] for d in (3, 4, 5))


def test_scores_unlabeled_docs(spark):
    # a held-out doc sharing the "quality" marker scores like the good class
    docs = spark.createDataFrame(
        DOCS + [(6, "quality essay on the matter"), (7, "zzz buy zzz")],
        "doc_id bigint, text string",
    )
    labels = spark.createDataFrame(LABELS, "doc_id bigint, y double")
    probs = {
        r.doc_id: r.prob
        for r in quality_classifier(docs, labels, iters=8, lr=10.0).collect()
    }
    assert probs[6] > 0.5 > probs[7]


def test_empty_doc_scores_bias(spark):
    docs = spark.createDataFrame(
        DOCS + [(6, "")], "doc_id bigint, text string"
    )
    labels = spark.createDataFrame(LABELS, "doc_id bigint, y double")
    out = quality_classifier(docs, labels, iters=2, lr=5.0)
    feats = hashed_features(docs)
    w, b = train_classifier(feats, labels, iters=2, lr=5.0)
    got = {r.doc_id: r.prob for r in out.collect()}
    # balanced labels + zero-init: the empty doc sits at sigmoid(bias)
    assert got[6] == pytest.approx(1.0 / (1.0 + math.exp(-b)), abs=1e-9)


def test_deterministic(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    labels = spark.createDataFrame(LABELS, "doc_id bigint, y double")
    a = sorted(
        (r.doc_id, round(r.prob, 12))
        for r in quality_classifier(docs, labels, iters=4).collect()
    )
    b = sorted(
        (r.doc_id, round(r.prob, 12))
        for r in quality_classifier(docs, labels, iters=4).collect()
    )
    assert a == b


def test_no_labels_returns_half(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    labels = spark.createDataFrame([], "doc_id bigint, y double")
    probs = {r.doc_id: r.prob for r in quality_classifier(docs, labels).collect()}
    assert all(p == pytest.approx(0.5) for p in probs.values())
