"""Streaming incremental near-dup: first-seen-wins flags across
micro-batches + crash/replay idempotency."""

import glob
import json
import os

from pyspark.sql import functions as F

from linkgraph.streaming.neardup_stream import (
    _apply_neardup_batch,
    stream_near_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "parrots watch from a tall oak tree near the river bank today"
)
NEAR = BASE.replace("river bank", "canal bank")  # one-word change
OTHER = "completely different content about distributed query engines and shuffles"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_near_dedup_first_seen_wins(spark, tmp_path):
    docs = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    _write_batch(spark, docs, [(0, BASE), (1, OTHER)])
    _write_batch(spark, docs, [(2, NEAR), (3, "unrelated text about parquet files and row groups here")])
    _write_batch(spark, docs, [(4, BASE), (5, "yet more fresh text nothing like the others at all now")])
    q = stream_near_dedup(spark, docs, state, threshold=0.5)
    q.awaitTermination(300)
    flags = {
        r.doc_id: r.is_dup
        for r in spark.read.parquet(state + "/flags").collect()
    }
    assert flags[0] == 0 and flags[1] == 0  # first copies never flagged
    assert flags[2] == 1  # near-copy of doc 0 from an earlier batch
    assert flags[4] == 1  # exact copy of doc 0
    assert flags[3] == 0 and flags[5] == 0
    man = [
        json.loads(l)
        for l in open(state + "/neardup_manifest.jsonl")
        if l.strip()
    ]
    assert sum(m["near_dups"] for m in man) == 2


def test_within_batch_smaller_id_kept(spark, tmp_path):
    state = str(tmp_path / "state2")
    os.makedirs(state)
    batch = spark.createDataFrame(
        [(10, BASE), (11, NEAR), (12, OTHER)], "doc_id bigint, text string"
    )
    _apply_neardup_batch(batch, 0, state, threshold=0.5)
    flags = {
        r.doc_id: r.is_dup for r in spark.read.parquet(state + "/flags").collect()
    }
    assert flags == {10: 0, 11: 1, 12: 0}


def test_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state3")
    os.makedirs(state)
    b0 = spark.createDataFrame([(0, BASE)], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(1, NEAR), (2, OTHER)], "doc_id bigint, text string")
    _apply_neardup_batch(b0, 0, state, threshold=0.5)
    _apply_neardup_batch(b1, 1, state, threshold=0.5)
    first = sorted(
        (r.doc_id, r.is_dup, r.batch_id)
        for r in spark.read.parquet(state + "/flags").collect()
    )
    # crash-replay batch 1: same partition rewritten with identical rows
    _apply_neardup_batch(b1, 1, state, threshold=0.5)
    again = sorted(
        (r.doc_id, r.is_dup, r.batch_id)
        for r in spark.read.parquet(state + "/flags").collect()
    )
    assert first == again == [(0, 0, 0), (1, 1, 1), (2, 0, 1)]
    # state tables carry exactly one partition per batch
    assert len(glob.glob(state + "/sigs/batch_id=*")) == 2


def test_overcap_bucket_star_fallback(spark, tmp_path):
    """max_bucket_size=0 disables bucket joins entirely; identical docs
    must still be flagged through the full-signature star fallback."""
    state = str(tmp_path / "state4")
    os.makedirs(state)
    b0 = spark.createDataFrame([(0, BASE), (1, OTHER)], "doc_id bigint, text string")
    b1 = spark.createDataFrame([(2, BASE), (3, BASE)], "doc_id bigint, text string")
    _apply_neardup_batch(b0, 0, state, threshold=0.5, max_bucket_size=0)
    _apply_neardup_batch(b1, 1, state, threshold=0.5, max_bucket_size=0)
    flags = {
        r.doc_id: r.is_dup for r in spark.read.parquet(state + "/flags").collect()
    }
    # 2 matches earlier doc 0; 3 matches earlier doc 0 AND smaller id 2;
    # NEAR (non-identical) copies are legitimately missed at cap 0
    assert flags == {0: 0, 1: 0, 2: 1, 3: 1}
