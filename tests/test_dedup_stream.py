"""Streaming incremental exact dedup: first-seen copy survives across
micro-batches; restart resumes from the checkpoint without reprocessing."""

import json
import os

import pytest

from linkgraph.streaming.dedup_stream import _apply_dedup_batch, stream_exact_dedup


def _write(spark, path, rows, n_files=1):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        n_files
    ).write.mode("append").parquet(path)


def test_stream_dedup_first_seen_wins(spark, tmp_path):
    docs = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    # file 1 (batch 1): one within-batch dup pair (1, 3)
    _write(spark, docs, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    # file 2 (batch 2): cross-batch dup of "beta", plus a new text
    _write(spark, docs, [(4, "beta"), (5, "gamma")])

    q = stream_exact_dedup(spark, docs, state)
    q.awaitTermination()

    uniq = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(os.path.join(state, "unique")).collect()
    }
    assert uniq == {(1, "alpha"), (2, "beta"), (5, "gamma")}

    lines = [
        json.loads(line)
        for line in open(os.path.join(state, "dedup_manifest.jsonl"))
    ]
    assert sum(x["kept"] for x in lines) == 3
    assert sum(x["within_batch_dups"] for x in lines) == 1
    assert sum(x["previously_seen"] for x in lines) == 1

    # restart with a third file: one already-seen text, one new
    _write(spark, docs, [(6, "alpha"), (7, "delta")])
    q2 = stream_exact_dedup(spark, docs, state)
    q2.awaitTermination()

    uniq2 = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(os.path.join(state, "unique")).collect()
    }
    assert uniq2 == {(1, "alpha"), (2, "beta"), (5, "gamma"), (7, "delta")}
    # checkpoint resume: the earlier files were NOT reprocessed (manifest
    # only grew by the new batch, and batch counts stayed consistent)
    lines2 = [
        json.loads(line)
        for line in open(os.path.join(state, "dedup_manifest.jsonl"))
    ]
    assert sum(x["kept"] for x in lines2) == 4
    assert sum(x["rows_in"] for x in lines2) == 7


def test_batch_replay_is_exactly_once(spark, tmp_path):
    """A crash anywhere inside a batch followed by checkpoint replay must
    leave the state tables identical to a single clean run: both writes
    are dynamic partition overwrites keyed by batch_id, and the anti-join
    excludes the batch's own (possibly half-written) partition."""
    state = str(tmp_path / "state")
    os.makedirs(state)
    uniq_p = os.path.join(state, "unique")
    seen_p = os.path.join(state, "seen")
    man = os.path.join(state, "dedup_manifest.jsonl")

    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    )
    b1 = spark.createDataFrame(
        [(3, "beta"), (4, "gamma"), (5, "gamma")], "doc_id bigint, text string"
    )
    _apply_dedup_batch(b0, 0, uniq_p, seen_p, man)
    _apply_dedup_batch(b1, 1, uniq_p, seen_p, man)
    # replay batch 1 (simulates: seen/ and unique/ written, checkpoint
    # commit lost, stream restarted and re-delivered the batch)
    _apply_dedup_batch(b1, 1, uniq_p, seen_p, man)

    uniq = {
        (r.doc_id, r.text) for r in spark.read.parquet(uniq_p).collect()
    }
    assert uniq == {(1, "alpha"), (2, "beta"), (4, "gamma")}
    # seen/ holds exactly one row per distinct hash (no replay duplicates)
    seen = spark.read.parquet(seen_p)
    assert seen.count() == seen.select("h").distinct().count() == 3
    # manifest: the replayed batch logged identical counts both times
    lines = [json.loads(x) for x in open(man)]
    b1_lines = [x for x in lines if x["batch_id"] == 1]
    assert len(b1_lines) == 2 and b1_lines[0] == b1_lines[1]
    assert b1_lines[0] == {
        "batch_id": 1,
        "rows_in": 3,
        "within_batch_dups": 1,
        "previously_seen": 1,
        "kept": 1,
    }
