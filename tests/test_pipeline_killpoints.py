"""Mid-batch kill/restart at every pipeline stage boundary (VERDICT r3
#6): inject a crash at each failpoint, restart the stream, and assert
the final state — edges, labels, dictionary, PageRank ranks, manifest —
is identical to an uninterrupted run over the same crawl files
(exactly-once manifests, fingerprint-identical ranks)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from linkgraph.streaming.pipeline import stream_pages_pipeline

# manifest_appended covers the window ADVICE r4 flagged as untested: a
# crash after the manifest line lands but before the stream commits its
# offsets — the replay must skip the batch body (manifest-dedupe guard)
# instead of appending a duplicate line with recomputed-empty deltas.
KILL_POINTS = [
    "extracted",
    "dict_appended",
    "edges_merged",
    "labels_written",
    "manifest_appended",
]


def _await(q):
    q.awaitTermination(300)


def _write_crawl_files(spark, pages_dir):
    from linkgraph.extract import synth_pages

    pages = synth_pages(spark, 80, seed=11).cache()
    f1 = pages.where(F.xxhash64("url") % 2 == 0)
    f2 = pages.where(F.xxhash64("url") % 2 != 0)
    f1.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f1")
    f2.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f2")


def _snapshot(spark, state_dir):
    """Canonical, order-insensitive view of every state table."""
    edges = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in spark.read.parquet(os.path.join(state_dir, "edges"))
        .select("src", "dst", "weight")
        .collect()
    )
    labels = sorted(
        (r["id"], r["label"])
        for r in spark.read.parquet(os.path.join(state_dir, "labels"))
        .select("id", "label")
        .collect()
    )
    dictionary = sorted(
        (r["url"], r["id"])
        for r in spark.read.parquet(
            os.path.join(state_dir, "dictionary")
        ).collect()
    )
    ranks = sorted(
        (r["id"], round(r["rank"], 12))
        for r in spark.read.parquet(
            os.path.join(state_dir, "pagerank")
        ).collect()
    )
    manifest = [
        json.loads(x)
        for x in open(os.path.join(state_dir, "pipeline_manifest.jsonl"))
    ]
    return edges, labels, dictionary, ranks, manifest


@pytest.fixture(scope="module")
def reference(spark, tmp_path_factory):
    """Uninterrupted run over the two crawl files → golden snapshot."""
    base = tmp_path_factory.mktemp("killref")
    pages_dir, state_dir = str(base / "pages"), str(base / "state")
    os.makedirs(pages_dir)
    _write_crawl_files(spark, pages_dir)
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8))
    return _snapshot(spark, state_dir)


@pytest.mark.parametrize("point", KILL_POINTS)
def test_kill_and_restart_matches_uninterrupted(
    spark, tmp_path, monkeypatch, reference, point
):
    pages_dir, state_dir = str(tmp_path / "pages"), str(tmp_path / "state")
    os.makedirs(pages_dir)
    _write_crawl_files(spark, pages_dir)

    # run 1: crash mid-batch at the failpoint (first batch to reach it)
    monkeypatch.setenv("LINKGRAPH_FAILPOINT", point)
    q = stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8)
    with pytest.raises(Exception) as exc:
        q.awaitTermination(300)
        q.processAllAvailable()
    assert "failpoint" in str(exc.value), str(exc.value)[:500]

    # run 2: restart clean — the failed batch REPLAYS from the checkpoint
    monkeypatch.delenv("LINKGRAPH_FAILPOINT")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8))

    got = _snapshot(spark, state_dir)
    ref = reference
    assert got[0] == ref[0], "edge tables diverge"
    assert got[1] == ref[1], "label tables diverge"
    assert got[2] == ref[2], "dictionaries diverge"
    assert got[3] == ref[3], "PageRank ranks diverge (12 dp)"
    # exactly-once manifest: same batches exactly once, same counts
    ids_got = [m["batch_id"] for m in got[4]]
    ids_ref = [m["batch_id"] for m in ref[4]]
    assert len(ids_got) == len(set(ids_got)), "duplicate manifest lines"
    assert ids_got == ids_ref
    # Delta staging makes the lineage exactly-once: even a batch replayed
    # after its merge landed records the deltas its first attempt staged,
    # so every count matches the uninterrupted run exactly.
    keys = ("n_pages", "n_added", "n_removed", "n_components", "pagerank_ran")
    assert [
        {k: m[k] for k in keys} for m in got[4]
    ] == [{k: m[k] for k in keys} for m in ref[4]]
    # and the consumed staging is gone
    assert not os.listdir(os.path.join(state_dir, "batch_deltas"))
