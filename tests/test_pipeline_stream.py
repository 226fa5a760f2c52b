"""End-to-end crawl-ingest stream: pages files → extraction → dictionary →
pruned edge merge → incremental CC → PageRank re-trigger, via a REAL
Structured Streaming availableNow query; restart resumes from checkpoint;
re-crawl replaces a page's out-links (the removal path)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from linkgraph.extract import pages_to_edges, synth_pages
from linkgraph.graph import Graph
from linkgraph.streaming.pipeline import stream_pages_pipeline


def _await(q):
    q.awaitTermination(300)


@pytest.fixture()
def state(tmp_path):
    pages_dir = str(tmp_path / "pages")
    state_dir = str(tmp_path / "state")
    os.makedirs(pages_dir)
    return pages_dir, state_dir


def _edge_set(df):
    return sorted(
        (r["src"], r["dst"], r["weight"])
        for r in df.select("src", "dst", "weight").collect()
    )


def test_pipeline_end_to_end_with_recrawl(spark, state):
    pages_dir, state_dir = state
    all_pages = synth_pages(spark, 120, seed=6).cache()
    p1 = all_pages.where(F.xxhash64("url") % 2 == 0)
    p2 = all_pages.where(F.xxhash64("url") % 2 != 0)
    p1.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f1")

    # ---- run 1: first half of the crawl -------------------------------
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8))
    e1 = spark.read.parquet(os.path.join(state_dir, "edges"))
    want1, _ = pages_to_edges(p1)
    assert _edge_set(e1) == _edge_set(want1)

    # ---- run 2 (restart): second half + a RE-CRAWL of one page --------
    victim = p1.orderBy("url").limit(1).collect()[0]
    recrawl = spark.createDataFrame(
        [
            (
                victim["url"],
                victim["warc_ts"] + dt.timedelta(days=1),
                b"<html><body>recrawled, no links now</body></html>",
                "recrawled, no links now",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    p2.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f2")
    recrawl.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f3")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8))

    # final edge table == batch extraction over the LATEST page versions
    latest = all_pages.join(recrawl.select("url"), "url", "left_anti").unionByName(
        recrawl
    )
    want, want_dict = pages_to_edges(latest)
    got = spark.read.parquet(os.path.join(state_dir, "edges"))
    assert _edge_set(got) == _edge_set(want)
    # the re-crawled page's old out-links are GONE
    vid = {r["url"]: r["id"] for r in want_dict.collect()}[victim["url"]]
    assert got.where(F.col("src") == vid).count() == 0

    # labels == full CC on the final graph (canonical min-member ids)
    from linkgraph.algs.components import connected_components

    g = Graph.from_edges(got.select("src", "dst", "weight"), directed=True)
    full = {
        r["id"]: r["component"] for r in connected_components(g).collect()
    }
    lab = {
        r["id"]: r["label"]
        for r in spark.read.parquet(os.path.join(state_dir, "labels")).collect()
    }
    for i, c in full.items():
        assert lab[i] == c, (i, lab[i], c)

    # dictionary covers every vertex url exactly once
    d = spark.read.parquet(os.path.join(state_dir, "dictionary"))
    assert d.count() == d.select("url").distinct().count()

    # PageRank re-trigger produced a rank table summing to 1
    pr = spark.read.parquet(os.path.join(state_dir, "pagerank"))
    assert abs(pr.agg(F.sum("rank")).collect()[0][0] - 1.0) < 1e-6

    # pipeline manifest: one line per non-empty batch, removal recorded,
    # resumability evidence (run 2 did NOT reprocess run 1's file)
    lines = [
        json.loads(x)
        for x in open(os.path.join(state_dir, "pipeline_manifest.jsonl"))
    ]
    assert len(lines) >= 3
    assert all(x["pagerank_ran"] for x in lines)
    assert any(x["n_removed"] > 0 for x in lines)
    batch_ids = [x["batch_id"] for x in lines]
    assert len(batch_ids) == len(set(batch_ids))
    # PageRank Superstep manifests exist for the LAST trigger in the one
    # reused pr_work dir (per-batch dirs would accumulate forever; the
    # warm start carries state between batches through pagerank/ instead)
    man = os.path.join(state_dir, "pr_work", "pagerank", "manifest.jsonl")
    assert os.path.exists(man)
    assert not [p for p in os.listdir(state_dir) if p.startswith("pr_work_b")]


def test_pipeline_untouched_blocks_not_rewritten(spark, state):
    pages_dir, state_dir = state
    pages = synth_pages(spark, 60, seed=8).cache()
    pages.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f1")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8,
                                 pagerank_every=0))
    edges_dir = os.path.join(state_dir, "edges")
    before = {}
    for root, _, files in os.walk(edges_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                before[p] = os.path.getmtime(p)

    # second run: a single tiny page touching ONE src block
    one = synth_pages(spark, 3, seed=99).limit(1)
    one.coalesce(1).write.mode("overwrite").parquet(pages_dir + "/f2")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir, n_blocks=8,
                                 pagerank_every=0))
    lines = [
        json.loads(x)
        for x in open(os.path.join(state_dir, "pipeline_manifest.jsonl"))
    ]
    touched = lines[-1]["touched_blocks"]
    assert len(touched) <= 2
    untouched_survivors = [
        p
        for p, m in before.items()
        if os.path.exists(p)
        and os.path.getmtime(p) == m
        and not any(f"block={b}" in p for b in touched)
    ]
    assert untouched_survivors  # untouched block files were not rewritten


def test_pipeline_recrawl_empties_block(spark, state):
    """A re-crawl that removes the ONLY source in an edge block must
    empty that block (dynamic overwrite alone would leave the stale file
    behind — the pipeline deletes emptied touched partitions)."""
    pages_dir, state_dir = state
    page = spark.createDataFrame(
        [
            (
                "https://d0.example.org/solo",
                dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc),
                b'<html><body><a href="https://x.example.org/a">a</a>'
                b'<a href="https://d0.example.org/solo">self</a></body></html>',
                "t",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    page.coalesce(1).write.parquet(pages_dir + "/f1")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir,
                                 n_blocks=4, pagerank_every=0))
    assert spark.read.parquet(os.path.join(state_dir, "edges")).count() == 1

    recrawl = page.select(
        "url",
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        F.lit(b"<html><body>no links</body></html>").alias("html"),
        F.lit("no links").alias("text"),
        "lang",
    )
    recrawl.coalesce(1).write.parquet(pages_dir + "/f2")
    _await(stream_pages_pipeline(spark, pages_dir + "/*", state_dir,
                                 n_blocks=4, pagerank_every=0))
    edges_dir = os.path.join(state_dir, "edges")
    block_dirs = [p for p in os.listdir(edges_dir) if p.startswith("block=")]
    assert block_dirs == []  # the stale block file is gone, table is empty
