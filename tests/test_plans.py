"""Physical-plan shape assertions (VERDICT r1 follow-ups): the scale-killer
rewrites must stay scale-safe — asserted on the executed plan, not just on
numeric results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_auc_plan_no_single_partition_window(spark):
    """The AUC histogram window runs partitioned by pid; no single-
    partition Exchange may feed a Window/Sort (r1's global-orderBy AUC
    collapsed every scored pair into one task)."""
    from linkgraph.algs.linkpred import _auc_ranked

    scores = spark.range(5000).select(
        (F.col("id") % 100).alias("u"),
        (F.col("id") % 97).alias("v"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("score"),
    )
    pos = spark.range(500).select(
        (F.col("id") % 100).alias("u"), (F.col("id") % 97).alias("v")
    )
    ranked = _auc_ranked(scores, pos)
    plan = _plan(ranked)
    assert "Window" in plan  # the per-partition prefix sum is a window...
    assert "SinglePartition" not in plan  # ...but never a global one


def test_auc_value_unchanged_by_refactor(spark):
    from linkgraph.algs.linkpred import roc_auc

    # perfect separation → AUC 1.0 (regression guard on the refactor)
    scores = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (1, 2, 0.1), (1, 3, 0.2)],
        "u bigint, v bigint, score double",
    )
    pos = spark.createDataFrame([(0, 1), (0, 2)], "u bigint, v bigint")
    assert roc_auc(scores, pos) == 1.0


def test_pagerank_csr_plan_partitions_static_edges(spark):
    """edges_frac is hash-partitioned once; the per-superstep join must
    not re-shuffle the edge table (only the O(n) rank state moves)."""
    from linkgraph.generators import rmat
    from linkgraph.graph import Graph

    e = rmat(spark, scale=10, edge_factor=4, seed=3)
    g = Graph.from_edges(e, directed=True)
    sym = g.edges.repartition(8, "src").persist()
    sym.count()
    ranks = sym.groupBy("src").count().select(
        F.col("src").alias("id"), F.lit(1.0).alias("rank")
    )
    joined = ranks.join(sym, ranks.id == sym.src)
    plan = _plan(joined)
    # the persisted, pre-partitioned edge side enters via InMemoryTableScan
    # (reused partitioning), not a fresh Exchange of the edge table
    assert "InMemoryTableScan" in plan
    sym.unpersist()


def test_biconnected_preorder_window_is_parent_partitioned(spark):
    """The Tarjan-Vishkin sibling prefix sum must window PARTITIONED BY
    PARENT (fan-in bounded by degree) — never a global single-partition
    sort over all vertices."""
    from linkgraph.algs.biconnected import _tree_state
    from linkgraph.graph import Graph

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 4, 1.0), (4, 5, 1.0),
         (5, 0, 1.0)],
        "src bigint, dst bigint, weight double",
    )
    g = Graph.from_edges(edges, directed=False, weighted=True)
    state, non_tree = _tree_state(g, max_iter=100)
    # the state DF is the product of every fold round; a SinglePartition
    # exchange anywhere in its lineage would be the global-sort smell
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_flow_residual_plan_no_global_window(spark, two_triangles_bridge):
    """Push-relabel discharge plans stay hash-partitioned on vertex id —
    no single-partition Window/Sort in the flow state lineage."""
    from linkgraph.algs.flow import max_flow

    _, flows = max_flow(two_triangles_bridge, 0, 5)
    plan = flows._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_scc_probe_job_budget(spark):
    """SCC's per-level grew-probe is ONE sum-aggregate against running
    totals, not 4 counts (VERDICT r2 #6). Regression bound: the 8-cycle
    ran 129 driver jobs with the 4-count probe, 111 with the fused one."""
    from linkgraph.algs.components import strongly_connected_components
    from linkgraph.graph import Graph

    rows = [(i, (i + 1) % 8, 1.0) for i in range(8)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=True)
    sc = spark.sparkContext
    sc.setJobGroup("scc_probe_budget", "scc job budget")
    out = strongly_connected_components(g).collect()
    sc.setJobGroup(None, None)
    jobs = len(sc.statusTracker().getJobIdsForGroup("scc_probe_budget"))
    assert len(out) == 8 and len({r["component"] for r in out}) == 1
    assert jobs <= 120, jobs


def test_pipeline_projection_ops_no_exchange(spark):
    """redact_pii / gopher flags / repetition ratios are single
    projections over the scan — any Exchange in the plan means a shuffle
    crept into what must stay scan-bound at 100-TB scale."""
    from linkgraph.text.pipeline import (
        gopher_quality_flags,
        redact_pii,
        repetition_ratios,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some text body "), F.col("id").cast("string")).alias("text"),
    )
    for op in (redact_pii, gopher_quality_flags, repetition_ratios):
        plan = _plan(op(docs))
        assert "Exchange" not in plan, op.__name__


def test_pack_sequences_window_partitioned_by_bucket(spark):
    """The packing cumsum window is partitioned by bucket — never a
    global single-partition sort (the r1 AUC failure mode)."""
    from linkgraph.text.pipeline import pack_sequences

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(pack_sequences(docs, budget=64, n_buckets=16))
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_dup_span_detection_no_window_no_single_partition(spark):
    """Duplicate-span detection is explode → hash-agg → semi-join: no
    Window, no single-partition Exchange anywhere in the plan (a global
    sort here would serialize the Θ(total tokens) window table)."""
    from linkgraph.text.dedup import duplicate_spans

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate span of eight tokens here plus "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    plan = _plan(duplicate_spans(docs, k=8))
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    # the distinct-doc count must partial-aggregate before the shuffle
    assert "partial_count" in plan or "partial_finalmerge" in plan.lower()


def test_bpe_pair_counts_partial_agg(spark):
    """BPE pair counting is one explode + combinable hash-agg — partial
    aggregation (map-side combine) must appear, and nothing may collapse
    to a single partition."""
    from linkgraph.text.bpe import bpe_pair_counts, word_freqs

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("low lower lowest new newer newest").alias("text"),
    )
    plan = _plan(bpe_pair_counts(word_freqs(docs)))
    assert "SinglePartition" not in plan
    assert "partial_sum" in plan
    assert "Window" not in plan


def test_unigram_logloss_no_single_partition(spark):
    """The LM build and per-doc scoring are two hash-aggs + one join —
    no Window, no single-partition Exchange."""
    from linkgraph.text.quality import unigram_logloss

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog").alias("text"),
    )
    plan = _plan(unigram_logloss(docs))
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_gopher_repetition_no_single_partition(spark):
    """Gopher repetition fractions are explode → two-level doc-keyed
    hash-aggs: no Window, no single-partition Exchange — every branch
    stays scan → explode → partial-combine agg at any scale."""
    from linkgraph.text.pipeline import gopher_repetition_flags

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta alpha beta gamma "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(gopher_repetition_flags(docs))
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_bloom_probe_broadcasts_filter(spark):
    """The Bloom probe joins exploded units against the filter as a
    BROADCAST (the filter is m_bits/62 rows ≪ corpus); per-doc rollups
    are partial-combine hash-aggs, never a single partition."""
    from linkgraph.text.bloom import bloom_build, bloom_probe

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u v w x y z "), F.col("id").cast("string")).alias("text"),
    )
    flt = bloom_build(docs, unit="ngram", ngram_n=3)
    plan = _plan(bloom_probe(docs, flt, unit="ngram", ngram_n=3))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_opic_superstep_no_single_partition(spark):
    """One OPIC step is rank⋈edges → dst hash-agg plus two scalar aggs:
    the per-vertex state path must never collapse to one partition."""
    from linkgraph.algs.opic import opic
    from linkgraph.graph import Graph

    rows = [(i, (i + 1) % 12, 1.0) for i in range(12)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    out = opic(Graph.from_edges(e, directed=True), iters=3)
    plan = _plan(out)
    assert "SinglePartition" not in plan


def test_boilerplate_strip_no_exchange(spark):
    """Boilerplate removal is ONE projection over the pages scan —
    array-expression transforms only; any Exchange means a shuffle crept
    into a scan-bound map."""
    from linkgraph.text.boilerplate import boilerplate_strip

    pages = spark.range(50).select(
        F.concat(F.lit("https://x/p"), F.col("id").cast("string")).alias("url"),
        F.encode(
            F.concat(F.lit("<p>body words here for the block</p>"),
                     F.lit('<a href="/y">nav</a>')),
            "utf-8",
        ).alias("html"),
    )
    plan = _plan(boilerplate_strip(pages))
    assert "Exchange" not in plan


def test_gopher_dup_ngrams_window_free(spark):
    """The engine-side dup-n-gram union is explode → two doc-keyed
    hash-aggs → per-row sort+fold: no Window, no single partition (the
    oracle uses windows; the engine must not)."""
    from linkgraph.text.pipeline import gopher_dup_ngram_fractions

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("p q r s t p q r s t tail "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(gopher_dup_ngram_fractions(docs))
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert "partial" in plan.lower()


def test_superstep_observe_cuts_job_count(spark, monkeypatch):
    """The convergence metric rides the materialization job via
    DataFrame.observe (superstep.py metric_exprs): a CC run must schedule
    strictly fewer driver jobs than the LINKGRAPH_NO_OBSERVE two-action
    fallback on the same graph — one job per superstep, not two."""
    from linkgraph.algs.components import connected_components
    from linkgraph.graph import Graph

    rows = [(i, i + 1, 1.0) for i in range(16)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    g = Graph.from_edges(e, directed=False)
    sc = spark.sparkContext

    def run(group, no_observe):
        if no_observe:
            monkeypatch.setenv("LINKGRAPH_NO_OBSERVE", "1")
        else:
            monkeypatch.delenv("LINKGRAPH_NO_OBSERVE", raising=False)
        sc.setJobGroup(group, group)
        out = connected_components(g).collect()
        sc.setJobGroup(None, None)
        assert len({r["component"] for r in out}) == 1
        return len(sc.statusTracker().getJobIdsForGroup(group))

    fused = run("cc_obs_fused", no_observe=False)
    two_action = run("cc_obs_two_action", no_observe=True)
    # path graph: ~16 min-label supersteps; the fallback pays one extra
    # metric job per superstep
    assert fused + 10 <= two_action, (fused, two_action)


def test_pll_landmark_rank_no_single_partition(spark):
    """VERDICT r3 #5: the PLL landmark ordering must use the range-
    partitioned rank linearization (stats.distributed_row_number), never
    a global row_number window — and the distributed rank must equal the
    naive global ordering exactly."""
    from linkgraph.algs.labeling import _ranked_landmarks
    from linkgraph.graph import Graph

    rows = [(i, (i * 7 + 3) % 40, 1.0) for i in range(120)]
    e = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    e = e.where("src <> dst")
    g = Graph.from_edges(e, directed=False)
    ranked = _ranked_landmarks(g, k=None)
    plan = _plan(ranked)
    assert "SinglePartition" not in plan
    got = {r["hub"]: r["rank"] for r in ranked.collect()}
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    want = {
        h: i + 1
        for i, h in enumerate(
            sorted(deg, key=lambda h: (-deg[h], h))
        )
    }
    assert got == want
