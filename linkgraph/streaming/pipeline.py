"""End-to-end crawl-ingest pipeline: pages micro-batch stream → vectorized
href extraction → url dictionary → partition-pruned edge merge →
incremental connected components → PageRank re-trigger, all inside one
``foreachBatch`` (the streaming composition the north rule's engine runs
in production; components from linkgraph.extract + streaming.deltas).

Semantics per micro-batch of pages:
- a page's out-links are REPLACED by its latest crawl (upsert by src id):
  stale links of a re-crawled url disappear, new ones appear — the edge
  table always equals ``pages_to_edges`` over the latest version of every
  url ever seen (asserted exactly in tests/test_pipeline_stream.py);
- hrefs to urls the crawl has NOT seen yet park in a pending-links table
  (src, dst_url, weight) instead of being dropped: when a later batch
  crawls the target url, the parked links retro-resolve into edges. This
  is what makes the incremental table converge to the batch result — the
  batch job's "drop dangling hrefs" inner join is against the FINAL url
  set, which a stream only discovers over time. Per batch the retro work
  is one join of pending against the batch's new urls — O(pending ∩ new),
  never a rescan of the edge table;
- the edge table is block-partitioned parquet (block = pmod(src, n_blocks),
  the linkgraph.tables CSR discipline); a batch rewrites ONLY the blocks
  holding its source ids — O(touched blocks), the parquet analogue of
  Iceberg MERGE INTO, same as stream_apply_deltas_pruned;
- labels update incrementally: additions take the O(affected) label-merge
  path, removals (from re-crawls) the recompute-affected-components path —
  never a full-graph CC;
- the url dictionary grows append-only (hash ids are content-derived, so
  re-crawls keep their vertex id);
- every ``pagerank_every``-th batch re-triggers PageRank on the merged
  graph (its own Superstep checkpoint/resume manifests live under
  ``state_dir``) and writes top ranks;
- a pipeline manifest (state_dir/pipeline_manifest.jsonl) records one line
  per batch: counts, components, and whether PageRank ran — the
  resumability/lineage record; stream restarts resume from the Structured
  Streaming checkpoint without reprocessing finished batches.

Scale: everything a batch does is bounded by the batch + affected state
(touched blocks, affected components), not table size — except PageRank,
which is a deliberate full recompute on its own cadence (resume/warm-start
manifests make it a handful of supersteps when ranks moved little).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, pages_path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Micro-batch source of crawl pages (the input_hint table shape)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_path)
    )


def _failpoint(name: str) -> None:
    """Crash-injection seam for the restart/exactly-once tests: raises
    when ``LINKGRAPH_FAILPOINT`` names this stage boundary, killing the
    micro-batch exactly there (offsets uncommitted → the restarted query
    REPLAYS the batch). One getenv in production — no other cost. The
    boundaries, in batch order: ``extracted`` (nothing written yet),
    ``dict_appended`` (dictionary rows durable, edges not),
    ``edges_merged`` (edges+pending durable, labels stale),
    ``labels_written`` (labels durable, PageRank/manifest not)."""
    if os.environ.get("LINKGRAPH_FAILPOINT") == name:
        raise RuntimeError(f"injected crash at failpoint {name!r}")


def _manifest_batch_ids(manifest: str) -> set[int]:
    """batch_ids whose manifest line already landed. Torn tail lines from
    a crash mid-append are ignored (a torn line means the batch did NOT
    complete, so its replay re-runs and appends a clean line)."""
    if not os.path.exists(manifest):
        return set()
    ids: set[int] = set()
    with open(manifest) as f:
        for ln in f:
            try:
                ids.add(json.loads(ln)["batch_id"])
            except (ValueError, KeyError):
                pass
    return ids


def _read_table(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # ONLY two cases read as empty: a missing path (first batch) and an
    # existing-but-fileless table (a re-crawl legitimately emptied every
    # block). Any OTHER failure must raise — silently substituting an
    # empty edge table would make the pruned overwrite delete surviving
    # rows, and an empty dictionary would re-append duplicate url ids.
    from pyspark.errors import AnalysisException

    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "PATH_NOT_FOUND" in str(e):
            return spark.createDataFrame([], schema)
        raise


def stream_pages_pipeline(
    spark: SparkSession,
    pages_path: str,
    state_dir: str,
    n_blocks: int = 16,
    pagerank_every: int = 1,
    pagerank_iters: int = 20,
    max_files_per_trigger: int = 1,
):
    """Wire the full ingest pipeline over a pages directory; returns the
    StreamingQuery (availableNow trigger — caller awaits termination).
    State layout under ``state_dir``: edges/ (block-partitioned table),
    labels/ (id, label), dictionary/ (url, id), pagerank/ (id, rank),
    pr_work/ (Superstep manifests), checkpoint/ (stream offsets),
    pipeline_manifest.jsonl.

    Exactly-once: staged per-batch deltas (Hadoop-FS checked, so an
    HDFS/S3 state_dir works) make the label update and lineage counts
    replay-safe, and a replay whose manifest line already landed skips
    the batch body entirely instead of recording duplicate counts. The
    ``pipeline_manifest.jsonl`` file itself is written with driver-local
    file IO — state_dir's manifest must live on a filesystem the driver
    can open() (local disk or a fuse mount); the parquet state tables
    have no such restriction."""
    from linkgraph.algs.pagerank import pagerank
    from linkgraph.extract import dictionary_encode, extract_hrefs, normalize_url
    from linkgraph.graph import Graph
    from linkgraph.streaming.deltas import (
        incremental_cc_additions,
        incremental_cc_removals,
    )

    edges_path = os.path.join(state_dir, "edges")
    labels_path = os.path.join(state_dir, "labels")
    dict_path = os.path.join(state_dir, "dictionary")
    pending_path = os.path.join(state_dir, "pending_links")
    pr_path = os.path.join(state_dir, "pagerank")
    manifest = os.path.join(state_dir, "pipeline_manifest.jsonl")
    os.makedirs(state_dir, exist_ok=True)

    def ingest_batch(pages: DataFrame, batch_id: int) -> None:
        sp = pages.sparkSession
        hpath = sp._jvm.org.apache.hadoop.fs.Path

        def _hfs(p: str):
            return hpath(p).getFileSystem(sp._jsc.hadoopConfiguration())

        if batch_id in _manifest_batch_ids(manifest):
            # Exactly-once replay guard: the manifest line is the LAST
            # durable mutation of a batch, so finding this batch_id there
            # means the edge merge, label update, and pagerank snapshot
            # all landed before a crash in the window between the
            # manifest append and the stream's offset commit. Re-running
            # would recompute the deltas as empty (the merge already
            # landed) and append a duplicate manifest line with
            # n_added=0 — breaking the lineage counts. Skip the body and
            # just finish the staging cleanup the crashed run never
            # reached.
            stale_delta = os.path.join(
                state_dir, "batch_deltas", f"batch={batch_id}"
            )
            _hfs(stale_delta).delete(hpath(stale_delta), True)
            return
        if pages.isEmpty():
            return
        # latest crawl wins when one batch carries a url twice
        latest = pages.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("warc_ts"))
            ),
        ).where(F.col("_rn") == 1).drop("_rn")

        # ---- extraction: (src, dst_url, weight) over the batch ------------
        batch_dict = dictionary_encode(latest).localCheckpoint(eager=True)
        links = (
            latest.select("url", extract_hrefs(F.col("html")).alias("hrefs"))
            .select("url", F.explode("hrefs").alias("href"))
            .select(
                "url", normalize_url(F.col("href"), F.col("url")).alias("dst_url")
            )
            .where(F.col("dst_url").isNotNull())
            .join(batch_dict, "url")
            .groupBy(F.col("id").alias("src"), "dst_url")
            .agg(F.count("*").cast("double").alias("weight"))
            .localCheckpoint(eager=True)
        )
        _failpoint("extracted")

        # ---- dictionary: append only unseen urls ---------------------------
        cur_dict = _read_table(sp, dict_path, "url string, id bigint")
        new_urls = batch_dict.join(cur_dict, "url", "left_anti").localCheckpoint(
            eager=True
        )
        new_urls.write.mode("append").parquet(dict_path)
        _failpoint("dict_appended")
        full_dict = sp.read.parquet(dict_path)

        # ---- resolve batch links; park the rest as pending -----------------
        dst_map = full_dict.select(
            F.col("url").alias("dst_url"), F.col("id").alias("dst")
        )
        resolved = (
            links.join(dst_map, "dst_url")
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        unresolved = links.join(dst_map, "dst_url", "left_anti").select(
            "src", "dst_url", "weight"
        )

        # ---- retro-resolve old pending links against the new urls ----------
        pending = _read_table(
            sp, pending_path, "src bigint, dst_url string, weight double"
        )
        batch_src_ids = batch_dict.select(F.col("id").alias("src")).distinct()
        # a re-crawled page replaces its pending links too
        pending_kept = pending.join(batch_src_ids, "src", "left_anti")
        # retro-resolve against ALL of this batch's urls, not just the
        # never-seen ones: on an at-least-once REPLAY the urls are already
        # in the dictionary (new_urls is empty), but pending rows pointing
        # at them must still resolve or the edges are lost forever
        batch_dst = batch_dict.select(
            F.col("url").alias("dst_url"), F.col("id").alias("dst")
        )
        retro = (
            pending_kept.join(batch_dst, "dst_url")
            .select("src", "dst", "weight")
            .localCheckpoint(eager=True)
        )
        pending_next = (
            pending_kept.join(batch_dst.select("dst_url"), "dst_url", "left_anti")
            .select("src", "dst_url", "weight")
            .unionByName(unresolved)
            .localCheckpoint(eager=True)
        )
        # NOTE: pending_next is WRITTEN AFTER the edge merge below — if
        # the batch crashes between the two writes, the replay still sees
        # the un-consumed pending rows and re-derives the same retro
        # edges (the merge dedups), instead of losing them

        # ---- pruned edge merge ---------------------------------------------
        # replace-by-src for the batch's pages, append for retro edges;
        # both touch only their own src blocks
        touched_srcs = batch_src_ids.unionByName(
            retro.select("src")
        ).distinct()
        blocks = [
            r["b"]
            for r in touched_srcs.select(
                F.pmod(F.col("src"), F.lit(n_blocks)).cast("int").alias("b")
            ).distinct().collect()
        ]
        cur = _read_table(sp, edges_path, "src bigint, dst bigint, weight double")
        if "block" in cur.columns:
            cur = cur.where(F.col("block").isin(blocks)).select(
                "src", "dst", "weight"
            )
        stale = cur.join(batch_src_ids, "src", "semi").localCheckpoint(eager=True)
        kept = cur.join(batch_src_ids, "src", "left_anti")
        # max-dedup on (src, dst): on a replay whose previous attempt
        # already wrote the retro edges, kept ∩ retro re-derives the same
        # rows — max over identical weights collapses them (kept and
        # resolved are disjoint by the src anti-join, so this only ever
        # touches the replay overlap)
        merged = (
            kept.unionByName(resolved).unionByName(retro)
            .groupBy("src", "dst")
            .agg(F.max("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        removed = stale.join(
            resolved.select("src", "dst"), ["src", "dst"], "left_anti"
        ).localCheckpoint(eager=True)
        added = (
            resolved.join(stale.select("src", "dst"), ["src", "dst"], "left_anti")
            .unionByName(retro)
            .localCheckpoint(eager=True)
        )

        # ---- exactly-once delta staging -----------------------------------
        # added/removed are DELTAS vs the durable edge table — a batch
        # replayed after its merge already landed (crash between the edge
        # write and the label write) would recompute them as empty and the
        # label update would silently skip the batch's nodes/splits. Stage
        # the deltas durably BEFORE the merge; a replay that finds a
        # complete staging (both _SUCCESS markers — staging strictly
        # precedes the merge, so a landed merge implies complete staging)
        # consumes the recorded deltas instead, making the label update
        # and lineage counts replay exactly-once. The staging dir is
        # removed at batch end, so steady-state holds at most one batch.
        delta_dir = os.path.join(state_dir, "batch_deltas", f"batch={batch_id}")
        added_dir = os.path.join(delta_dir, "added")
        removed_dir = os.path.join(delta_dir, "removed")

        def _staged(d: str) -> bool:
            # Hadoop FS, not os.path: on an HDFS/S3 state_dir a
            # driver-local existence check would always be False and the
            # exactly-once guard would silently never engage (the
            # manifest file itself still assumes a driver-visible
            # state_dir — documented in the stream_pages_pipeline
            # docstring).
            marker = os.path.join(d, "_SUCCESS")
            return _hfs(marker).exists(hpath(marker))

        if _staged(added_dir) and _staged(removed_dir):
            added = sp.read.parquet(added_dir).localCheckpoint(eager=True)
            removed = sp.read.parquet(removed_dir).localCheckpoint(eager=True)
        else:
            removed.write.mode("overwrite").parquet(removed_dir)
            added.write.mode("overwrite").parquet(added_dir)
        old_mode = sp.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        # dynamic overwrite only rewrites partitions PRESENT in the new
        # data: a touched block whose rows are all stale (a re-crawl
        # emptied the block's only source) must be deleted explicitly or
        # its old file survives the merge
        present = {
            r["b"]
            for r in merged.select(
                F.pmod(F.col("src"), F.lit(n_blocks)).cast("int").alias("b")
            ).distinct().collect()
        }
        emptied = set(blocks) - present
        if emptied:
            fs = _hfs(edges_path)
            for b in emptied:
                fs.delete(hpath(os.path.join(edges_path, f"block={b}")), True)
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.withColumn(
                    "block", F.pmod(F.col("src"), F.lit(n_blocks)).cast("int")
                )
                .write.mode("overwrite")
                .partitionBy("block")
                .parquet(edges_path)
            )
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
        # pending consumed only once the edges that replace it are durable
        pending_next.write.mode("overwrite").parquet(pending_path)
        _failpoint("edges_merged")

        # ---- incremental components --------------------------------------
        # guarded read: a re-crawl can legitimately empty the whole table
        full_edges = _read_table(
            sp, edges_path, "src bigint, dst bigint, weight double"
        ).select("src", "dst", "weight")
        g = Graph.from_edges(full_edges, directed=True)
        had_labels = True
        cur_labels = _read_table(sp, labels_path, "id bigint, label bigint")
        if "lblock" in cur_labels.columns:
            cur_labels = cur_labels.select("id", "label")
        else:
            had_labels = False
        new_nodes = (
            added.select(F.col("src").alias("id"))
            .unionByName(added.select(F.col("dst").alias("id")))
            .distinct()
            .join(cur_labels, "id", "left_anti")
            .select("id", F.col("id").alias("label"))
            .localCheckpoint(eager=True)
        )
        labels = cur_labels.unionByName(new_nodes)
        changed_ids = new_nodes.select("id")
        if not removed.isEmpty():
            labels, chg = incremental_cc_removals(
                labels, g, removed, with_changed=True
            )
            changed_ids = changed_ids.unionByName(chg)
        if not added.isEmpty():
            labels, chg = incremental_cc_additions(
                labels, added, with_changed=True
            )
            changed_ids = changed_ids.unionByName(chg)
        # drop labels of vertices that fell out of the graph entirely (a
        # re-crawl removed every edge that mentioned them) — otherwise the
        # labels table accumulates phantom singletons and n_components
        # drifts from what a batch CC over the current graph reports
        nodes_now = g.nodes().select("id")
        dropped = (
            labels.join(nodes_now, "id", "left_anti")
            .select("id")
            .localCheckpoint(eager=True)
        )
        if not dropped.isEmpty():
            labels = labels.join(nodes_now, "id", "leftsemi")
            changed_ids = changed_ids.unionByName(dropped)
        # localCheckpoint materializes the rows, so overwriting the table
        # the plan originally read from is safe
        labels = labels.localCheckpoint(eager=True)
        # labels persist block-partitioned like the edge table, and only
        # blocks holding a row that MAY have moved (new nodes, remap hits,
        # members of removal-affected components) are rewritten —
        # per-batch label IO is O(touched blocks), not O(n)
        lblock = F.pmod(F.col("id"), F.lit(n_blocks)).cast("int")
        lblocks = [
            r["b"]
            for r in changed_ids.select(lblock.alias("b")).distinct().collect()
        ]
        to_write = labels if not had_labels else labels.where(
            lblock.isin(lblocks) if lblocks else F.lit(False)
        )
        if not had_labels or lblocks:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    to_write.withColumn("lblock", lblock)
                    .write.mode("overwrite")
                    .partitionBy("lblock")
                    .parquet(labels_path)
                )
            finally:
                sp.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", old_mode
                )
        n_components = labels.select("label").distinct().count()
        _failpoint("labels_written")

        # ---- PageRank re-trigger ------------------------------------------
        # warm-started from the previous snapshot's converged ranks (a
        # slightly-changed graph converges in a few supersteps) in ONE
        # reused work dir — per-batch dirs accumulated forever before
        ran_pr = False
        if pagerank_every and batch_id % pagerank_every == 0:
            import shutil

            pr_work = os.path.join(state_dir, "pr_work")
            shutil.rmtree(pr_work, ignore_errors=True)
            prev = _read_table(sp, pr_path, "id bigint, rank double").select(
                "id", "rank"
            )
            warm = None
            if not prev.isEmpty():
                warm = prev.localCheckpoint(eager=True)  # pr_path is
                # overwritten below; materialize before the write
            pr = pagerank(
                g,
                max_iter=pagerank_iters,
                work_dir=pr_work,
                init_ranks=warm,
            )
            pr.write.mode("overwrite").parquet(pr_path)
            ran_pr = True

        with open(manifest, "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": batch_id,
                        "ts": time.time(),
                        "n_pages": latest.count(),
                        "n_added": added.count(),
                        "n_removed": removed.count(),
                        "touched_blocks": sorted(blocks),
                        "touched_label_blocks": sorted(lblocks),
                        "n_components": n_components,
                        "pagerank_ran": ran_pr,
                    }
                )
                + "\n"
            )
        _failpoint("manifest_appended")
        # batch complete: the staged deltas are consumed (label update
        # durable) — drop them so state stays O(1) batches
        _hfs(delta_dir).delete(hpath(delta_dir), True)

    stream = read_pages_stream(spark, pages_path, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
