"""Incremental exact dedup for crawl ingest: a Structured Streaming stage
that keeps the FIRST-SEEN copy of every distinct text across micro-batches.

Batch semantics (foreachBatch, sequential by construction):
1. hash the batch's texts (sha2-256 — the same key the batch operator
   ``exact_duplicate_groups`` uses);
2. dedup WITHIN the batch (keep min doc_id per hash — deterministic under
   any partitioning);
3. anti-join the persistent ``seen/`` hash table (one join against a
   hash-only table — O(batch) rows shuffled, the table itself is never
   rewritten);
4. append survivors to ``unique/`` and their hashes to ``seen/``.

Both state tables are append-only, so a crash between the two appends can
only duplicate a batch's hashes in ``seen/`` (harmless — anti-join
semantics are idempotent) and the stream checkpoint replays the batch.
At 100-TB scale ``seen/`` is a hash-partitioned table and step 3 is a
shuffle on a 32-byte key; nothing scans ``unique/``.

A manifest (state_dir/dedup_manifest.jsonl) records per batch: rows in,
within-batch dups, previously-seen dups, rows kept — the ingest lineage.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    state_dir: str,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Wire the dedup stage over a docs parquet directory; returns the
    StreamingQuery (availableNow — caller awaits termination). State under
    ``state_dir``: unique/ (survivor docs), seen/ (h string), checkpoint/,
    dedup_manifest.jsonl."""
    unique_path = os.path.join(state_dir, "unique")
    seen_path = os.path.join(state_dir, "seen")
    manifest = os.path.join(state_dir, "dedup_manifest.jsonl")
    os.makedirs(state_dir, exist_ok=True)

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        if batch.isEmpty():
            return
        hashed = batch.withColumn("h", F.sha2(F.col(text_col), 256))
        n_in = hashed.count()
        # within-batch: keep the smallest doc_id per hash (deterministic)
        local = (
            hashed.groupBy("h")
            .agg(F.min_by(F.struct(*hashed.columns), F.col("doc_id")).alias("r"))
            .select("r.*")
            .localCheckpoint(eager=True)
        )
        try:
            seen = sp.read.parquet(seen_path)
        except Exception:
            seen = sp.createDataFrame([], "h string")
        fresh = local.join(seen, "h", "left_anti").localCheckpoint(eager=True)
        n_local, n_fresh = local.count(), fresh.count()
        fresh.drop("h").write.mode("append").parquet(unique_path)
        fresh.select("h").write.mode("append").parquet(seen_path)
        with open(manifest, "a") as f:
            f.write(
                json.dumps(
                    {
                        "batch_id": batch_id,
                        "rows_in": n_in,
                        "within_batch_dups": n_in - n_local,
                        "previously_seen": n_local - n_fresh,
                        "kept": n_fresh,
                    }
                )
                + "\n"
            )

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )
    return (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
