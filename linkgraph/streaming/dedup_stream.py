"""Incremental exact dedup for crawl ingest: a Structured Streaming stage
that keeps the FIRST-SEEN copy of every distinct text across micro-batches.

Batch semantics (foreachBatch, sequential by construction):
1. hash the batch's texts (sha2-256 — the same key the batch operator
   ``exact_duplicate_groups`` uses);
2. dedup WITHIN the batch (keep min doc_id per hash — deterministic under
   any partitioning);
3. anti-join the persistent ``seen/`` hash table, EXCLUDING this batch's
   own partition (so a replay after a partial write recomputes the same
   survivor set instead of anti-joining against its own half-written
   output);
4. dynamic-partition-OVERWRITE the survivors into ``unique/batch_id=N``
   and their hashes into ``seen/batch_id=N``.

Exactly-once: both state tables are partitioned by ``batch_id`` and every
write is a dynamic partition overwrite, so a crash anywhere inside the
batch followed by checkpoint replay simply rewrites the same two
partitions with identical rows (the survivor computation is deterministic
and never reads its own batch partition). A plain append here would
duplicate survivors on replay — the classic foreachBatch at-least-once
trap. At 100-TB scale ``seen/`` is a hash-only table and step 3 is one
shuffle on a 32-byte key; nothing ever scans ``unique/``.

A manifest (state_dir/dedup_manifest.jsonl) records per batch: rows in,
within-batch dups, previously-seen dups, rows kept — the ingest lineage.
On a replayed batch the manifest gains a second line for the same
batch_id with identical counts (last line per batch_id wins).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _apply_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    unique_path: str,
    seen_path: str,
    manifest: str,
    text_col: str = "text",
) -> None:
    """One micro-batch of the dedup stage — module-level so tests can
    drive crash/replay scenarios directly (call it twice with the same
    batch_id: the state must come out identical)."""
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
        # exclude this batch's own partition: a replay must not anti-join
        # against the hashes a crashed prior attempt already wrote
        seen = (
            sp.read.parquet(seen_path)
            .where(F.col("batch_id") != F.lit(int(batch_id)))
            .select("h")
        )
    except Exception:
        seen = sp.createDataFrame([], "h string")
    fresh = local.join(seen, "h", "left_anti").localCheckpoint(eager=True)
    n_local, n_fresh = local.count(), fresh.count()
    part = F.lit(int(batch_id)).alias("batch_id")
    (
        fresh.drop("h")
        .select("*", part)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(unique_path)
    )
    (
        fresh.select("h", part)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(seen_path)
    )
    with open(manifest, "a") as f:
        f.write(
            json.dumps(
                {
                    "batch_id": int(batch_id),
                    "rows_in": n_in,
                    "within_batch_dups": n_in - n_local,
                    "previously_seen": n_local - n_fresh,
                    "kept": n_fresh,
                }
            )
            + "\n"
        )


def stream_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    state_dir: str,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Wire the dedup stage over a docs parquet directory; returns the
    StreamingQuery (availableNow — caller awaits termination). State under
    ``state_dir``: unique/batch_id=N (survivor docs), seen/batch_id=N
    (h string), checkpoint/, dedup_manifest.jsonl. Read survivors with
    ``spark.read.parquet(state_dir + "/unique")`` (the batch_id partition
    column comes along; drop it if unwanted)."""
    unique_path = os.path.join(state_dir, "unique")
    seen_path = os.path.join(state_dir, "seen")
    manifest = os.path.join(state_dir, "dedup_manifest.jsonl")
    os.makedirs(state_dir, exist_ok=True)

    def dedup_batch(batch: DataFrame, batch_id: int) -> None:
        _apply_dedup_batch(
            batch, batch_id, unique_path, seen_path, manifest, text_col
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
