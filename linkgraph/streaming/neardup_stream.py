"""Incremental NEAR-dup detection for crawl ingest: a Structured
Streaming stage that flags each arriving document against everything
ingested before it, using the batch MinHash+LSH machinery
(linkgraph.text.dedup) as its kernel.

Batch semantics (foreachBatch, sequential by construction):
1. MinHash-sign the batch (``minhash_signatures`` — one explode + one
   64-column min agg, JVM-side);
2. band the signatures into (band, bh) bucket keys — the same band-hash
   expression ``minhash_lsh_candidates`` uses;
3. candidates = batch keys ⋈ the persistent ``buckets/`` table (docs from
   EARLIER batches sharing a bucket) ∪ within-batch bucket pairs, both
   under the standard per-bucket size cap (mega-bucket discipline);
4. verify candidates by signature agreement: est_jaccard = matching
   positions / num_hashes against ``sigs/``, keep ≥ ``threshold``;
5. a batch doc is a duplicate iff it matches any earlier-ingested doc or
   a SMALLER doc_id in its own batch (first-seen-wins, exactly the batch
   operator's keep rule);
6. write flags to ``flags/batch_id=N``, this batch's buckets and
   signatures to ``buckets/batch_id=N`` / ``sigs/batch_id=N``.

Exactly-once: all three state tables are partitioned by ``batch_id`` and
written with dynamic-partition OVERWRITE, and steps 3-5 exclude this
batch's own partitions from the persistent side — a crash + checkpoint
replay rewrites the same partitions with identical rows (the computation
is deterministic). Same discipline as streaming/dedup_stream.py — and the
same manifest convention: a replayed batch APPENDS a second line with the
same batch_id and identical counts (last line per batch_id wins; readers
must dedup by batch_id, parquet state is exactly-once regardless).

Scale notes: the per-batch join hits ``buckets/`` on (band, bh) — a
hash-partitioned shuffle whose build side is the SMALL batch; the
persistent side is never self-joined, so cost per batch is
O(batch × matching buckets), not O(corpus²). ``sigs/`` is touched only
for candidate doc_ids (semi-join pushdown). The per-bucket cap bounds
boilerplate blowups exactly as in the batch path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _band_keys(
    sigs: DataFrame, bands: int, rows_per_band: int, portable: bool
) -> DataFrame:
    """Delegates to the SHARED banding definition
    (linkgraph.text.dedup.lsh_band_keys) so persisted bucket tables stay
    compatible with batch-computed buckets by construction."""
    from linkgraph.text.dedup import lsh_band_keys

    return lsh_band_keys(sigs, bands, rows_per_band, portable)


def _agreement(a: str, b: str, num_hashes: int):
    """Fraction of matching signature positions — est. Jaccard."""
    return (
        F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / float(num_hashes)
    )


def _apply_neardup_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 10_000,
    text_col: str = "text",
    portable: bool = False,
) -> None:
    """One micro-batch — module-level so tests can drive crash/replay."""
    from linkgraph.text.dedup import minhash_signatures

    sp = batch.sparkSession
    if batch.isEmpty():
        return
    rows_per_band = num_hashes // bands
    flags_path = os.path.join(state_dir, "flags")
    buckets_path = os.path.join(state_dir, "buckets")
    sigs_path = os.path.join(state_dir, "sigs")
    manifest = os.path.join(state_dir, "neardup_manifest.jsonl")

    sig = minhash_signatures(
        batch, num_hashes=num_hashes, k=k, text_col=text_col, portable=portable
    ).localCheckpoint(eager=True)
    keys = _band_keys(sig, bands, rows_per_band, portable).localCheckpoint(
        eager=True
    )

    def old_partitions(path, schema):
        # ONLY the missing-path case (first batch) may read as empty — a
        # transient read failure must raise, or the batch would compare
        # against nothing and permanently flag cross-batch dups as unique
        if not os.path.exists(path):
            return sp.createDataFrame([], schema + ", batch_id int")
        return sp.read.parquet(path).where(
            F.col("batch_id") != F.lit(int(batch_id))
        )

    old_keys = old_partitions(buckets_path, "doc_id bigint, band int, bh bigint")
    old_sigs = old_partitions(sigs_path, "doc_id bigint, sig array<bigint>")

    # per-bucket cap applies to the UNION view of the bucket (old + new)
    both = keys.select("doc_id", "band", "bh").unionByName(
        old_keys.select("doc_id", "band", "bh")
    )
    bsz = both.groupBy("band", "bh").agg(F.count("*").alias("_n"))
    ok = bsz.where(F.col("_n") <= int(max_bucket_size)).select("band", "bh")
    keys_ok = keys.join(ok, ["band", "bh"])
    # over-cap buckets degrade to the batch path's star discipline: a
    # batch doc there is flagged iff an identical FULL signature exists
    # among earlier docs or smaller same-batch ids (O(d) sig-hash join,
    # never d² — mirrors minhash_lsh_candidates' mega-bucket fallback)
    over_docs = (
        keys.join(bsz.where(F.col("_n") > int(max_bucket_size)), ["band", "bh"])
        .select("doc_id")
        .distinct()
    )
    bh_new = over_docs.join(
        sig.select("doc_id", F.xxhash64("sig").alias("_fk")), "doc_id"
    )
    bh_all = (
        sig.select("doc_id", "sig", F.lit(False).alias("_old"))
        .unionByName(
            old_sigs.select("doc_id", "sig").withColumn("_old", F.lit(True))
        )
        .select(
            F.col("doc_id").alias("b"), F.xxhash64("sig").alias("_fk"), "_old"
        )
    )
    star_dups = (
        bh_new.join(bh_all, "_fk")
        .where(F.col("_old") | (F.col("b") < F.col("doc_id")))
        .select("doc_id")
        .distinct()
    )

    cross = (
        keys_ok.alias("x")
        .join(old_keys.select("doc_id", "band", "bh").alias("y"), ["band", "bh"])
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    within = (
        keys_ok.alias("x")
        .join(keys_ok.alias("y"), ["band", "bh"])
        .where(F.col("x.doc_id") > F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    cand = cross.unionByName(within).distinct()

    all_sigs = sig.unionByName(old_sigs.select("doc_id", "sig"))
    verified = (
        cand.join(
            all_sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sa")),
            "a",
        )
        .join(
            all_sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sb")),
            "b",
        )
        .where(_agreement("sa", "sb", num_hashes) >= float(threshold))
        .select("a", "b")
    )
    dup_ids = (
        verified.select(F.col("a").alias("doc_id"))
        .unionByName(star_dups)
        .distinct()
    )
    flags = (
        batch.select("doc_id")
        .join(dup_ids.withColumn("_d", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("_d", F.lit(0)).cast("int").alias("is_dup")
        )
        .localCheckpoint(eager=True)
    )
    n_in = flags.count()
    n_dup = flags.where(F.col("is_dup") == 1).count()

    part = F.lit(int(batch_id)).alias("batch_id")
    for df, path in (
        (flags, flags_path),
        (keys.select("doc_id", "band", "bh"), buckets_path),
        (sig, sigs_path),
    ):
        (
            df.select("*", part)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )
    with open(manifest, "a") as f:
        f.write(
            json.dumps(
                {"batch_id": int(batch_id), "rows_in": n_in, "near_dups": n_dup}
            )
            + "\n"
        )


def stream_near_dedup(
    spark: SparkSession,
    docs_path: str,
    state_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int = 10_000,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Wire the near-dup stage over a docs parquet directory; returns the
    StreamingQuery (availableNow — caller awaits termination). Read flags
    with ``spark.read.parquet(state_dir + "/flags")``; filter
    ``is_dup = 0`` for the survivor set (first-seen-wins: the earliest
    ingested copy of a near-dup cluster is never flagged)."""
    os.makedirs(state_dir, exist_ok=True)

    def run_batch(batch: DataFrame, batch_id: int) -> None:
        _apply_neardup_batch(
            batch,
            batch_id,
            state_dir,
            num_hashes=num_hashes,
            bands=bands,
            k=k,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            text_col=text_col,
        )

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )
    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
