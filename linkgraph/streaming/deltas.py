"""Graph-event streams — the Structured-Streaming twin of NetworKit's
dynamics module (dynamics/GraphEvent.hpp: EDGE_ADDITION/REMOVAL/
WEIGHT_UPDATE + TIME_STEP driven through GraphUpdater; DGSStreamParser).

Design (SURVEY §2B streaming row): deltas arrive as micro-batches of rows
``(op, src, dst, weight, ts)``; a watermark on ``ts`` bounds late-event
state; ``foreachBatch`` merges each micro-batch into the durable edge
table and re-triggers affected supersteps. The heavy state (the edge
table, vertex labels) lives in checkpointed TABLES, not stream operator
state — stream state stays O(watermark window), so the stream survives
restarts via the normal checkpointLocation mechanism.

Scale: merge-on-read beats read-modify-write at 10^12 edges — on Iceberg
the batch merge becomes MERGE INTO (delete + append manifests); the plain-
parquet fallback here rewrites the table, correct at fixture scale and
behind the same function signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DELTA_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),  # add_edge | remove_edge | update_weight
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_delta_stream(
    spark: SparkSession, path: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Micro-batch source of graph events from a directory of JSON files
    (the DGSStreamParser analogue), watermarked on event time."""
    return (
        spark.readStream.schema(DELTA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(path)
        .withWatermark("ts", watermark)
    )


def edge_rate_windows(deltas: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window event-rate metrics per op — the streaming
    aggregation surface (late rows beyond the watermark are dropped)."""
    return (
        deltas.groupBy(F.window("ts", window).alias("w"), "op")
        .agg(F.count("*").alias("n"), F.sum("weight").alias("total_weight"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n",
            "total_weight",
        )
    )


def _read_edges_or_empty(spark_b, table_path, where_block=None):
    """Missing or fileless tables read as empty; ANY other read failure
    raises — substituting an empty table for a transient error would make
    the merge-and-swap (or pruned overwrite) destroy the real table."""
    import os

    from pyspark.errors import AnalysisException

    if not os.path.exists(table_path):
        return spark_b.createDataFrame([], "src bigint, dst bigint, weight double")
    try:
        df = spark_b.read.parquet(table_path)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" in str(e) or "PATH_NOT_FOUND" in str(e):
            return spark_b.createDataFrame(
                [], "src bigint, dst bigint, weight double"
            )
        raise
    if where_block is not None:
        df = df.where(where_block)
    return df.select("src", "dst", "weight")


def apply_deltas(edges: DataFrame, deltas: DataFrame) -> DataFrame:
    """Pure batch merge: apply one micro-batch of events to an edge table.

    Last-writer-wins per (src, dst) within the batch (by ts, then op
    precedence), then: removals anti-join, additions/updates upsert.
    Deterministic regardless of batch row order.
    """
    from pyspark.sql import Window

    # weight as the final key: duplicate (src,dst,ts,op) events with
    # different weights must resolve identically on every run/parallelism
    w = Window.partitionBy("src", "dst").orderBy(
        F.desc("ts"), F.desc("op"), F.desc("weight")
    )
    last = (
        deltas.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    removes = last.where(F.col("op") == "remove_edge").select("src", "dst")
    upserts = last.where(F.col("op") != "remove_edge").select("src", "dst", "weight")
    kept = edges.join(removes.unionByName(upserts.select("src", "dst")), ["src", "dst"], "left_anti")
    return kept.unionByName(upserts)


def graph_difference(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """(op, src, dst, weight, ts) — the event stream transforming
    ``old_edges`` into ``new_edges`` (dynamics/GraphDifference.cpp: edge
    additions, removals and weight updates; node events are implied by
    their edges in the edge-table data model).

    Round-trip contract: ``apply_deltas(old_edges, graph_difference(old,
    new))`` equals ``new`` as a set of (src, dst, weight) rows. Undirected
    graphs should be passed in their canonical stored orientation (one row
    per pair) — the diff is a full-outer join on (src, dst), two shuffles
    total, deterministic ts so replays are idempotent."""
    o = old_edges.select(
        "src", "dst", F.coalesce(F.col("weight"), F.lit(1.0)).alias("ow")
    )
    n = new_edges.select(
        "src", "dst", F.coalesce(F.col("weight"), F.lit(1.0)).alias("nw")
    )
    j = o.join(n, ["src", "dst"], "full_outer")
    ts = F.to_timestamp(F.lit("2000-01-01 00:00:00"))
    return (
        j.where(F.col("ow").isNull() | F.col("nw").isNull() | (F.col("ow") != F.col("nw")))
        .select(
            F.when(F.col("ow").isNull(), F.lit("add_edge"))
            .when(F.col("nw").isNull(), F.lit("remove_edge"))
            .otherwise(F.lit("update_weight"))
            .alias("op"),
            "src",
            "dst",
            F.coalesce("nw", "ow").alias("weight"),
            ts.alias("ts"),
        )
    )


def stream_apply_deltas(
    spark: SparkSession,
    delta_path: str,
    table_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
):
    """Wire the stream: each micro-batch merges into the parquet edge table
    via foreachBatch (Iceberg MERGE INTO when available). Returns the
    StreamingQuery; caller awaits/ stops it."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        current = _read_edges_or_empty(spark_b, table_path)
        merged = apply_deltas(current, batch)
        # write-to-staging + directory-rename swap (parquet fallback for
        # Iceberg's atomic snapshot commit): the merged table is written
        # ONCE, the live path is replaced by two renames, and the staging
        # and retired copies are cleaned up afterwards. A crash between
        # the renames leaves the staging copy intact for recovery; a
        # crash before cleanup leaves only a recoverable extra copy,
        # never a partially-deleted live table.
        tmp = table_path + f"._staging_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        jvm = spark_b._jvm
        hpath = jvm.org.apache.hadoop.fs.Path
        fs = hpath(table_path).getFileSystem(spark_b._jsc.hadoopConfiguration())
        live, stage = hpath(table_path), hpath(tmp)
        retired = hpath(table_path + f"._retired_{batch_id}")
        if fs.exists(live):
            fs.rename(live, retired)
        fs.rename(stage, live)
        fs.delete(retired, True)

    stream = read_delta_stream(spark, delta_path, watermark)
    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_cc_additions(
    labels: DataFrame, added_edges: DataFrame, with_changed: bool = False
):
    """Incremental connected components under edge ADDITIONS (monotone:
    labels only merge — DynConnectedComponents.cpp's cheap path).

    Each added edge (u,v) unions u's and v's components: iterate label-min
    over the (tiny) component-adjacency induced by the additions, then
    broadcast-join the relabeling back onto the full label table. Cost is
    O(|additions| + #affected components), not O(n).

    ``with_changed=True`` additionally returns the (id) DataFrame of rows
    whose label actually changed (a broadcast semi-join against the tiny
    remap — no extra shuffle), so callers persisting labels in a
    block-partitioned table can rewrite only the touched blocks.
    """
    if "component" in labels.columns and "label" not in labels.columns:
        labels = labels.withColumnRenamed("component", "label")
    lab = labels.select("id", "label")
    # endpoints with no label row yet (brand-new vertices) default to
    # singleton labels (= their id) and JOIN the label table — an inner
    # join here silently dropped their edges and skipped the merge
    ends = (
        added_edges.select(F.col("src").alias("id"))
        .unionByName(added_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    newly = ends.join(lab, "id", "left_anti").select(
        "id", F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    lab = lab.unionByName(newly)
    e = (
        added_edges.select("src", "dst")
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "la"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "lb"), "dst")
        .select("la", "lb")
        .where(F.col("la") != F.col("lb"))
        .distinct()
    )
    # label-graph is tiny: close it driver-side with union-find
    pairs = [(r["la"], r["lb"]) for r in e.collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    mapping = [(old, find(old)) for old in parent if find(old) != old]
    if not mapping:
        # no merges — but brand-new singleton vertices still joined the
        # table, and their rows count as changed for block rewrites
        if with_changed:
            return lab, newly.select("id")
        return lab
    spark = labels.sparkSession
    remap = spark.createDataFrame(mapping, "label bigint, new_label bigint")
    out = (
        lab.join(F.broadcast(remap), "label", "left")
        .select("id", F.coalesce("new_label", "label").alias("label"))
    )
    if with_changed:
        changed = (
            lab.join(F.broadcast(remap), "label", "semi")
            .select("id")
            .unionByName(newly.select("id"))
            .distinct()
        )
        return out, changed
    return out


def incremental_cc_removals(
    labels: DataFrame, graph, removed_edges: DataFrame, with_changed: bool = False
):
    """Incremental connected components under edge REMOVALS
    (DynConnectedComponents.cpp's expensive path): a removal can SPLIT a
    component, so affected components are recomputed — but ONLY those.

    Plan: components touched by a removal → semi-join their vertices +
    surviving intra-component edges → hash-to-min CC on that (usually
    tiny) subgraph → splice new labels over the old table. Cost is
    O(affected subgraph), not O(n); untouched components' labels are
    byte-identical (ids canonical min-member on both paths).

    ``graph`` is the post-removal Graph; ``labels`` the pre-removal
    (id, label|component) table.
    """
    from linkgraph.algs.components import connected_components
    from linkgraph.graph import Graph as _G

    if "component" in labels.columns and "label" not in labels.columns:
        labels = labels.withColumnRenamed("component", "label")
    lab = labels.select("id", "label")
    touched = (
        removed_edges.select(F.col("src").alias("id"))
        .unionByName(removed_edges.select(F.col("dst").alias("id")))
        .join(lab, "id")
        .select("label")
        .distinct()
    )
    affected_nodes = lab.join(touched, "label", "left_semi").select("id")
    sub_edges = (
        graph.symmetric_edges()
        .join(affected_nodes.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(affected_nodes.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
    )
    sub_cc = connected_components(_G.from_edges(sub_edges, directed=False))
    new_labels = (
        affected_nodes.join(sub_cc, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("label"))
    )
    untouched = lab.join(touched, "label", "left_anti")
    out = untouched.unionByName(new_labels)
    if with_changed:
        # conservative changed set = every vertex of a touched component
        # (their labels were recomputed; most keep their value, but the
        # block write must cover all rows that MAY have moved)
        return out, affected_nodes
    return out


def write_blocked_edges(edges: DataFrame, table_path: str, n_blocks: int = 16) -> None:
    """Block-partitioned edge table for pruned streaming merges: block =
    pmod(src, n_blocks) partition column (same discipline as
    linkgraph.tables CSR blocks, coarse enough that a micro-batch touches
    few partitions)."""
    (
        edges.withColumn("block", F.pmod(F.col("src"), F.lit(n_blocks)).cast("int"))
        .repartition("block")
        .write.mode("overwrite")
        .partitionBy("block")
        .parquet(table_path)
    )


def read_blocked_edges(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(table_path).select("src", "dst", "weight")


def stream_apply_deltas_pruned(
    spark: SparkSession,
    delta_path: str,
    table_path: str,
    checkpoint_path: str,
    n_blocks: int = 16,
    watermark: str = "10 minutes",
):
    """Streaming merge that rewrites ONLY the block partitions a
    micro-batch touches (the parquet analogue of Iceberg MERGE INTO's
    pruned copy-on-write): dynamic partition overwrite + a block
    predicate derived from the batch keys. Untouched block files are
    byte-identical after the merge (asserted in tests). Per-batch cost is
    O(touched blocks), not O(table)."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        if batch.isEmpty():
            return
        blocks = [
            r["b"]
            for r in batch.select(
                F.pmod(F.col("src"), F.lit(n_blocks)).cast("int").alias("b")
            ).distinct().collect()
        ]
        current = _read_edges_or_empty(
            spark_b, table_path, F.col("block").isin(blocks)
        )
        merged = apply_deltas(current, batch)
        old_mode = spark_b.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.withColumn(
                    "block", F.pmod(F.col("src"), F.lit(n_blocks)).cast("int")
                )
                .write.mode("overwrite")
                .partitionBy("block")
                .parquet(table_path)
            )
        finally:
            spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    stream = read_delta_stream(spark, delta_path, watermark)
    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def incremental_wcc_additions(labels: DataFrame, added_edges: DataFrame) -> DataFrame:
    """DynWeaklyConnectedComponents addition path: direction is ignored
    for weak connectivity, so additions reduce to the undirected
    incremental merge (label pairs → distributed/driver closure) —
    delegate to incremental_cc_additions, which is direction-blind."""
    return incremental_cc_additions(labels, added_edges)
