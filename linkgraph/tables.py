"""CSR-block edge-table layout — the engine's physical table design.

North rule (BASELINE.json:6): "edges are stored as salted, range-partitioned
CSR-block Iceberg tables". This module is the format adapter: identical
layout on plain parquet locally; the same writer targets an Iceberg catalog
when the runtime jar is on the classpath (none is bundled in this sandbox —
verified, SURVEY §1.2).

Layout:
- ``block`` column = src id range-bucketed into ``n_blocks`` (hash-free
  range partitioning keeps src locality → min/max pruning per file);
- ``salt`` column = xxhash64(src,dst) % n_salts for hub domains whose block
  would otherwise be one giant file — within a block, rows for a hub src
  spread over salts, so downstream range scans parallelize;
- files partitioned by (block) and sorted within partitions by (src, dst):
  each parquet file is a CSR-ish run of adjacency — the distributed twin of
  NetworKit's adjacency array (graph/Graph.hpp outEdges).

Reading back restores a src-clustered edge DataFrame whose parquet
min/max statistics prune block ranges for subgraph/ego queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

# id_bits is capped at 62: 2^63 does not fit in a Java long literal, and
# pmod keeps every id (including negative xxhash64-encoded ones) in
# [0, 2^id_bits) with semantics identical to Python's non-negative ``%`` —
# the write-side Spark formula and the read-side Python formula below are
# the SAME integer function, so block pruning is sign-safe.
_MAX_ID_BITS = 62


def _span(id_bits: int, n_blocks: int) -> int:
    return ((1 << min(id_bits, _MAX_ID_BITS)) // n_blocks) or 1


def _block_col(id_bits: int, n_blocks: int) -> Column:
    """Spark block expression; integer arithmetic only (``div``, not ``/``:
    float division loses precision above 2^53)."""
    id_bits = min(id_bits, _MAX_ID_BITS)
    return F.expr(
        f"CAST(pmod(src, {1 << id_bits}) DIV {_span(id_bits, n_blocks)} AS INT)"
    )


def _block_of(x: int, id_bits: int, n_blocks: int) -> int:
    """Python mirror of :func:`_block_col` (Python ``%`` is non-negative
    for a positive modulus, matching pmod)."""
    id_bits = min(id_bits, _MAX_ID_BITS)
    return (x % (1 << id_bits)) // _span(id_bits, n_blocks)


def write_csr_blocks(
    edges: DataFrame,
    path: str,
    n_blocks: int = 64,
    n_salts: int = 8,
    id_bits: int = 62,
) -> None:
    """Write (src, dst, weight) as a salted, range-partitioned CSR-block
    parquet table. Range width derives from the id domain (2^id_bits for
    xxhash-encoded ids; pass smaller for dense fixture ids)."""
    df = edges.select(
        "src",
        "dst",
        "weight",
        _block_col(id_bits, n_blocks).alias("block"),
        # pmod, not abs: abs(xxhash64=Long.MIN_VALUE) overflows under ANSI
        F.pmod(F.xxhash64("src", "dst"), F.lit(n_salts)).cast("int").alias("salt"),
    )
    (
        df.repartition("block", "salt")
        .sortWithinPartitions("src", "dst")
        .write.mode("overwrite")
        .partitionBy("block")
        .parquet(path)
    )


def read_csr_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSR-block table back to (src, dst, weight). Predicate
    pushdown on src benefits from the per-file sort + block partitioning
    (partition pruning on ``block``, row-group min/max on ``src``)."""
    return spark.read.parquet(path).select("src", "dst", "weight")


def read_block_range(
    spark: SparkSession, path: str, src_min: int, src_max: int,
    n_blocks: int = 64, id_bits: int = 62,
) -> DataFrame:
    """Pruned scan: only blocks overlapping [src_min, src_max] are read
    (partition pruning via the block predicate + pushed src filter).

    Block pruning applies only when the whole range lands in one copy of
    the 2^id_bits domain (no pmod wrap inside the range — e.g. a range
    crossing 0 with id_bits=62 wraps); otherwise every block is scanned
    and the pushed src filter alone prunes row groups. Correct for any
    sign of src per the shared write/read block formula.
    """
    id_bits = min(id_bits, _MAX_ID_BITS)
    df = spark.read.parquet(path)
    if src_min // (1 << id_bits) == src_max // (1 << id_bits):
        b_lo = _block_of(src_min, id_bits, n_blocks)
        b_hi = _block_of(src_max, id_bits, n_blocks)
        df = df.where((F.col("block") >= b_lo) & (F.col("block") <= b_hi))
    return (
        df.where((F.col("src") >= src_min) & (F.col("src") <= src_max))
        .select("src", "dst", "weight")
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable (runtime jar present)."""
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def write_edges_table(
    spark: SparkSession,
    edges: DataFrame,
    name_or_path: str,
    n_blocks: int = 64,
    n_salts: int = 8,
    id_bits: int = 62,
) -> str:
    """Format adapter: Iceberg table when the runtime is present, plain
    parquet CSR blocks otherwise. Returns the storage kind used."""
    if iceberg_available(spark):
        # identical logical layout via Iceberg's partition transforms
        df = edges.select(
            "src", "dst", "weight",
            _block_col(id_bits, n_blocks).alias("block"),
            F.pmod(F.xxhash64("src", "dst"), F.lit(n_salts)).cast("int").alias("salt"),
        )
        df.sortWithinPartitions("src", "dst").writeTo(name_or_path).partitionedBy(
            "block"
        ).createOrReplace()
        return "iceberg"
    write_csr_blocks(edges, name_or_path, n_blocks, n_salts, id_bits)
    return "parquet"


def community_shard_plan(
    labels: DataFrame,
    n_shards: int,
    max_explicit: int = 1024,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(label, shard) — community-aware placement: map each community
    (e.g. PLP/Louvain labels, host-graph components) to one of
    ``n_shards`` shards so intra-community edges stay shard-local. The
    physical-design step between community detection and
    ``write_edges_table`` at 100-TB scale: co-locating communities turns
    most superstep shuffle traffic into intra-partition exchange.

    Placement rule (deterministic, SQL-replayable): the ``max_explicit``
    LARGEST communities are sorted by (size desc, label asc) and dealt
    round-robin — sorted round-robin keeps the max shard load within one
    head community of the mean over the explicit set (the classic
    balancing argument; LPT's marginally tighter bound needs a
    sequential argmin loop that would not replay). The tail hashes by
    label. The explicit-head window sorts only ``max_explicit`` rows
    (top-k via one size agg + limit — no global sort of all labels)."""
    from linkgraph.portable import phash

    sizes = labels.groupBy("label").agg(F.count("*").alias("_n"))
    heads = (
        sizes.orderBy(F.desc("_n"), F.asc("label"))
        .limit(int(max_explicit))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.desc("_n"), F.asc("label"))
            ),
        )
        .select(
            "label",
            F.pmod(F.col("_rk") - 1, F.lit(int(n_shards))).cast("int").alias(
                "shard"
            ),
        )
    )
    h = (
        phash(F.col("label"), F.lit(int(seed)))
        if portable
        else F.xxhash64("label", F.lit(int(seed)))
    )
    tail = (
        sizes.join(heads.select("label"), "label", "left_anti")
        .select("label", F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"))
    )
    return heads.unionByName(tail)


def apply_shard_plan(
    edges: DataFrame, labels: DataFrame, plan: DataFrame, n_shards: int
) -> DataFrame:
    """Edges tagged (src, dst, weight, shard) by the SOURCE vertex's
    community shard (broadcast the model-sized plan), repartitioned by
    shard — the write-side companion of :func:`community_shard_plan`.

    LEFT joins throughout: an edge whose src has no label (isolated/new
    vertices, labels computed on an earlier snapshot) or whose label is
    missing from the plan falls back to hash(src) % n_shards instead of
    being silently dropped — the sharded table must stay a permutation
    of the input edges."""
    lab = labels.join(F.broadcast(plan), "label", "left").select(
        F.col("id").alias("src"), "shard"
    )
    fallback = F.pmod(F.xxhash64("src"), F.lit(int(n_shards))).cast("int")
    return (
        edges.join(lab, "src", "left")
        .withColumn("shard", F.coalesce("shard", fallback))
        .repartition(int(n_shards), "shard")
    )


def adjacency_table(
    graph, max_chunk: int = 1024, use_symmetric: bool = False
) -> DataFrame:
    """(src, chunk, n, neighbors) — sorted neighbor lists chunked at
    ``max_chunk`` ids per row: the serving/export shape of the edge
    table (one seek returns a vertex's out-links in order). Chunking
    happens BEFORE the collect — neighbor rank // max_chunk via a window
    partitioned by src (task size bounded by a vertex's degree, chunk
    arrays bounded by max_chunk) — so a 10⁸-degree hub becomes 10⁸/1024
    bounded rows instead of one executor-OOM array. ``neighbors`` is the
    comma-joined id string (storage- and oracle-stable); round-trip with
    :func:`edges_from_adjacency`."""
    from linkgraph.graph import Graph  # noqa: F401 - typing only

    e = (
        graph.symmetric_edges() if use_symmetric else graph.edges
    ).select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    ranked = e.withColumn("_r", F.row_number().over(w) - 1)
    return (
        ranked.groupBy(
            "src",
            (F.col("_r") / int(max_chunk)).cast("int").alias("chunk"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.array_join(
                F.sort_array(F.collect_list("dst")), ","
            ).alias("neighbors"),
        )
    )


def edges_from_adjacency(adj: DataFrame) -> DataFrame:
    """Inverse of :func:`adjacency_table`: explode the chunked neighbor
    strings back to (src, dst) rows."""
    return adj.select(
        "src",
        F.explode(F.split("neighbors", ",")).alias("dst"),
    ).select("src", F.col("dst").cast("bigint").alias("dst"))
