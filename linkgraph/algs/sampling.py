"""Minibatch graph sampling for representation-learning pipelines.

No NetworKit analogue — this is the webtext/training-data half of the
engine: GraphSAGE-style layered neighbor sampling (Hamilton et al. 2017)
producing the deduplicated bipartite blocks a GNN trainer consumes, and
degree-biased negative sampling for embedding objectives.

Both are deterministic by seeded hash (the engine-wide N-vs-4N identity
rule): "random" choices are rankings of xxhash64/portable-md5 values, so
any cluster size reproduces the same sample bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def layered_neighbor_sample(
    graph: Graph,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (10, 5),
    seed: int = 42,
    portable: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """(hop, src, dst) — layered fan-out sample: hop 1 keeps at most
    ``fanouts[0]`` neighbors per seed, hop 2 at most ``fanouts[1]``
    neighbors per DISTINCT hop-1 frontier vertex, and so on (the
    deduplicated-frontier blocks of DGL/PyG minibatch training, not
    per-root trees — frontier size is bounded by ∑∏fanouts but shared
    vertices are expanded once).

    Per layer: one frontier semi-join against the persisted symmetric
    edge table + one row_number window PARTITIONED BY src ordered by
    (hash(src, dst, seed, hop), dst) — per-vertex groups are degree-
    sized, so the window never exceeds a hub's degree and there is no
    global sort. Neighbor choice re-rolls per hop (hash includes the hop)
    exactly like fresh per-layer sampling."""
    from linkgraph.portable import phash

    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    frontier = seeds.select(F.col(seeds.columns[0]).alias("src")).distinct()
    out = None
    for hop, fan in enumerate(fanouts, start=1):
        h = (
            phash(F.col("src"), F.col("dst"), F.lit(int(seed)), F.lit(hop))
            if portable
            else F.xxhash64("src", "dst", F.lit(int(seed)), F.lit(hop))
        )
        w = Window.partitionBy("src").orderBy(h.asc(), F.col("dst").asc())
        layer = (
            sym.join(frontier, "src", "leftsemi")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(fan))
            .select(F.lit(hop).alias("hop"), "src", "dst")
        )
        out = layer if out is None else out.unionByName(layer)
        frontier = layer.select(F.col("dst").alias("src")).distinct()
    if not materialize:  # plan-inspection path: caller keeps sym alive
        return out
    out = out.persist()
    out.count()  # materialize before releasing the edge cache
    sym.unpersist()
    return out


def negative_samples(
    graph: Graph,
    n_per_node: int = 5,
    power: float = 0.75,
    seed: int = 42,
    candidate_pool: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """(src, neg) — degree^``power``-biased negative pairs (the word2vec
    noise distribution) for contrastive objectives, ``n_per_node`` per
    vertex, hash-deterministic.

    Distributed draw without a global cumulative table: candidates are
    drawn uniformly by hashing (src, slot) into the compacted id space,
    then accepted with probability ∝ (deg(cand)/max_deg)^power via a
    second hash coin (rejection sampling against the degree table —
    one broadcast-or-shuffle join, no driver state). ``candidate_pool``
    slots per requested sample bound the retry budget; vertices whose
    draws all reject emit fewer than ``n_per_node`` pairs (documented —
    at power 0.75 acceptance is high and the gap is rare). Self-pairs
    and true edges are NOT filtered here (the trainer's objective does
    that, matching word2vec); anti-join ``graph.symmetric_edges()`` if
    needed."""
    deg = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    n = deg.count()
    max_deg = deg.agg(F.max("deg")).collect()[0][0] or 1
    # dense candidate index WITHOUT a global window: range-partition by
    # id, rank within each partition, add per-partition prefix offsets
    # (the roc_auc linearization pattern — one row per partition to the
    # driver, never a SinglePartition exchange)
    spark = deg.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        deg.repartitionByRange(n_parts, "id")
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    part_tot = ranged.groupBy("pid").agg(F.count("*").alias("c")).collect()
    offsets, acc = {}, 0
    for r in sorted(part_tot, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["c"]
    off_df = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()] or [(0, 0)], "pid int, off bigint"
    )
    wl = Window.partitionBy("pid").orderBy("id")
    idx = (
        ranged.withColumn("_r", F.row_number().over(wl) - 1)
        .join(F.broadcast(off_df), "pid")
        .select("id", (F.col("_r") + F.col("off")).alias("pos"))
    )
    slots = deg.select("id").crossJoin(
        F.broadcast(
            deg.sparkSession.range(int(n_per_node * candidate_pool)).select(
                F.col("id").alias("slot")
            )
        )
    )
    cand = slots.select(
        "id",
        "slot",
        F.pmod(F.xxhash64("id", "slot", F.lit(int(seed))), F.lit(int(n))).alias(
            "pos"
        ),
    ).join(idx.select(F.col("pos"), F.col("id").alias("neg")), "pos")
    accepted = (
        cand.join(deg.select(F.col("id").alias("neg"), "deg"), "neg")
        .where(
            F.pmod(F.xxhash64("id", "slot", F.lit(int(seed) + 1)), F.lit(1_000_000))
            / 1_000_000.0
            < F.pow(F.col("deg") / F.lit(float(max_deg)), F.lit(float(power)))
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.col("slot").asc())
            ),
        )
        .where(F.col("_rn") <= int(n_per_node))
        .select(F.col("id").alias("src"), "neg")
    )
    if not materialize:  # plan-inspection path: caller keeps deg alive
        return accepted
    accepted = accepted.persist()
    accepted.count()  # materialize before releasing the degree cache
    deg.unpersist()
    return accepted
