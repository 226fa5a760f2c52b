"""Node2Vec random-walk generation (embedding/Node2Vec.cpp parity — the
walk corpus; training the skip-gram model is out of scope, as SURVEY §2A
notes: "random-walk generation = iterative sampled joins").

Second-order (p, q)-biased walks, fully distributed and DETERMINISTIC:
- every step explodes the current vertices' candidate neighbors (one join
  with the symmetric edge list);
- the return/in-out bias weights each candidate: 1/p if it equals the
  previous vertex, 1 if it neighbors the previous vertex (checked with a
  left join on the edge list), else 1/q;
- weighted sampling uses the exponential-race trick: candidate with the
  max of u^(1/w) wins, where u = hash-uniform(walk, step, candidate) —
  partition-order independent, reproducible from the seed.

State is (walk_id, step, prev, cur); walk length L costs L rounds of
join + window. At web scale the explode fan-out is bounded per round by
the average degree; hub rows can be pre-capped with the same wedge-degree
discipline as link prediction if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def node2vec_walks(
    graph: Graph,
    walks_per_node: int = 2,
    walk_length: int = 5,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(walk_id, pos, vertex) — walk corpus rows in step order.
    ``portable=True`` races on the md5 portable hash so the gate's DuckDB
    oracle can replay the identical walks step by step."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().select("src", "dst").persist()
    edge_set = sym.select(
        F.col("src").alias("prev"), F.col("dst").alias("cand")
    ).withColumn("is_nbr", F.lit(1)).persist()

    starts = (
        graph.nodes()
        .crossJoin(spark.range(walks_per_node).withColumnRenamed("id", "w"))
        .select(
            (F.col("id") * walks_per_node + F.col("w")).alias("walk_id"),
            F.col("id").alias("cur"),
            F.lit(None).cast("bigint").alias("prev"),
        )
        .localCheckpoint(eager=True)
    )
    corpus = starts.select("walk_id", F.lit(0).alias("pos"), F.col("cur").alias("vertex"))
    state = starts

    for step in range(1, walk_length):
        cands = state.join(sym, state.cur == sym.src).select(
            "walk_id", "prev", "cur", F.col("dst").alias("cand")
        )
        scored = cands.join(edge_set, ["prev", "cand"], "left").withColumn(
            "w",
            F.when(F.col("cand") == F.col("prev"), 1.0 / p)
            .when(F.col("is_nbr").isNotNull(), 1.0)
            .otherwise(1.0 / q),
        )
        # pmod, not abs: abs(Long.MIN_VALUE) overflows under ANSI mode;
        # +1 over M+1 keeps u strictly in (0, 1] so log(u) is finite
        if portable:
            from linkgraph.portable import phash

            raw = phash("walk_id", "cand", F.lit(step), F.lit(seed))
        else:
            raw = F.xxhash64("walk_id", "cand", F.lit(step), F.lit(seed))
        u = (F.pmod(raw, F.lit(1_000_000_007)) + 1) / 1_000_000_008.0
        # exponential race: max u^(1/w) ⇔ weighted sample; log form avoids
        # pow underflow and keeps the comparison monotone
        key = F.log(u) / F.col("w")
        win = Window.partitionBy("walk_id").orderBy(F.desc(key), F.asc("cand"))
        nxt = (
            scored.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select("walk_id", F.col("cur").alias("prev"), F.col("cand").alias("cur"))
            .localCheckpoint(eager=True)
        )
        # walks at dead ends (no candidates) simply stop
        state = nxt
        corpus = corpus.unionByName(
            state.select("walk_id", F.lit(step).alias("pos"), F.col("cur").alias("vertex"))
        )
    sym.unpersist()
    edge_set.unpersist()
    return corpus.localCheckpoint(eager=True)


def node2vec_embeddings(
    graph: Graph,
    dim: int = 32,
    walks_per_node: int = 8,
    walk_length: int = 10,
    p: float = 1.0,
    q: float = 1.0,
    window: int = 5,
    max_iter: int = 1,
    num_partitions: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(id, embedding array<double>) — full Node2Vec: the walk corpus above
    fed to Spark MLlib's distributed Word2Vec (JVM-side skip-gram with
    hierarchical softmax), completing embedding/Node2Vec.cpp parity.

    Scale shape: walk generation is L rounds of join+window (see module
    docstring); training is MLlib's data-parallel SGD — the vocabulary
    (one vector per vertex) is broadcast per iteration, so dim * n floats
    must fit per executor. That is Word2Vec's standard envelope; for
    10^9+ vertices shard the graph by component or train on the
    compact-id space. ``num_partitions=1`` keeps training deterministic
    for a fixed seed (MLlib updates are otherwise merge-order dependent).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    walks = node2vec_walks(
        graph,
        walks_per_node=walks_per_node,
        walk_length=walk_length,
        p=p,
        q=q,
        seed=seed,
    )
    sentences = walks.groupBy("walk_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "vertex"))),
            lambda s: s["vertex"].cast("string"),
        ).alias("walk")
    )
    model = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=0,
        maxIter=max_iter,
        numPartitions=num_partitions,
        seed=seed,
        inputCol="walk",
        outputCol="vec",
    ).fit(sentences)
    return model.getVectors().select(
        F.col("word").cast("bigint").alias("id"),
        vector_to_array(F.col("vector")).alias("embedding"),
    )
