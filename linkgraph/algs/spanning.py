"""Spanning forests via distributed Borůvka rounds.

Reference parity: graph/SpanningForest.cpp (BFS tree per component) and
graph/UnionMaximumSpanningForest.cpp / RandomMaximumSpanningForest.cpp
(Kruskal with sorted edges). Kruskal's global sort + sequential union-find
does not distribute; Borůvka does (SURVEY §2A maps SpanningForest to
"Borůvka rounds as iterative DF min-edge-per-component joins"):

each round, every component picks its lightest (or heaviest, for maximum
forests) outgoing edge — a groupBy(component).min over the component-
labeled edge list — those edges join the forest, components merge
(distributed hash-to-min closure of the picked-edge component graph;
driver union-find only below a 100k-pair threshold), repeat; O(log n)
rounds.

Determinism: ties broken by (weight, src, dst) total order, so the forest
is unique and partition-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def spanning_forest(graph: Graph, maximum: bool = False, max_rounds: int = 64) -> DataFrame:
    """(src, dst, weight) rows of the minimum (default) or maximum
    spanning forest; one tree per connected component."""
    from linkgraph.iterutil import Pin

    # parquet-pinned loop state: the per-round plan carries a window and
    # localCheckpoint does not truncate those on Spark 4.1 (see iterutil)
    pin = Pin(graph.edges.sparkSession, "boruvka")
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
        .persist()
    )
    comp = pin(canon.select(F.col("src").alias("id")).unionAll(
        canon.select(F.col("dst").alias("id"))
    ).distinct().select("id", F.col("id").alias("c")), "comp")
    forest = canon.sparkSession.createDataFrame([], "src bigint, dst bigint, weight double")

    order = [F.desc("weight")] if maximum else [F.asc("weight")]
    for _ in range(max_rounds):
        labeled = (
            canon.join(comp.withColumnRenamed("id", "src").withColumnRenamed("c", "cs"), "src")
            .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("c", "cd"), "dst")
            .where(F.col("cs") != F.col("cd"))
        )
        if labeled.isEmpty():
            break
        # each component's best outgoing edge (unique via total order)
        pick_w = Window.partitionBy("cc").orderBy(*order, F.asc("src"), F.asc("dst"))
        cand = (
            labeled.select("src", "dst", "weight", F.col("cs").alias("cc"))
            .unionByName(labeled.select("src", "dst", "weight", F.col("cd").alias("cc")))
            .withColumn("rn", F.row_number().over(pick_w))
            .where(F.col("rn") == 1)
            .select("src", "dst", "weight")
            .distinct()
        )
        cand = pin(cand, "cand")
        forest = pin(forest.unionByName(cand), "forest")
        # merge components along picked edges. In round 1 the picked-edge
        # component graph has ~n/2 edges — a driver-side union-find there
        # is an O(n) collect (the round-1 scale killer); the closure is
        # therefore computed DISTRIBUTED (hash-to-min on the component-pair
        # graph, the same machinery as connected_components), with a
        # driver union-find fast path only once the component graph is
        # provably tiny.
        pairs_df = pin(
            cand.join(comp.withColumnRenamed("id", "src").withColumnRenamed("c", "ca"), "src")
            .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("c", "cb"), "dst")
            .select("ca", "cb"),
            "pairs",
        )
        n_pairs = pairs_df.count()
        if n_pairs == 0:
            break
        if n_pairs <= 100_000:
            parent: dict = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in pairs_df.collect():
                a, b = find(r["ca"]), find(r["cb"])
                if a != b:
                    parent[max(a, b)] = min(a, b)
            remap = [(old, find(old)) for old in parent]
            rdf = canon.sparkSession.createDataFrame(remap, "c bigint, nc bigint")
            rdf = F.broadcast(rdf)
        else:
            from linkgraph.algs.components import connected_components

            pair_graph = Graph.from_edges(
                pairs_df.select(
                    F.col("ca").alias("src"),
                    F.col("cb").alias("dst"),
                    F.lit(1.0).alias("weight"),
                ),
                directed=False,
            )
            rdf = connected_components(pair_graph).select(
                F.col("id").alias("c"), F.col("component").alias("nc")
            )
        comp = pin(
            comp.join(rdf, "c", "left")
            .select("id", F.coalesce("nc", "c").alias("c")),
            "comp",
        )
    canon.unpersist()
    return forest
