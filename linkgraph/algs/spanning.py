"""Spanning forests via distributed Borůvka rounds.

Reference parity: graph/SpanningForest.cpp (BFS tree per component) and
graph/UnionMaximumSpanningForest.cpp / RandomMaximumSpanningForest.cpp
(Kruskal with sorted edges). Kruskal's global sort + sequential union-find
does not distribute; Borůvka does (SURVEY §2A maps SpanningForest to
"Borůvka rounds as iterative DF min-edge-per-component joins"):

each round, every component picks its lightest (or heaviest, for maximum
forests) outgoing edge — a groupBy(component).min over the component-
labeled edge list — those edges join the forest, components merge
(label-min over the picked edges, closed driver-side on the tiny
component graph), repeat; O(log n) rounds.

Determinism: ties broken by (weight, src, dst) total order, so the forest
is unique and partition-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def spanning_forest(graph: Graph, maximum: bool = False, max_rounds: int = 64) -> DataFrame:
    """(src, dst, weight) rows of the minimum (default) or maximum
    spanning forest; one tree per connected component."""
    canon = (
        graph.symmetric_edges()
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
        .persist()
    )
    comp = canon.select(F.col("src").alias("id")).unionAll(
        canon.select(F.col("dst").alias("id"))
    ).distinct().select("id", F.col("id").alias("c")).localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
        )
        forest = forest.unionByName(cand).localCheckpoint(eager=True)
        # merge components along picked edges (tiny: ≤ #components rows)
        pairs = (
            cand.join(comp.withColumnRenamed("id", "src").withColumnRenamed("c", "ca"), "src")
            .join(comp.withColumnRenamed("id", "dst").withColumnRenamed("c", "cb"), "dst")
            .select("ca", "cb")
            .collect()
        )
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            a, b = find(r["ca"]), find(r["cb"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        remap = [(old, find(old)) for old in parent]
        if remap:
            rdf = canon.sparkSession.createDataFrame(remap, "c bigint, nc bigint")
            comp = (
                comp.join(F.broadcast(rdf), "c", "left")
                .select("id", F.coalesce("nc", "c").alias("c"))
                .localCheckpoint(eager=True)
            )
    canon.unpersist()
    return forest
