"""Partition quality + comparison measures and coarsening.

Reference parity: networkit/cpp/community/{Modularity,Coverage,EdgeCut,
NMIDistance,AdjustedRandMeasure,JaccardMeasure,ClusteringGenerator,
PartitionIntersection}.cpp and coarsening/ParallelPartitionCoarsening.cpp.
All are pure DataFrame joins + hash aggregations — no iteration.

Matrix-form modularity (exact):
    Q = Σ_sym(A_ij·δ(c_i,c_j)) / 2W  −  Σ_c (vol_c / 2W)²
with A the symmetric adjacency, 2W = Σ_sym A_ij, vol_c = Σ_{i∈c} k_i.
One labels⋈edges join + two hash aggs (SURVEY §2A).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _labeled_sym_edges(graph: Graph, labels: DataFrame) -> DataFrame:
    lab = labels.select("id", "label")
    return (
        graph.symmetric_edges()
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "src_label"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "dst_label"), "dst")
    )


def modularity(graph: Graph, labels: DataFrame) -> float:
    """community/Modularity.cpp::getQuality."""
    e = _labeled_sym_edges(graph, labels)
    tot = e.agg(
        F.sum("weight").alias("two_w"),
        F.sum(F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)).alias("intra"),
    ).collect()[0]
    two_w, intra = float(tot["two_w"] or 0.0), float(tot["intra"] or 0.0)
    if two_w == 0.0:
        return 0.0
    vol = (
        e.groupBy("src_label").agg(F.sum("weight").alias("vol"))
        .agg(F.sum(F.col("vol") * F.col("vol")).alias("v2"))
        .collect()[0]["v2"]
    )
    return intra / two_w - float(vol) / (two_w * two_w)


def coverage(graph: Graph, labels: DataFrame) -> float:
    """Fraction of edge weight that is intra-community (Coverage.cpp)."""
    e = _labeled_sym_edges(graph, labels)
    row = e.agg(
        F.sum("weight").alias("two_w"),
        F.sum(F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)).alias("intra"),
    ).collect()[0]
    return float(row["intra"] or 0.0) / float(row["two_w"]) if row["two_w"] else 0.0


def edge_cut(graph: Graph, labels: DataFrame) -> float:
    """Total weight of inter-community edges, each counted once (EdgeCut.cpp)."""
    e = _labeled_sym_edges(graph, labels).where(F.col("src") < F.col("dst"))
    row = e.where(F.col("src_label") != F.col("dst_label")).agg(F.sum("weight").alias("c")).collect()[0]
    return float(row["c"] or 0.0)


# ---------------------------------------------------------------------------
# Partition-vs-partition comparison (test infrastructure, SURVEY §2A)
# ---------------------------------------------------------------------------

def _contingency(a: DataFrame, b: DataFrame) -> DataFrame:
    """groupBy(label_a, label_b).count() over the shared id domain."""
    return (
        a.select("id", F.col("label").alias("la"))
        .join(b.select("id", F.col("label").alias("lb")), "id")
        .groupBy("la", "lb")
        .agg(F.count("*").alias("n"))
    )


def nmi(a: DataFrame, b: DataFrame) -> float:
    """Normalized mutual information in [0,1] (NMIDistance.cpp computes
    1−NMI; we expose NMI itself). Driver-side math over the contingency
    table — the table is (#clusters_a × #clusters_b), tiny by construction."""
    ct = _contingency(a, b).collect()
    n = sum(r["n"] for r in ct)
    if n == 0:
        return 1.0
    pa: dict = {}
    pb: dict = {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["n"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["n"]
    mi = 0.0
    for r in ct:
        pij = r["n"] / n
        mi += pij * math.log(pij * n * n / (pa[r["la"]] * pb[r["lb"]]))
    ha = -sum((c / n) * math.log(c / n) for c in pa.values())
    hb = -sum((c / n) * math.log(c / n) for c in pb.values())
    if ha == 0.0 and hb == 0.0:
        return 1.0
    denom = (ha + hb) / 2.0
    return mi / denom if denom > 0 else 0.0


def adjusted_rand(a: DataFrame, b: DataFrame) -> float:
    """Adjusted Rand index (AdjustedRandMeasure.cpp exposes the distance
    1−ARI; we expose ARI)."""
    ct = _contingency(a, b).collect()
    n = sum(r["n"] for r in ct)

    def c2(x: int) -> float:
        return x * (x - 1) / 2.0

    pa: dict = {}
    pb: dict = {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["n"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["n"]
    sum_ij = sum(c2(r["n"]) for r in ct)
    sum_a = sum(c2(x) for x in pa.values())
    sum_b = sum(c2(x) for x in pb.values())
    total = c2(n)
    expected = sum_a * sum_b / total if total else 0.0
    max_idx = (sum_a + sum_b) / 2.0
    if max_idx == expected:
        return 1.0
    return (sum_ij - expected) / (max_idx - expected)


def partition_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """Finest common refinement: each (label_a, label_b) pair becomes one
    cluster (PartitionIntersection.cpp); output canonicalized to min id."""
    joined = (
        a.select("id", F.col("label").alias("la"))
        .join(b.select("id", F.col("label").alias("lb")), "id")
    )
    canon = joined.groupBy("la", "lb").agg(F.min("id").alias("label"))
    return joined.join(canon, ["la", "lb"]).select("id", "label")


# ---------------------------------------------------------------------------
# Coarsening (community/PLM dependency; coarsening/ParallelPartitionCoarsening)
# ---------------------------------------------------------------------------

def coarsen(graph: Graph, labels: DataFrame) -> Graph:
    """Contract each community to a super-vertex; parallel edge weights sum,
    intra-community edges become self-loops (weights preserved)."""
    lab = labels.select("id", "label")
    e = (
        graph.edges
        .join(lab.withColumnRenamed("id", "src").withColumnRenamed("label", "sl"), "src")
        .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("label", "dl"), "dst")
    )
    if graph.directed:
        coarse = e.groupBy(F.col("sl").alias("src"), F.col("dl").alias("dst"))
    else:
        coarse = e.groupBy(
            F.least("sl", "dl").alias("src"), F.greatest("sl", "dl").alias("dst")
        )
    return Graph(
        coarse.agg(F.sum("weight").alias("weight")),
        directed=graph.directed,
        weighted=True,
    )


def singleton_partition(graph: Graph) -> DataFrame:
    """ClusteringGenerator::makeSingletonClustering."""
    return graph.nodes().select("id", F.col("id").alias("label"))


def one_partition(graph: Graph) -> DataFrame:
    """ClusteringGenerator::makeOneClustering (all nodes one cluster,
    labeled by the min id for canonical form)."""
    nodes = graph.nodes()
    m = nodes.agg(F.min("id").alias("m"))
    return nodes.crossJoin(F.broadcast(m)).select("id", F.col("m").alias("label"))
