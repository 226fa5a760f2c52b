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


# ---------------------------------------------------------------------------
# Per-community quality metrics (community/{HubDominance, Intrapartition
# Density, IsolatedInterpartitionConductance/Expansion, StablePartitionNodes,
# PartitionFragmentation}.cpp). Each returns a per-community DataFrame; the
# reference's scalar summaries are one agg away. Pinned definitions are in
# each docstring — all pure joins + hash aggs over labels⋈edges.
# ---------------------------------------------------------------------------


def _community_stats(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, size, internal_w, cut_w, vol) — the shared per-community
    aggregate every quality metric below derives from. internal_w counts
    each intra edge once; vol = Σ weighted degrees; cut_w = weight leaving
    the community."""
    e = _labeled_sym_edges(graph, labels)
    per = e.groupBy(F.col("src_label").alias("label")).agg(
        F.sum("weight").alias("vol"),
        F.sum(
            F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)
        ).alias("intra2"),
        F.sum(
            F.when(F.col("src_label") != F.col("dst_label"), F.col("weight")).otherwise(0.0)
        ).alias("cut_w"),
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(per, "label", "left").select(
        "label",
        "size",
        (F.coalesce("intra2", F.lit(0.0)) / 2.0).alias("internal_w"),
        F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        F.coalesce("vol", F.lit(0.0)).alias("vol"),
    )


def hub_dominance(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, hub_dominance) — max INTERNAL degree of any member divided
    by (size − 1); 0 for singletons (HubDominance.cpp)."""
    e = _labeled_sym_edges(graph, labels).where(
        F.col("src_label") == F.col("dst_label")
    )
    internal_deg = e.groupBy(
        F.col("src").alias("id"), F.col("src_label").alias("label")
    ).agg(F.count("*").alias("d"))
    max_d = internal_deg.groupBy("label").agg(F.max("d").alias("max_d"))
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(max_d, "label", "left").select(
        "label",
        F.when(
            F.col("size") > 1,
            F.coalesce("max_d", F.lit(0)) / (F.col("size") - 1),
        )
        .otherwise(0.0)
        .alias("hub_dominance"),
    )


def intrapartition_density(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, density) — internal edge count over size·(size−1)/2
    (IntrapartitionDensity.cpp; unweighted edge counts)."""
    e = _labeled_sym_edges(graph, labels).where(
        (F.col("src_label") == F.col("dst_label")) & (F.col("src") < F.col("dst"))
    )
    counts = e.groupBy(F.col("src_label").alias("label")).agg(
        F.count("*").alias("m_in")
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(counts, "label", "left").select(
        "label",
        F.when(
            F.col("size") > 1,
            F.coalesce("m_in", F.lit(0)) * 2.0 / (F.col("size") * (F.col("size") - 1)),
        )
        .otherwise(0.0)
        .alias("density"),
    )


def isolated_interpartition_conductance(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, conductance) — cut(C) / min(vol(C), 2W − vol(C)), each
    community scored against the rest of the graph in isolation
    (IsolatedInterpartitionConductance.cpp). Whole-graph communities get 0."""
    stats = _community_stats(graph, labels)
    two_w = graph.symmetric_edges().agg(F.sum("weight")).collect()[0][0] or 0.0
    denom = F.least(F.col("vol"), F.lit(float(two_w)) - F.col("vol"))
    return stats.select(
        "label",
        F.when(denom > 0, F.col("cut_w") / denom).otherwise(0.0).alias("conductance"),
    )


def isolated_interpartition_expansion(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, expansion) — cut(C) / min(|C|, n − |C|)
    (IsolatedInterpartitionExpansion.cpp)."""
    stats = _community_stats(graph, labels)
    n = labels.count()
    denom = F.least(F.col("size"), F.lit(n) - F.col("size"))
    return stats.select(
        "label",
        F.when(denom > 0, F.col("cut_w") / denom).otherwise(0.0).alias("expansion"),
    )


def stable_partition_nodes(graph: Graph, labels: DataFrame) -> DataFrame:
    """(id, stable) — a node is stable iff at least half of its weighted
    degree stays inside its own community (it would not be pulled away by
    any single other community; StablePartitionNodes.cpp's notion pinned
    to the weighted-majority rule). Isolated nodes are stable."""
    e = _labeled_sym_edges(graph, labels)
    per = e.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wdeg"),
        F.sum(
            F.when(F.col("src_label") == F.col("dst_label"), F.col("weight")).otherwise(0.0)
        ).alias("w_in"),
    )
    return (
        labels.select("id")
        .join(per, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("wdeg", F.lit(0.0)) == 0.0, F.lit(True)
            )
            .otherwise(F.col("w_in") >= 0.5 * F.col("wdeg"))
            .alias("stable"),
        )
    )


def partition_fragmentation(graph: Graph, labels: DataFrame) -> DataFrame:
    """(label, fragmentation) — 1 − |largest connected block of C| / |C|
    (PartitionFragmentation.cpp): 0 ⇔ the community induces a connected
    subgraph. One CC run on the intra-community edge subset covers ALL
    communities at once."""
    from linkgraph.algs.components import connected_components

    lab = labels.select("id", "label")
    intra = (
        _labeled_sym_edges(graph, lab)
        .where(F.col("src_label") == F.col("dst_label"))
        .select("src", "dst", "weight")
    )
    blocks_graph = Graph.from_edges(intra, directed=False)
    comp = connected_components(blocks_graph)
    block_sizes = (
        lab.join(comp, "id", "left")
        .select("label", F.coalesce("component", F.col("id")).alias("block"))
        .groupBy("label", "block")
        .agg(F.count("*").alias("bs"))
    )
    largest = block_sizes.groupBy("label").agg(F.max("bs").alias("largest"))
    sizes = lab.groupBy("label").agg(F.count("*").alias("size"))
    return sizes.join(largest, "label").select(
        "label", (1.0 - F.col("largest") / F.col("size")).alias("fragmentation")
    )


def jaccard_measure(a: DataFrame, b: DataFrame) -> float:
    """Node-pair Jaccard similarity between two partitions
    (community/JaccardMeasure.cpp, which reports the DISTANCE 1−J; we
    expose J): over all unordered node pairs, J = s11 / (s11 + s10 + s01)
    with s11 = pairs together in both, s10/s01 = together in exactly one.
    Computed from the contingency table — no pair enumeration."""
    ct = _contingency(a, b).collect()
    n = sum(r["n"] for r in ct)
    if n < 2:
        return 1.0

    def c2(x: int) -> float:
        return x * (x - 1) / 2.0

    pa: dict = {}
    pb: dict = {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["n"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["n"]
    s11 = sum(c2(r["n"]) for r in ct)
    sa = sum(c2(x) for x in pa.values())
    sb = sum(c2(x) for x in pb.values())
    denom = sa + sb - s11  # s11 + s10 + s01
    return s11 / denom if denom > 0 else 1.0


def node_structural_rand(a: DataFrame, b: DataFrame) -> float:
    """Rand DISTANCE over all node pairs
    (community/NodeStructuralRandMeasure.cpp): fraction of unordered
    pairs the two partitions classify differently, 1 − RandIndex.
    Contingency-table arithmetic, no pair enumeration."""
    ct = _contingency(a, b).collect()
    n = sum(r["n"] for r in ct)
    if n < 2:
        return 0.0

    def c2(x: int) -> float:
        return x * (x - 1) / 2.0

    pa: dict = {}
    pb: dict = {}
    for r in ct:
        pa[r["la"]] = pa.get(r["la"], 0) + r["n"]
        pb[r["lb"]] = pb.get(r["lb"], 0) + r["n"]
    s11 = sum(c2(r["n"]) for r in ct)
    sa = sum(c2(x) for x in pa.values())
    sb = sum(c2(x) for x in pb.values())
    total = c2(n)
    agree = total - sa - sb + 2 * s11  # s11 + s00
    return 1.0 - agree / total


def graph_structural_rand(graph: Graph, a: DataFrame, b: DataFrame) -> float:
    """Rand DISTANCE restricted to CONNECTED pairs
    (community/GraphStructuralRandMeasure.cpp): the fraction of edges
    whose endpoints one partition puts together and the other apart.
    One labels⋈labels⋈edges join + a single agg — scales with |E|."""
    ea = _labeled_sym_edges(graph, a)
    lb = b.select("id", "label")
    e = (
        ea.join(
            lb.withColumnRenamed("id", "src").withColumnRenamed("label", "src_lb"),
            "src",
        )
        .join(
            lb.withColumnRenamed("id", "dst").withColumnRenamed("label", "dst_lb"),
            "dst",
        )
        .where(F.col("src") < F.col("dst"))
    )
    row = e.agg(
        F.count("*").alias("m"),
        F.sum(
            (
                (F.col("src_label") == F.col("dst_label"))
                != (F.col("src_lb") == F.col("dst_lb"))
            ).cast("int")
        ).alias("diff"),
    ).collect()[0]
    if not row["m"]:
        return 0.0
    return float(row["diff"] / row["m"])


def local_partition_coverage(graph: Graph, labels: DataFrame) -> DataFrame:
    """(id, coverage) — per-vertex fraction of incident edge weight that
    stays inside the vertex's own community
    (centrality/LocalPartitionCoverage.cpp). Vertices with no neighbors
    get 0."""
    e = _labeled_sym_edges(graph, labels)
    per = e.groupBy(F.col("src").alias("id")).agg(
        (
            F.sum(
                F.when(
                    F.col("src_label") == F.col("dst_label"), F.col("weight")
                ).otherwise(0.0)
            )
            / F.sum("weight")
        ).alias("coverage")
    )
    return (
        labels.select("id")
        .join(per, "id", "left")
        .select("id", F.coalesce("coverage", F.lit(0.0)).alias("coverage"))
    )


def permanence(graph: Graph, labels: DataFrame) -> DataFrame:
    """(id, permanence) — per-vertex permanence (centrality/Permanence.cpp;
    Chakraborty et al. KDD'14):

        Perm(v) = I(v) / (E_max(v) · deg(v)) − (1 − c_in(v))

    with I(v) = #neighbors in v's community, E_max(v) = max #connections
    to any single OTHER community (1 when none, per the reference's
    convention to avoid div-by-zero), c_in(v) = clustering coefficient
    among v's internal neighbors. Plan: one labeled-edge scan for I/E_max
    + one wedge-join pass (degree-oriented, same machinery as triangle
    counting) restricted to same-community wedges for c_in."""
    simple = graph.remove_self_loops()
    lab = labels.select("id", "label")
    e = _labeled_sym_edges(simple, lab)
    per = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg"),
        F.sum(
            (F.col("src_label") == F.col("dst_label")).cast("int")
        ).alias("internal"),
    )
    emax = (
        e.where(F.col("src_label") != F.col("dst_label"))
        .groupBy(F.col("src").alias("id"), F.col("dst_label"))
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("emax"))
    )
    # internal triangles per vertex: a triangle whose three edges are all
    # intra-community lies wholly inside v's community, so c_in's numerator
    # is per-vertex triangles on the intra-edge SUBGRAPH — reuse the
    # degree-ORIENTED counter (hub-safe wedge fan-out), not a naive deg²
    # neighbor self-join.
    from linkgraph.algs.triangles import per_vertex_triangles

    intra = (
        e.where(
            (F.col("src_label") == F.col("dst_label")) & (F.col("src") < F.col("dst"))
        )
        .select("src", "dst")
        .distinct()
    )
    tri = per_vertex_triangles(Graph.from_edges(intra)).select(
        "id", F.col("triangles").alias("tri")
    )
    out = (
        per.join(emax, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            "deg",
            "internal",
            F.coalesce("emax", F.lit(1)).alias("emax"),
            F.coalesce("tri", F.lit(0)).alias("tri"),
        )
    )
    cin_pairs = (F.col("internal") * (F.col("internal") - 1) / 2.0)
    cin = F.when(cin_pairs > 0, F.col("tri") / cin_pairs).otherwise(0.0)
    score = F.when(
        F.col("deg") > 0,
        F.col("internal") / (F.greatest(F.col("emax"), F.lit(1)) * F.col("deg"))
        - (F.lit(1.0) - cin),
    ).otherwise(0.0)
    return (
        labels.select("id")
        .join(out, "id", "left")
        .select("id", F.coalesce(score, F.lit(0.0)).alias("permanence"))
    )


def cover_f1(cover: DataFrame, reference: DataFrame) -> DataFrame:
    """(label, best_f1) — per cluster of ``cover``, the maximum F1
    against any cluster of ``reference`` (community/CoverF1Similarity
    .cpp; Hric et al. 2014's F1 recovery score). Inputs are (id, label)
    tables (covers allowed — a vertex may carry several labels); average
    the ``best_f1`` column for the scalar summary the reference reports.
    Clusters sharing no vertex with any reference cluster score 0.

    Shape: two per-label size hash-aggs + ONE (la, lb) overlap hash-agg
    (only overlapping pairs materialize — never the clusters_a ×
    clusters_b cross product) + a max per cover cluster."""
    sa = cover.groupBy(F.col("label").alias("la")).agg(F.count("*").alias("na"))
    sb = reference.groupBy(F.col("label").alias("lb")).agg(F.count("*").alias("nb"))
    ov = (
        cover.select("id", F.col("label").alias("la"))
        .join(reference.select("id", F.col("label").alias("lb")), "id")
        .groupBy("la", "lb")
        .agg(F.count("*").alias("o"))
    )
    f1 = (
        ov.join(sa, "la")
        .join(sb, "lb")
        .select(
            "la",
            (2.0 * F.col("o") / (F.col("na") + F.col("nb"))).alias("f1"),
        )
    )
    best = f1.groupBy("la").agg(F.max("f1").alias("best_f1"))
    return (
        sa.select("la")
        .join(best, "la", "left")
        .select(
            F.col("la").alias("label"),
            F.coalesce("best_f1", F.lit(0.0)).alias("best_f1"),
        )
    )


def overlapping_nmi(a: DataFrame, b: DataFrame) -> float:
    """NMI between two COVERS (overlapping communities) — the LFK measure
    (community/OverlappingNMIDistance.cpp; Lancichinetti/Fortunato/Kertész
    NJP'09). Inputs are (id, label) tables where a vertex may carry
    several labels. Returns similarity in [0,1] (1 = identical covers).

    Shape: one distributed pass builds the per-cluster-pair overlap
    contingency + per-cluster sizes (hash aggs); the per-cluster
    best-match entropy minimization then runs driver-side over the
    (clusters_a × overlapping clusters_b) table — community COUNTS, not
    vertex counts, and only overlapping pairs materialize."""
    import math as _m

    n = (
        a.select("id").unionByName(b.select("id")).distinct().count()
    )
    if n == 0:
        return 1.0
    sa = {r["label"]: r["n"] for r in
          a.groupBy("label").agg(F.count("*").alias("n")).collect()}
    sb = {r["label"]: r["n"] for r in
          b.groupBy("label").agg(F.count("*").alias("n")).collect()}
    ov: dict = {}
    rows = (
        a.select("id", F.col("label").alias("la"))
        .join(b.select("id", F.col("label").alias("lb")), "id")
        .groupBy("la", "lb")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in rows:
        ov[(r["la"], r["lb"])] = r["n"]

    def h(p: float) -> float:
        return -p * _m.log(p) if p > 0 else 0.0

    def h_pair(w: int, x: int, y: int) -> float | None:
        """H(X_i|Y_j) for clusters of sizes x, y overlapping in w
        vertices; None when the LFK validity constraint rejects the
        pair (avoids rewarding complementary clusters)."""
        p11 = w / n
        p10 = (x - w) / n
        p01 = (y - w) / n
        p00 = 1.0 - p11 - p10 - p01
        if h(p11) + h(p00) < h(p10) + h(p01):
            return None
        hy = h(y / n) + h(1.0 - y / n)
        return h(p11) + h(p10) + h(p01) + h(p00) - hy

    def cond_entropy(sx: dict, sy: dict, pairs: dict) -> float:
        """Normalized H(X|Y) averaged over X's clusters."""
        total = 0.0
        for lx, x in sx.items():
            hx = h(x / n) + h(1.0 - x / n)
            best = None
            for (la, lb), w in pairs.items():
                if la != lx:
                    continue
                v = h_pair(w, x, sy[lb])
                if v is not None and (best is None or v < best):
                    best = v
            if best is None:
                norm = 1.0  # no admissible match → maximal conditional entropy
            else:
                norm = best / hx if hx > 0 else 0.0
            total += norm
        return total / len(sx) if sx else 0.0

    ov_t = {(lb, la): w for (la, lb), w in ov.items()}
    hxy = cond_entropy(sa, sb, ov)
    hyx = cond_entropy(sb, sa, ov_t)
    return 1.0 - 0.5 * (hxy + hyx)
