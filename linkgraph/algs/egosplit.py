"""EgoSplitting — overlapping communities (Cover output).

Reference parity: community/EgoSplitting.cpp (Epasto/Lattanzi/Paes Leme,
KDD'17) and structures/Cover.hpp. A vertex belongs to several communities
when its ego-net (the subgraph induced on its neighbors) splits into
several pieces:

1. ego-net components: for every vertex u, connected components of the
   graph induced on N(u). Distributed as ONE label-propagation over
   (u, v) pairs keyed by u — the "edges" of u's ego-net are the triangle
   wedges (u adjacent to both a and b, and a~b). Rows = Σ_u deg(u)·tri-ish;
   ``max_ego_degree`` caps hub fan-out (a 10^6-degree hub's ego-net is
   quadratic — the standard cap, mirroring the reference's complexity
   statement);
2. persona graph: vertex (u, part); edge (u,v) connects u's part
   containing v with v's part containing u;
3. any disjoint community detector on the persona graph (PLP here);
4. project back: u's labels = labels of its personas → Cover
   (id, label) rows, a node may appear under several labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.algs.plp import label_propagation
from linkgraph.graph import Graph
from linkgraph.iterutil import Pin


def _ego_components(graph: Graph, max_ego_degree: int | None, max_rounds: int = 10_000) -> DataFrame:
    """(u, v, part) — for each vertex u and neighbor v, the ego-net
    component of v within N(u), labeled by min member id."""
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    if max_ego_degree is not None:
        deg = sym.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") <= max_ego_degree).select("src")
        sym = sym.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )
    # ego-net edges of u: (u, a, b) with u~a, u~b, a~b  (the triangle wedge)
    ua = sym.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    ub = sym.select(F.col("src").alias("u"), F.col("dst").alias("b"))
    ab = sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ego_edges = ua.join(ub, "u").where(F.col("a") < F.col("b")).join(ab, ["a", "b"])
    pin = Pin(graph.edges.sparkSession, "egosplit")
    ego_edges = pin(ego_edges, "ego_edges")
    # label-min propagation within each (u) ego-net
    labels = pin(
        ua.select("u", F.col("a").alias("v")).withColumn("part", F.col("v")),
        "labels",
    )
    both = ego_edges.select("u", "a", "b").unionByName(
        ego_edges.select("u", F.col("b").alias("a"), F.col("a").alias("b"))
    )
    for _ in range(max_rounds):
        cand = (
            labels.join(
                both.withColumnRenamed("a", "v"), ["u", "v"]
            )
            .groupBy("u", F.col("b").alias("v"))
            .agg(F.min("part").alias("cand"))
        )
        new = (
            labels.join(cand, ["u", "v"], "left")
            .select(
                "u",
                "v",
                F.least(F.col("part"), F.coalesce("cand", F.col("part"))).alias("np"),
                (F.least(F.col("part"), F.coalesce("cand", F.col("part"))) != F.col("part")).cast("int").alias("chg"),
            )
        )
        new = pin(new, "labels")
        changed = new.agg(F.sum("chg")).collect()[0][0] or 0
        labels = new.select("u", "v", F.col("np").alias("part"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"ego-net label propagation did not converge in {max_rounds} "
            "rounds (raise max_rounds)"
        )
    # materialize before releasing the Pin's parquet state below
    out = labels.localCheckpoint(eager=True)
    pin.close()
    return out


def ego_splitting(
    graph: Graph,
    max_ego_degree: int | None = 200,
    plp_max_iter: int = 30,
    portable: bool = False,
    max_ego_rounds: int = 10_000,
) -> DataFrame:
    """Cover (id, label) — overlapping communities via persona splitting;
    labels are canonical persona labels (distinct per overlapping part).

    ``portable=True`` swaps the persona-id hash and PLP tie-break to the
    md5 portable hash so the full pipeline (ego components → personas →
    PLP → cover) replays as DuckDB SQL (gate_sql.ego_cover_sql)."""
    parts = _ego_components(graph, max_ego_degree, max_ego_rounds)
    # persona id: stable hash of (vertex, part)
    if portable:
        from linkgraph.portable import phash

        pid = phash(F.col("u"), F.col("part"))
    else:
        pid = F.xxhash64("u", "part")
    persona = parts.select("u", "v", pid.alias("pid"))
    # edge (u,v): connect u's persona containing v with v's persona containing u
    left = persona.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("pid").alias("pa"))
    right = persona.select(F.col("v").alias("a"), F.col("u").alias("b"), F.col("pid").alias("pb"))
    pedges = (
        left.join(right, ["a", "b"])
        .where(F.col("a") < F.col("b"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"), F.lit(1.0).alias("weight"))
    )
    pgraph = Graph.from_edges(pedges, directed=False)
    plab = label_propagation(
        pgraph,
        max_iter=plp_max_iter,
        tie_hash="portable" if portable else "xxhash64",
    )
    # project back: u inherits the labels of all its personas
    owner = persona.select("u", "pid").distinct()
    cover = (
        owner.join(plab.withColumnRenamed("id", "pid"), "pid")
        .select(F.col("u").alias("id"), "label")
        .distinct()
    )
    return cover


def cover_sizes(cover: DataFrame) -> DataFrame:
    """(label, size) of an overlapping cover (Cover::subsetSizes)."""
    return cover.groupBy("label").agg(F.count("*").alias("size"))
