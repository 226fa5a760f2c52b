"""Profile — the engine's analogue of networkit/profiling/profiling.py
(Profile.create(G): run a battery of algorithms, emit a report).

Runs the P0/P1 battery over a Graph and returns a plain dict (callers
render markdown/JSON as they wish). Each entry records its wall time, so
the profile doubles as a coarse per-operator benchmark.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from linkgraph.graph import Graph


def profile(graph: Graph, max_iter: int = 40, with_communities: bool = True) -> dict:
    from linkgraph.algs.centrality import assortativity, degree_centrality
    from linkgraph.algs.community import modularity
    from linkgraph.algs.components import component_sizes, connected_components
    from linkgraph.algs.pagerank import pagerank
    from linkgraph.algs.plp import label_propagation
    from linkgraph.algs.triangles import (
        global_clustering_coefficient,
        per_vertex_triangles,
    )

    out: dict = {"timings_s": {}}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out["timings_s"][name] = round(time.time() - t0, 3)
        return r

    out["nodes"] = timed("num_nodes", graph.num_nodes)
    out["edges"] = timed("num_edges", graph.num_edges)
    out["density"] = round(graph.density(), 8)
    out["max_degree"] = timed("max_degree", graph.max_degree)

    deg = timed("degrees", lambda: graph.degrees().persist())
    row = deg.agg(
        F.avg("degree").alias("avg"), F.expr("percentile(degree, 0.5)").alias("med")
    ).collect()[0]
    out["avg_degree"] = round(float(row["avg"]), 3)
    out["median_degree"] = float(row["med"])

    comps = timed("connected_components", lambda: connected_components(graph, max_iter=max_iter))
    sizes = component_sizes(comps)
    out["n_components"] = sizes.count()
    out["largest_component"] = sizes.agg(F.max("size")).collect()[0][0]

    pr = timed("pagerank", lambda: pagerank(graph, tol=1e-8, max_iter=max_iter))
    top = pr.orderBy(F.desc("rank"), F.asc("id")).limit(5).collect()
    out["pagerank_top5"] = [(r["id"], round(r["rank"], 6)) for r in top]

    timed("triangles", lambda: per_vertex_triangles(graph).agg(F.sum("triangles")).collect())
    out["global_clustering"] = round(
        timed("global_cc", lambda: global_clustering_coefficient(graph)), 6
    )
    out["assortativity"] = round(timed("assortativity", lambda: assortativity(graph)), 6)
    out["degree_centralization"] = round(
        _centralization(degree_centrality(graph)), 6
    )

    if with_communities:
        labels = timed("plp", lambda: label_propagation(graph, max_iter=max_iter))
        out["plp_communities"] = labels.select("label").distinct().count()
        out["plp_modularity"] = round(timed("modularity", lambda: modularity(graph, labels)), 6)
    deg.unpersist()
    return out


def _centralization(scores) -> float:
    """Freeman centralization: Σ(max−sᵢ) / ((n−1)·max) — the Centrality
    base-class ``centralization()`` getter."""
    row = scores.agg(
        F.max("score").alias("mx"), F.sum("score").alias("sm"), F.count("*").alias("n")
    ).collect()[0]
    n, mx = row["n"], float(row["mx"] or 0.0)
    if n <= 1 or mx == 0.0:
        return 0.0
    return (n * mx - float(row["sm"])) / ((n - 1) * mx)


def profile_markdown(p: dict) -> str:
    lines = ["# Graph profile", ""]
    for k, v in p.items():
        if k == "timings_s":
            continue
        lines.append(f"- **{k}**: {v}")
    lines.append("")
    lines.append("## Timings (s)")
    for k, v in p["timings_s"].items():
        lines.append(f"- {k}: {v}")
    return "\n".join(lines)
