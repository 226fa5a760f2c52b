"""Betweenness centrality — distributed Brandes (exact + sampled).

Reference parity: centrality/Betweenness.cpp (exact Brandes),
EstimateBetweenness.cpp (sampled sources, scaled n/|S|),
ApproxBetweenness.cpp (ε-δ sampling — same machinery, caller picks |S|).
The reference runs one sequential BFS + dependency accumulation per
source; here ALL sources advance together, the source id riding as a
column (the multi-source plan of linkgraph/algs/bfs.py):

- forward: level-synchronous BFS over (source, id) state accumulating
  σ(s,v) = #shortest s→v paths — per level one join + one partial-agg
  shuffle keyed (source, dst); L = max level rounds;
- backward: dependencies δ(s,v) = Σ_{w∈succ(v)} σ(s,v)/σ(s,w)·(1+δ(s,w))
  processed by DESCENDING level — per level one edges join filtered on
  dist(s,w) = dist(s,v)+1;
- BC(v) = Σ_s δ(s,v) (halved for undirected; ·n/|S| when sampled).

Scale shape: state is |S|·n rows; exact mode (S = V) is O(n·m) total
work like the reference and meant for fixture/subgraph scale — web scale
uses ``n_samples`` (EstimateBetweenness's contract). σ counts are doubles
(exact integers to 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def betweenness(
    graph: Graph,
    n_samples: int | None = None,
    seed: int = 42,
    normalized: bool = False,
    portable: bool = False,
) -> DataFrame:
    """(id, score) — exact Brandes when ``n_samples`` is None, else the
    EstimateBetweenness sampled estimator (scaled by n/|S|).

    ``portable=True`` selects sample sources by the md5 portable hash
    (linkgraph/portable.py) instead of xxhash64 so a DuckDB oracle can
    re-derive the identical source set (gate use only; xxhash64 is the
    cheap default)."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    nodes = graph.nodes()
    n = nodes.count()
    if n_samples is None or n_samples >= n:
        src_rows = nodes
        scale = 1.0
    else:
        src_rows = _sampled_sources(nodes, n_samples, seed, portable)
        scale = n / n_samples

    delta = _forward_backward(e, src_rows)

    per_source = delta.where(F.col("id") != F.col("source"))
    bc = per_source.groupBy("id").agg(F.sum("delta").alias("score"))
    factor = scale * (0.5 if not graph.directed else 1.0)
    if normalized:
        denom = (n - 1) * (n - 2)
        factor *= (2.0 if not graph.directed else 1.0) / max(denom, 1)
    out = nodes.join(bc, "id", "left").select(
        "id", (F.coalesce("score", F.lit(0.0)) * F.lit(factor)).alias("score")
    )
    e.unpersist()
    return out


def _sampled_sources(
    nodes: DataFrame, n_samples: int, seed: int, portable: bool = False
) -> DataFrame:
    """Deterministic sample of ``n_samples`` source vertices: order by a
    seeded hash of the id (md5 portable hash when an SQL oracle must
    re-derive the set, xxhash64 otherwise). The set depends only on the
    NODE SET and seed, so edge additions leave it unchanged — the property
    DynApproxBetweenness relies on for dyn ≡ fresh-recompute identity."""
    if portable:
        from linkgraph.portable import phash

        key = phash(F.col("id"), F.lit(seed))
    else:
        key = F.xxhash64("id", F.lit(seed))
    return nodes.orderBy(key, F.asc("id")).limit(n_samples)


def _forward_backward(e: DataFrame, src_rows: DataFrame) -> DataFrame:
    """Brandes per-source state (source, id, dist, sigma, delta) for every
    source in ``src_rows`` over edge table ``e`` (src, dst): level-synch
    forward BFS accumulating path counts, then dependency back-prop by
    descending level."""
    # ---- forward: per-level BFS with shortest-path counts ---------------
    dist = src_rows.select(
        F.col("id").alias("source"),
        F.col("id").alias("id"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    frontier = dist
    levels = 0
    while True:
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = (
            cand.join(dist.select("source", "id"), ["source", "id"], "left_anti")
            .select("source", "id", F.lit(levels + 1).alias("dist"), "sigma")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
        levels += 1

    # ---- backward: dependency accumulation, deepest level first ---------
    delta = dist.select("source", "id", "dist", "sigma", F.lit(0.0).alias("delta"))
    for lev in range(levels, 0, -1):
        w_nodes = delta.where(F.col("dist") == lev).select(
            "source",
            F.col("id").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        # predecessors v of w: edge v→w with dist(s,v) = lev-1
        contrib = (
            w_nodes.join(e.withColumnRenamed("dst", "w"), "w")
            .select("source", F.col("src").alias("id"), "sigma_w", "delta_w")
            .join(
                delta.where(F.col("dist") == lev - 1).select(
                    "source", "id", F.col("sigma").alias("sigma_v")
                ),
                ["source", "id"],
            )
            .groupBy("source", "id")
            .agg(
                F.sum(
                    F.col("sigma_v") / F.col("sigma_w") * (1.0 + F.col("delta_w"))
                ).alias("add")
            )
        )
        delta = (
            delta.join(contrib, ["source", "id"], "left")
            .select(
                "source",
                "id",
                "dist",
                "sigma",
                (F.col("delta") + F.coalesce("add", F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )

    return delta


def brandes_state(graph: Graph) -> DataFrame:
    """(source, id, dist, sigma, delta) — full exact-Brandes per-source
    state for every vertex, the retained artifact DynBetweenness repairs
    incrementally (dynamics parity: centrality/DynBetweenness.cpp keeps
    per-source SSSP DAGs; the distributed twin keeps this one table)."""
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    state = _forward_backward(e, graph.nodes()).localCheckpoint(eager=True)
    e.unpersist()
    return state


def scores_from_state(graph: Graph, state: DataFrame, normalized: bool = False) -> DataFrame:
    """(id, score) — exact betweenness aggregated from a brandes_state."""
    bc = (
        state.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("delta").alias("score"))
    )
    n = graph.nodes().count()
    factor = 0.5 if not graph.directed else 1.0
    if normalized:
        denom = (n - 1) * (n - 2)
        factor *= (2.0 if not graph.directed else 1.0) / max(denom, 1)
    return graph.nodes().join(bc, "id", "left").select(
        "id", (F.coalesce("score", F.lit(0.0)) * F.lit(factor)).alias("score")
    )


def sampled_brandes_state(
    graph: Graph, n_samples: int, seed: int = 42, portable: bool = False
) -> DataFrame:
    """(source, id, dist, sigma, delta) for a deterministic ``n_samples``
    source sample — the retained artifact DynApproxBetweenness
    (centrality/DynApproxBetweenness.cpp) repairs incrementally. Same
    per-source machinery as ``brandes_state``; the state is |S|·n rows,
    the form usable at scale (exact n·n state is fixture-only)."""
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    nodes = graph.nodes()
    n = nodes.count()
    srcs = (
        nodes
        if n_samples >= n
        else _sampled_sources(nodes, n_samples, seed, portable)
    )
    state = _forward_backward(e, srcs).localCheckpoint(eager=True)
    e.unpersist()
    return state


def scores_from_sampled_state(
    graph: Graph, state: DataFrame, normalized: bool = False
) -> DataFrame:
    """(id, score) — sampled-estimator aggregation of a (possibly repaired)
    sampled_brandes_state, scaled by n/|S| exactly as ``betweenness`` with
    ``n_samples`` does (|S| read off the state itself so the same function
    serves fresh and dyn-repaired states)."""
    n = graph.nodes().count()
    n_src = state.select("source").distinct().count()
    bc = (
        state.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.sum("delta").alias("score"))
    )
    factor = (n / max(n_src, 1)) * (0.5 if not graph.directed else 1.0)
    if normalized:
        denom = (n - 1) * (n - 2)
        factor *= (2.0 if not graph.directed else 1.0) / max(denom, 1)
    return graph.nodes().join(bc, "id", "left").select(
        "id", (F.coalesce("score", F.lit(0.0)) * F.lit(factor)).alias("score")
    )


def dyn_approx_betweenness_additions(
    graph: Graph, state: DataFrame, additions: list
) -> DataFrame:
    """DynApproxBetweenness (centrality/DynApproxBetweenness.cpp contract,
    adapted to the source-sampled estimator): ``graph`` is the
    post-addition graph, ``state`` a sampled_brandes_state of the
    pre-addition graph, ``additions`` the new (u, v) pairs. Only sampled
    sources whose SSSP DAG the new edges can touch re-run (the same
    affected-source test as dyn_betweenness_additions — a source is
    unaffected iff every added edge is same-level or fully unreachable
    from it); the repaired state feeds ``scores_from_sampled_state``.

    Because the source sample depends only on the node set and seed, the
    repaired state is IDENTICAL to a fresh ``sampled_brandes_state`` of
    the post-addition graph — tested as dyn ≡ fresh on random graphs."""
    return dyn_betweenness_additions(graph, state, additions)


def dyn_betweenness_additions(
    graph: Graph, state: DataFrame, additions: list
) -> DataFrame:
    """Incremental exact betweenness under edge ADDITIONS
    (centrality/DynBetweenness.cpp contract, iCentral-style source
    pruning): ``graph`` is the post-addition graph, ``state`` the
    pre-addition brandes_state, ``additions`` the new (u, v) pairs.

    A source s is affected by edge (u, v) only if the new edge lies on
    some new-or-shorter s-path, i.e. unless d(s,u) == d(s,v) with both
    finite (a same-level edge is never on a shortest path) or both
    endpoints are unreachable from s. Only affected sources' forward and
    backward passes re-run — the distributed work is |S_affected|·m, not
    n·m; untouched per-source rows carry over.

    Returns the NEW state; aggregate with ``scores_from_state``."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    add_df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in additions], "u bigint, v bigint"
    )
    du = state.join(
        add_df, state.id == add_df.u, "inner"
    ).select("source", "u", "v", F.col("dist").alias("du"))
    dv = state.join(
        add_df.withColumnRenamed("u", "u2"), state.id == F.col("v"), "inner"
    ).select(
        F.col("source").alias("source2"),
        F.col("u2").alias("uu"),
        F.col("v").alias("vv"),
        F.col("dist").alias("dvv"),
    )
    sources = state.select("source").distinct()
    # per (source, added edge): unaffected iff both reached at equal depth
    # or both unreached; affected otherwise (full outer on the reach rows)
    pair = du.join(
        dv,
        (F.col("source") == F.col("source2"))
        & (F.col("u") == F.col("uu"))
        & (F.col("v") == F.col("vv")),
        "full",
    ).select(
        F.coalesce("source", "source2").alias("source"),
        "du",
        "dvv",
    )
    affected = (
        pair.where(
            F.col("du").isNull()
            | F.col("dvv").isNull()
            | (F.col("du") != F.col("dvv"))
        )
        .select("source")
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = state.join(affected, "source", "left_anti")
    redo_sources = sources.join(affected, "source", "left_semi").select(
        F.col("source").alias("id")
    )
    if redo_sources.isEmpty():
        e.unpersist()
        return state
    redone = _forward_backward(e, redo_sources)
    new_state = kept.unionByName(redone).localCheckpoint(eager=True)
    e.unpersist()
    return new_state


def approx_betweenness(
    graph: Graph,
    epsilon: float = 0.05,
    delta: float = 0.1,
    seed: int = 42,
    max_samples: int = 4096,
    normalized: bool = True,
) -> DataFrame:
    """(id, score) — ApproxBetweenness.cpp contract (Riondato–Kornaropoulos
    VC-dimension sampling): normalized betweenness within ±epsilon with
    probability ≥ 1−delta, using

        r = (c/ε²)·(⌊log₂(VD−2)⌋ + 1 + ln(1/δ)),  c = 0.5

    samples, where VD is the vertex-diameter (approximated here by the
    double-sweep lower bound + 2, the reference's own estimator spirit).
    Delegates to the sampled Brandes machinery (multi-source BFS +
    dependency back-prop), capped at ``max_samples`` sources."""
    import math as _m

    from linkgraph.algs.bfs import diameter_lower_bound

    vd = max(int(diameter_lower_bound(graph)) + 2, 3)
    r = int(_m.ceil(
        (0.5 / (epsilon ** 2))
        * (int(_m.floor(_m.log2(max(vd - 2, 2)))) + 1 + _m.log(1.0 / delta))
    ))
    r = min(max(r, 1), max_samples)
    out = betweenness(graph, n_samples=r, seed=seed, normalized=normalized)
    return out
