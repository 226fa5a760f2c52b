"""Traversal: BFS / SSSP as frontier-expansion supersteps; diameter bounds.

Reference parity: distance/BFS.cpp, Dijkstra.cpp (SSSP with optional
target), Diameter.cpp (estimatedRange via double-sweep). Dijkstra's
priority queue is inherently sequential; the distributed formulation is
Bellman-Ford-style relaxation rounds — same results for non-negative
weights, O(diameter) rounds instead of O(m log n) sequential steps.

Plan per round: frontier ⋈ edges → groupBy(dst).min(dist) → compare with
settled distances; converges when no distance improves. The frontier is
usually a small fraction of V — it is broadcast when under the session
broadcast threshold (Catalyst decides from stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def bfs(graph: Graph, source: int, max_iter: int = 10_000, return_pred: bool = False) -> DataFrame:
    """(id, dist[, pred]) hop distances from ``source``; unreachable
    vertices are absent (the reference reports infinity — filter semantics
    chosen so the result is a compact frontier table). ``return_pred``
    adds the shortest-path-tree predecessor column (distance/BFS.cpp
    getPath/getPredecessors parity; see sssp)."""
    uw = graph.to_unweighted()
    return sssp(uw, source, max_iter=max_iter, return_pred=return_pred)


def sssp(graph: Graph, source: int, max_iter: int = 10_000, return_pred: bool = False) -> DataFrame:
    """(id, dist[, pred]) shortest weighted distances from ``source``;
    directed graphs follow edge direction, undirected expand both ways.

    ``return_pred=True`` adds the predecessor on one shortest path
    (distance/Dijkstra.cpp::getPredecessors / BFS.cpp::getPath parity —
    the reference stores the full pred LIST for path counting; one
    deterministic pred is what getPath consumes). pred(v) is chosen as
    the min struct (tentative dist, src) over the relaxation — i.e. the
    lowest-id neighbor among those achieving the minimal distance in the
    round v last improved; pred(source) is NULL. Reconstruct with
    get_path(). The pred column rides the existing relaxation agg (one
    struct-min instead of a min — no extra shuffle)."""
    spark = graph.edges.sparkSession
    e = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    ).persist()
    dist = spark.createDataFrame(
        [(source, 0.0, None)], "id bigint, dist double, pred bigint"
    ).persist()
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.id == e.src)
            .select(
                F.col("dst").alias("id"),
                F.struct(
                    (F.col("dist") + F.col("weight")).alias("nd"),
                    F.col("src").alias("pred"),
                ).alias("s"),
            )
            .groupBy("id")
            .agg(F.min("s").alias("s"))
            .select("id", F.col("s.nd").alias("nd"), F.col("s.pred").alias("np"))
        )
        improved = (
            cand.join(dist.select("id", F.col("dist").alias("old")), "id", "left")
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("id", F.col("nd").alias("dist"), F.col("np").alias("pred"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist if return_pred else dist.drop("pred")


def get_path(dist_pred: DataFrame, source: int, target: int, max_len: int = 100_000):
    """Reconstruct one shortest source→target path as [source, …, target]
    from a (id, dist, pred) table (sssp/bfs with return_pred=True), or
    None when target is unreachable — distance/BFS.cpp::getPath contract.

    The walk follows pred pointers one hop per lookup against the
    materialized result (path-length driver round-trips — the
    interactive-use shape; for per-vertex paths in bulk use the unrolled
    prepend join the doc_bfs_path gate entry demonstrates)."""
    rows = dist_pred.where(F.col("id") == int(target)).collect()
    if not rows:
        return None
    path = [int(target)]
    pred = rows[0]["pred"]
    while pred is not None and len(path) <= max_len:
        path.append(int(pred))
        if path[-1] == int(source):
            break
        nxt = dist_pred.where(F.col("id") == int(pred)).collect()
        pred = nxt[0]["pred"] if nxt else None
    if path[-1] != int(source):
        return None
    return list(reversed(path))


def multi_source_bfs(graph: Graph, sources: list, max_iter: int = 10_000) -> DataFrame:
    """(source, id, dist) hop distances from EVERY source simultaneously —
    the source id rides as a frontier column, so S sources cost one
    superstep loop, not S (the plan shape behind ApproxCloseness /
    sampled betweenness/diameter estimators; SURVEY §2A distance rows)."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .persist()
    )
    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "source bigint, id bigint, dist double"
    ).persist()
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + 1.0).alias("nd"))
        )
        improved = (
            cand.join(
                dist.withColumnRenamed("dist", "old"), ["source", "id"], "left"
            )
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("source", "id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("source", "id"), ["source", "id"], "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist


def multi_source_sssp(graph: Graph, sources: list, max_iter: int = 10_000) -> DataFrame:
    """(source, id, dist) WEIGHTED distances from every source — the
    weighted analogue of multi_source_bfs (same frontier-relaxation loop,
    edge weight instead of +1). Used by astar_landmarks so ALT potentials
    stay admissible on graphs with edge weights < 1 (hop-count potentials
    overestimate there and the A* cut would discard shorter paths)."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst", "weight")
        .persist()
    )
    dist = spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources], "source bigint, id bigint, dist double"
    ).persist()
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("nd"))
        )
        improved = (
            cand.join(
                dist.withColumnRenamed("dist", "old"), ["source", "id"], "left"
            )
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("source", "id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("source", "id"), ["source", "id"], "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist


def harmonic_closeness_sampled(
    graph: Graph, n_samples: int = 16, seed: int = 42
) -> DataFrame:
    """(id, score) — sampled harmonic closeness (TopHarmonicCloseness /
    ApproxCloseness family): score(v) = (n−1)/|S| · Σ_{s∈S} 1/d(s,v) over
    deterministic hash-sampled sources; exact when n_samples ≥ n. On
    undirected graphs d(s,v)=d(v,s), so source-rooted BFS suffices."""
    nodes = graph.nodes()
    n = nodes.count()
    sources = [
        r["id"]
        for r in nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(min(n_samples, n))
        .collect()
    ]
    d = multi_source_bfs(graph, sources)
    scale = (n - 1) / len(sources) if sources else 0.0
    scores = (
        d.where(F.col("dist") > 0)
        .groupBy("id")
        .agg((F.lit(scale) * F.sum(1.0 / F.col("dist"))).alias("score"))
    )
    return (
        nodes.join(scores, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def closeness(
    graph: Graph, harmonic: bool = False, sources: list | None = None
) -> DataFrame:
    """(id, score) — EXACT (harmonic) closeness centrality via one
    multi-source BFS over all vertices (distance/Closeness.cpp,
    HarmonicCloseness.cpp re-expressed; O(n·m) total work like the
    reference's all-BFS loop — exact mode is a fixture/subgraph-scale
    tool; web scale uses :func:`harmonic_closeness_sampled`).

    Pinned formulas (networkx parity, checked in tests):
    - standard (Wasserman–Faust): c(v) = r_v² / ((n−1)·Σ_u d(v,u)) with
      r_v = #vertices reachable from v (excluding v); 0 when Σd = 0;
    - harmonic: c(v) = Σ_u 1/d(v,u) (unnormalized, as networkx).
    """
    nodes = graph.nodes()
    n = nodes.count()
    if sources is None:
        sources = [r["id"] for r in nodes.collect()]
    d = multi_source_bfs(graph, sources).where(F.col("dist") > 0)
    if harmonic:
        agg = d.groupBy(F.col("source").alias("id")).agg(
            F.sum(1.0 / F.col("dist")).alias("score")
        )
    else:
        agg = d.groupBy(F.col("source").alias("id")).agg(
            (
                F.count("*") * F.count("*")
                / (F.lit(float(max(n - 1, 1))) * F.sum("dist"))
            ).alias("score")
        )
    src_df = nodes if len(sources) == n else nodes.sparkSession.createDataFrame(
        [(int(s),) for s in sources], "id bigint"
    )
    return src_df.join(agg, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def eccentricity(graph: Graph, source: int) -> float:
    """Max finite distance from source (distance/Eccentricity.cpp)."""
    row = bfs(graph, source).agg(F.max("dist").alias("m")).collect()[0]
    return float(row["m"] or 0.0)


def eccentricities(graph: Graph) -> DataFrame:
    """(id, ecc) — per-vertex eccentricity (max finite hop distance) for
    every vertex, via ONE multi-source BFS (exact; fixture/subgraph-scale
    like exact closeness — isolated vertices get 0)."""
    nodes = graph.nodes()
    sources = [r["id"] for r in nodes.collect()]
    d = multi_source_bfs(graph, sources)
    agg = d.groupBy(F.col("source").alias("id")).agg(
        F.max("dist").cast("bigint").alias("ecc")
    )
    return nodes.join(agg, "id", "left").select(
        "id", F.coalesce("ecc", F.lit(0)).alias("ecc")
    )


def diameter_lower_bound(graph: Graph, seed_vertex: int | None = None) -> float:
    """Double-sweep lower bound (Diameter.cpp estimatedRange's cheap half):
    BFS from a seed, then BFS from the farthest vertex found; the second
    eccentricity lower-bounds the diameter."""
    if seed_vertex is None:
        seed_vertex = graph.nodes().agg(F.min("id")).collect()[0][0]
    d1 = bfs(graph, int(seed_vertex))
    far = d1.orderBy(F.desc("dist"), F.asc("id")).limit(1).collect()[0]["id"]
    return eccentricity(graph, int(far))


def diameter_exact(
    graph: Graph,
    seed_vertex: int | None = None,
    fringe_batch: int = 1024,
) -> int:
    """EXACT hop diameter via iFub (distance/Diameter.cpp exact mode;
    Crescenzi–Grossi–Habib–Lanzi–Marino "On computing the diameter of
    real-world undirected graphs"). Undirected semantics (the symmetric
    edge view); on a disconnected graph this is the diameter of the
    high-degree root's component (run per component otherwise).

    Shape: root = max-degree vertex (the paper's hub heuristic); one BFS
    from the root gives the level structure and ecc(u); levels are then
    processed DEEPEST FIRST, each level's eccentricities computed by ONE
    multi-source BFS with the whole fringe riding as a source column
    (chunked ``fringe_batch`` sources at a time to bound the |S|·n state),
    stopping as soon as lb > 2·(i−1) — on small-world graphs that is
    typically after one or two shallow fringe levels, which is what makes
    iFub practical where exact all-pairs is not."""
    return diameter_range(graph, error=0.0, seed_vertex=seed_vertex,
                          fringe_batch=fringe_batch)[0]


def diameter_range(
    graph: Graph,
    error: float = 0.1,
    seed_vertex: int | None = None,
    fringe_batch: int = 1024,
) -> tuple[int, int]:
    """(lb, ub) hop-diameter bounds via iFub with early stop
    (distance/Diameter.cpp estimatedRange): the sweep halts once
    ub − lb ≤ error·lb, where ub = 2·i after every level deeper than i
    has been processed. ``error=0.0`` runs to the exact answer
    (lb == ub == diameter); this is :func:`diameter_exact`'s loop."""
    deg = graph.degrees().orderBy(F.desc("degree"), F.asc("id")).limit(1).collect()
    if not deg:
        return 0, 0
    root = int(deg[0]["id"]) if seed_vertex is None else int(seed_vertex)
    levels = bfs(graph, root).localCheckpoint(eager=True)
    ecc_u = int(levels.agg(F.max("dist")).collect()[0][0] or 0)
    lb, i = ecc_u, ecc_u
    while i > 0 and (2 * i - lb) > error * lb:
        fringe = [
            r["id"]
            for r in levels.where(F.col("dist") == i).select("id").collect()
        ]
        for b in range(0, len(fringe), fringe_batch):
            chunk = fringe[b : b + fringe_batch]
            m = (
                multi_source_bfs(graph, chunk)
                .agg(F.max("dist"))
                .collect()[0][0]
            )
            lb = max(lb, int(m or 0))
            if lb > 2 * (i - 1):
                return lb, lb
        if lb > 2 * (i - 1):
            return lb, lb
        i -= 1
    return lb, max(lb, 2 * i)


def top_closeness(graph: Graph, k: int = 10, harmonic: bool = False) -> DataFrame:
    """(id, score) — the k most-central vertices by exact (harmonic)
    closeness (TopCloseness.cpp / TopHarmonicCloseness.cpp). The
    reference prunes BFS runs with upper bounds; the distributed exact
    form computes all scores in ONE multi-source BFS and takes top-k —
    same O(n·m) worst case as the reference's bound-miss path, one job
    instead of n. Deterministic (score desc, id asc)."""
    return (
        closeness(graph, harmonic=harmonic)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def dyn_sssp_additions(
    graph: Graph,
    dist: DataFrame,
    added_edges: DataFrame,
    max_iter: int = 10_000,
) -> DataFrame:
    """Incremental SSSP under edge ADDITIONS (distance/DynBFS.cpp,
    DynDijkstra.cpp): additions only DECREASE distances, so relaxation
    restarts from the endpoints of the new edges and propagates only the
    improvement frontier — cost O(affected region · rounds), not a full
    recompute. ``graph`` is the post-addition graph; ``dist`` the
    pre-addition (id, dist) table (unreachable vertices absent).

    Works for hop counts (unweighted) and non-negative weights alike —
    same relaxation invariant as sssp(). Result is identical to
    recomputing from scratch (pytest-pinned)."""
    e = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    ).persist()
    add = (
        added_edges.select("src", "dst", "weight")
        if "weight" in added_edges.columns
        else added_edges.select("src", "dst", F.lit(1.0).alias("weight"))
    )
    if not graph.directed:
        add = add.unionByName(
            add.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
    # seed frontier: new-edge heads whose distance improves through the
    # added edge
    seed = (
        add.join(dist.withColumnRenamed("id", "src").withColumnRenamed("dist", "ds"), "src")
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min(F.col("ds") + F.col("weight")).alias("nd"))
        .join(dist.withColumnRenamed("dist", "old"), "id", "left")
        .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
        .select("id", F.col("nd").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = seed
    cur = dist
    for _ in range(max_iter):
        if frontier.isEmpty():
            break
        cur = (
            cur.join(frontier.select("id"), "id", "left_anti")
            .unionByName(frontier)
            .localCheckpoint(eager=True)
        )
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("nd"))
        )
        frontier = (
            cand.join(cur.withColumnRenamed("dist", "old"), "id", "left")
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return cur


def dyn_bfs_additions(
    graph: Graph, dist: DataFrame, added_edges: DataFrame, max_iter: int = 10_000
) -> DataFrame:
    """DynBFS.cpp twin: hop-count variant of dyn_sssp_additions."""
    return dyn_sssp_additions(
        graph.to_unweighted(),
        dist,
        added_edges.select("src", "dst", F.lit(1.0).alias("weight")),
        max_iter=max_iter,
    )


def dyn_multi_source_additions(
    graph: Graph,
    dist: DataFrame,
    added_edges: DataFrame,
    max_iter: int = 10_000,
) -> DataFrame:
    """Incremental MULTI-source hop distances under edge additions
    (distance/DynAPSP.cpp's addition path, restricted to the tracked
    source set): ``dist`` is a (source, id, dist) table as produced by
    multi_source_bfs; the improvement frontier carries the source column,
    so ALL sources repair in one superstep loop. Result equals a fresh
    multi_source_bfs on the post-addition graph (pytest-pinned)."""
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .persist()
    )
    add = added_edges.select("src", "dst")
    if not graph.directed:
        add = add.unionByName(
            add.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    seed = (
        add.join(
            dist.select("source", F.col("id").alias("src"), F.col("dist").alias("ds")),
            "src",
        )
        .groupBy("source", F.col("dst").alias("id"))
        .agg(F.min(F.col("ds") + 1.0).alias("nd"))
        .join(dist.withColumnRenamed("dist", "old"), ["source", "id"], "left")
        .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
        .select("source", "id", F.col("nd").alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = seed
    cur = dist
    for _ in range(max_iter):
        if frontier.isEmpty():
            break
        cur = (
            cur.join(frontier.select("source", "id"), ["source", "id"], "left_anti")
            .unionByName(frontier)
            .localCheckpoint(eager=True)
        )
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy("source", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + 1.0).alias("nd"))
        )
        frontier = (
            cand.join(cur.withColumnRenamed("dist", "old"), ["source", "id"], "left")
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("source", "id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return cur


def closeness_sampled(graph: Graph, n_samples: int = 16, seed: int = 42) -> DataFrame:
    """(id, score) — sampled closeness (centrality/ApproxCloseness.cpp
    contract): pivot set S of hash-sampled vertices, one multi-source BFS,
    c(v) estimated as (n−1) / (n/|S| · Σ_{s∈S} d(s,v)) over the pivots
    that reach v (the reference adds variance corrections; this is the
    plain pivot estimator — exact when |S| ≥ n, pytest-pinned)."""
    nodes = graph.nodes()
    n = nodes.count()
    sources = [
        r["id"]
        for r in nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(min(n_samples, n))
        .collect()
    ]
    k = len(sources)
    d = multi_source_bfs(graph, sources).where(F.col("dist") > 0)
    est = d.groupBy("id").agg(F.sum("dist").alias("sd"), F.count("*").alias("c"))
    scale = float(n) / float(k)
    return (
        nodes.join(est, "id", "left")
        .select(
            "id",
            F.when(
                F.col("sd").isNotNull() & (F.col("sd") > 0),
                (F.lit(float(n - 1))) / (F.lit(scale) * F.col("sd")),
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )


def dyn_harmonic_closeness(
    graph: Graph,
    dist_state: DataFrame,
    added_edges: DataFrame,
    n: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """DynTopHarmonicCloseness addition path: keep the sampled-pivot
    distance table (source, id, dist) as STATE, repair it incrementally
    under edge additions (dyn_multi_source_additions — only the improved
    region recomputes), and re-aggregate the harmonic estimator from the
    repaired table. Returns (new_dist_state, scores(id, score)); feed the
    state back in on the next batch. Exactly equals recomputing the
    sampled estimator from scratch on the post-addition graph."""
    new_state = dyn_multi_source_additions(graph, dist_state, added_edges)
    nodes = graph.nodes()
    if n is None:
        n = nodes.count()
    k = new_state.select("source").distinct().count()
    scale = (n - 1) / k if k else 0.0
    scores = (
        new_state.where(F.col("dist") > 0)
        .groupBy("id")
        .agg((F.lit(scale) * F.sum(1.0 / F.col("dist"))).alias("score"))
    )
    out = nodes.join(scores, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    return new_state, out


def group_degree(graph: Graph, k: int = 5) -> DataFrame:
    """(id,) — greedy group-degree maximization (centrality/GroupDegree
    .cpp): k rounds, each adding the vertex covering the most
    still-uncovered neighbors (the classic 1−1/e submodular greedy; ties
    by min id → deterministic). Each round is ONE distributed agg over
    the edge table filtered by the covered set — k supersteps total, no
    per-candidate BFS, so feasible for the small k the greedy is used
    with."""
    spark = graph.edges.sparkSession
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    group: list = []
    covered = spark.createDataFrame([], "id bigint")
    for _ in range(k):
        cand = (
            sym.join(
                covered.withColumnRenamed("id", "dst"), "dst", "left_anti"
            )
            .join(
                spark.createDataFrame([(g,) for g in group] or [], "src bigint"),
                "src",
                "left_anti",
            )
            .groupBy("src")
            .agg(F.count("*").alias("gain"))
        )
        best = (
            cand.orderBy(F.desc("gain"), F.asc("src")).limit(1).collect()
        )
        if not best or best[0]["gain"] <= 0:
            break
        v = int(best[0]["src"])
        group.append(v)
        newly = sym.where(F.col("src") == v).select(F.col("dst").alias("id"))
        covered = (
            covered.unionByName(newly)
            .unionByName(spark.createDataFrame([(v,)], "id bigint"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return spark.createDataFrame([(g,) for g in group] or [], "id bigint")


def group_closeness(
    graph: Graph,
    k: int = 3,
    candidates: list | None = None,
    max_hops: int = 10_000,
) -> DataFrame:
    """(id,) — greedy group-closeness maximization (centrality/
    GroupCloseness.cpp): k rounds, each adding the vertex that most
    reduces total group farness sum_u d(S, u), with d(S, u) =
    min over members; unreached vertices carry penalty n (so coverage is
    rewarded before distance polish). Ties by min id -> deterministic.

    Plan shape: ONE multi-source BFS builds the (candidate, u, dist)
    table (source rides as a column — S candidates cost one superstep
    loop, not S), then each greedy round is a join + groupBy agg on it.
    The distance table is all-pairs when ``candidates`` is None —
    exact-parity mode for fixture scale, the same bill the reference's
    exact greedy pays; at web scale pass a candidate sample and/or
    ``max_hops`` (both estimator knobs the reference also exposes).
    """
    spark = graph.edges.sparkSession
    nodes = [int(r["id"]) for r in graph.nodes().collect()] if candidates is None else [
        int(c) for c in candidates
    ]
    n = graph.num_nodes()
    D = multi_source_bfs(graph, nodes, max_iter=max_hops).select(
        F.col("source").alias("v"), F.col("id").alias("u"), "dist"
    ).persist()
    cur = graph.nodes().select(
        F.col("id").alias("u"), F.lit(float(n)).alias("d")
    ).localCheckpoint(eager=True)
    group: list = []
    for _ in range(k):
        grp_df = spark.createDataFrame([(g,) for g in group] or [], "v bigint")
        red = (
            D.join(grp_df, "v", "left_anti")
            .join(cur, "u")
            .groupBy("v")
            .agg(F.sum(F.greatest(F.col("d") - F.col("dist"), F.lit(0.0))).alias("red"))
        )
        best = red.orderBy(F.desc("red"), F.asc("v")).limit(1).collect()
        if not best or best[0]["red"] <= 0.0:
            break
        v = int(best[0]["v"])
        group.append(v)
        dv = D.where(F.col("v") == v).select("u", F.col("dist").alias("dv"))
        cur = (
            cur.join(dv, "u", "left")
            .select("u", F.least("d", F.coalesce("dv", F.lit(float("inf")))).alias("d"))
            .localCheckpoint(eager=True)
        )
    D.unpersist()
    return spark.createDataFrame([(g,) for g in group] or [], "id bigint")


def group_harmonic_closeness(
    graph: Graph,
    k: int = 3,
    candidates: list | None = None,
    max_hops: int = 10_000,
) -> DataFrame:
    """(id,) — greedy group-HARMONIC-closeness maximization (centrality/
    GroupHarmonicCloseness.cpp): the group objective is
    Σ_u 1/d(S, u) with d(S, u) = min over members, 1/∞ = 0 for
    unreached vertices and d = 0 self rows contributing nothing; each of
    the k rounds adds the vertex with the largest marginal gain
    Σ_u max(1/d(v, u) − h_cur(u), 0), ties by min id (deterministic).
    Unlike :func:`group_closeness` no unreached penalty is needed —
    harmonic handles disconnection natively (its whole point).

    Plan shape: identical to group_closeness — ONE multi-source BFS
    builds the (candidate, u, 1/dist) table, then each greedy round is
    a join + groupBy agg on it; exact all-candidates mode at fixture
    scale, candidate sampling + ``max_hops`` as the at-scale knobs."""
    spark = graph.edges.sparkSession
    cand = (
        [int(r["id"]) for r in graph.nodes().collect()]
        if candidates is None
        else [int(c) for c in candidates]
    )
    D = (
        multi_source_bfs(graph, cand, max_iter=max_hops)
        .where(F.col("dist") > 0)
        .select(
            F.col("source").alias("v"),
            F.col("id").alias("u"),
            (F.lit(1.0) / F.col("dist")).alias("inv"),
        )
        .persist()
    )
    cur = graph.nodes().select(
        F.col("id").alias("u"), F.lit(0.0).alias("h")
    ).localCheckpoint(eager=True)
    group: list = []
    for _ in range(k):
        grp_df = spark.createDataFrame([(g,) for g in group] or [], "v bigint")
        gain = (
            D.join(grp_df, "v", "left_anti")
            .join(cur, "u")
            .groupBy("v")
            .agg(F.sum(F.greatest(F.col("inv") - F.col("h"), F.lit(0.0))).alias("gain"))
        )
        best = gain.orderBy(F.desc("gain"), F.asc("v")).limit(1).collect()
        if not best or best[0]["gain"] <= 0.0:
            break
        v = int(best[0]["v"])
        group.append(v)
        dv = D.where(F.col("v") == v).select("u", F.col("inv").alias("iv"))
        cur = (
            cur.join(dv, "u", "left")
            .select("u", F.greatest("h", F.coalesce("iv", F.lit(0.0))).alias("h"))
            .localCheckpoint(eager=True)
        )
    D.unpersist()
    return spark.createDataFrame([(g,) for g in group] or [], "id bigint")


def algebraic_distance(
    graph: Graph,
    n_systems: int = 8,
    n_iters: int = 20,
    omega: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """(src, dst, dist) — algebraic distance per stored edge
    (distance/AlgebraicDistance.cpp parity): ``n_systems`` independent
    hash-initialized test vectors smoothed by Jacobi over-relaxation
    x ← (1−ω)·x + ω·(weighted neighbor mean); after ``n_iters`` sweeps an
    edge's distance is the ℓ2 norm of its endpoints' coordinate
    differences — small inside well-connected regions, large across
    bottlenecks (the sparsification/coarsening affinity signal).

    Plan shape: state is one (id, n_systems-wide) row per vertex; each
    sweep is ONE edges⋈state join + ONE hash agg keyed on vertex id for
    all systems together (columns, not rows — no per-system loop)."""
    state, cols = algebraic_coordinates(graph, n_systems, n_iters, omega, seed)
    half = graph.symmetric_edges().where(F.col("src") < F.col("dst")).select(
        "src", "dst"
    )
    su = state.select(
        F.col("id").alias("src"), *[F.col(c).alias(f"u{c}") for c in cols]
    )
    sv = state.select(
        F.col("id").alias("dst"), *[F.col(c).alias(f"v{c}") for c in cols]
    )
    diff2 = sum(
        ((F.col(f"u{c}") - F.col(f"v{c}")) * (F.col(f"u{c}") - F.col(f"v{c}")))
        for c in cols
    )
    return (
        half.join(su, "src")
        .join(sv, "dst")
        .select("src", "dst", F.sqrt(diff2).alias("dist"))
    )


def algebraic_coordinates(
    graph: Graph,
    n_systems: int = 8,
    n_iters: int = 20,
    omega: float = 0.5,
    seed: int = 42,
) -> tuple:
    """(state (id, a0..a{k-1}), cols) — the JOR-smoothed test vectors
    behind :func:`algebraic_distance`; shared with the
    AlgebraicDistanceIndex link-prediction scorer (which measures
    arbitrary pairs, not just stored edges)."""
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "weight")
        .persist()
    )
    wdeg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("wd")
    ).persist()
    cols = [f"a{j}" for j in range(n_systems)]
    state = wdeg.select(
        "id",
        *[
            (
                F.pmod(F.xxhash64("id", F.lit(seed + j)), F.lit(1_000_000))
                / 1_000_000.0
            ).alias(c)
            for j, c in enumerate(cols)
        ],
    ).localCheckpoint(eager=True)
    for it in range(n_iters):
        nb = (
            sym.join(
                state.select(
                    F.col("id").alias("dst"),
                    *[F.col(c).alias(f"n{c}") for c in cols],
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(
                *[
                    F.sum(F.col("weight") * F.col(f"n{c}")).alias(f"s{c}")
                    for c in cols
                ]
            )
        )
        state = (
            state.join(nb, "id", "left")
            .join(wdeg, "id")
            .select(
                "id",
                *[
                    (
                        (1.0 - omega) * F.col(c)
                        + omega
                        * F.coalesce(F.col(f"s{c}") / F.col("wd"), F.col(c))
                    ).alias(c)
                    for c in cols
                ],
            )
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    wdeg.unpersist()
    return state, cols


def jaccard_distance(graph: Graph) -> DataFrame:
    """(src, dst, dist) — per-edge neighborhood Jaccard distance
    1 − |N(u)∩N(v)|/|N(u)∪N(v)| (distance/JaccardDistance.cpp): the
    triangle-plan family — count common neighbors per edge with one
    wedge join, union size from the two degrees."""
    sym = (
        graph.symmetric_edges()
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    half = sym.where(F.col("src") < F.col("dst"))
    wedge = (
        sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        .join(sym.select(F.col("src").alias("w"), F.col("dst").alias("v")), "w")
        .where(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("src"), F.col("v").alias("dst"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        half.join(wedge, ["src", "dst"], "left")
        .join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "du"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dv"), "dst")
        .select(
            "src",
            "dst",
            (
                1.0
                - F.coalesce("common", F.lit(0))
                / (F.col("du") + F.col("dv") - F.coalesce("common", F.lit(0)))
            ).alias("dist"),
        )
    )
    sym.unpersist()
    return out


# ---------------------------------------------------------------------------
# Point-to-point variants — distance/BidirectionalBFS.cpp, AStar.cpp,
# MultiTargetBFS.cpp, SPSP.cpp. All share the frontier-relaxation plan;
# what each adds is its PRUNING rule, which is a filter on the frontier.
# ---------------------------------------------------------------------------


def spsp(graph: Graph, source: int, target: int, max_iter: int = 10_000,
         return_path: bool = False):
    """Single-pair shortest weighted distance (distance/SPSP.cpp), or
    None if unreachable. Early exit: once every frontier entry's
    tentative distance is >= the best known target distance, no shorter
    path can appear (non-negative weights). ``return_path=True`` returns
    (dist, [source, …, target]) instead (getPath parity; preds ride the
    relaxation agg as a struct-min, no extra shuffle)."""
    spark = graph.edges.sparkSession
    e = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    ).persist()
    dist = spark.createDataFrame(
        [(int(source), 0.0, None)], "id bigint, dist double, pred bigint"
    ).localCheckpoint(eager=True)
    frontier = dist
    best = None
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.id == e.src)
            .select(
                F.col("dst").alias("id"),
                F.struct(
                    (F.col("dist") + F.col("weight")).alias("nd"),
                    F.col("src").alias("pred"),
                ).alias("s"),
            )
            .groupBy("id")
            .agg(F.min("s").alias("s"))
            .select("id", F.col("s.nd").alias("nd"), F.col("s.pred").alias("np"))
        )
        merged = (
            cand.join(dist.select("id", "dist"), "id", "left")
            .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"), F.col("np").alias("pred"))
            .localCheckpoint(eager=True)
        )
        if merged.isEmpty():
            break
        dist = (
            dist.join(merged.select("id"), "id", "left_anti")
            .unionByName(merged)
            .localCheckpoint(eager=True)
        )
        t_row = dist.where(F.col("id") == target).collect()
        best = float(t_row[0]["dist"]) if t_row else None
        frontier = merged
        if best is not None:
            fmin = frontier.agg(F.min("dist")).collect()[0][0]
            if fmin is None or fmin >= best:
                break
    e.unpersist()
    if not return_path:
        return best
    if best is None:
        return None, None
    return best, get_path(dist, source, target)


def multi_target_bfs(
    graph: Graph, source: int, targets: list, max_iter: int = 10_000
) -> DataFrame:
    """(id, dist) hop distances from ``source`` to each reachable target
    (distance/MultiTargetBFS.cpp); stops as soon as every target is
    settled rather than exhausting the component."""
    spark = graph.edges.sparkSession
    e = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .persist()
    )
    tgt = spark.createDataFrame([(int(t),) for t in targets], "id bigint")
    n_targets = tgt.count()
    dist = spark.createDataFrame(
        [(int(source), 0)], "id bigint, dist int"
    ).localCheckpoint(eager=True)
    frontier = dist
    lvl = 0
    while True:
        found = dist.join(tgt, "id", "left_semi").count()
        if found >= n_targets:
            break
        new = (
            frontier.join(e, frontier.id == e.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(lvl + 1))
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
        frontier = new
        lvl += 1
        if lvl > max_iter:
            break
    e.unpersist()
    return dist.join(tgt, "id", "left_semi")


def multi_target_sssp(
    graph: Graph, source: int, targets: list, max_iter: int = 10_000
) -> DataFrame:
    """(id, dist) shortest WEIGHTED distances from ``source`` to each
    reachable target (distance/MultiTargetDijkstra.cpp) — the weighted
    sibling of :func:`multi_target_bfs`. Early exit mirrors spsp: with
    non-negative weights, once every target is settled and the minimum
    tentative frontier distance is >= the worst settled target distance,
    no target can improve."""
    spark = graph.edges.sparkSession
    e = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    ).persist()
    tgt = spark.createDataFrame([(int(t),) for t in targets], "id bigint").persist()
    n_targets = tgt.count()
    dist = spark.createDataFrame(
        [(int(source), 0.0)], "id bigint, dist double"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iter):
        cand = (
            frontier.join(e, frontier.id == e.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("nd"))
        )
        improved = (
            cand.join(dist.select("id", F.col("dist").alias("old")), "id", "left")
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
        settled = dist.join(tgt, "id", "left_semi")
        if settled.count() >= n_targets:
            worst = settled.agg(F.max("dist")).collect()[0][0]
            fmin = frontier.agg(F.min("dist")).collect()[0][0]
            if fmin is None or fmin >= worst:
                break
    e.unpersist()
    out = dist.join(tgt, "id", "left_semi")
    tgt.unpersist()
    return out


def bidirectional_bfs(graph: Graph, source: int, target: int, max_iter: int = 10_000):
    """Hop distance source→target or None (distance/BidirectionalBFS.cpp):
    frontiers expand from BOTH endpoints (backward over the transpose on
    directed graphs), alternating the SMALLER side — each meeting check
    is a semi-join. Touches O(b^(d/2)) vertices per side instead of
    O(b^d)."""
    spark = graph.edges.sparkSession
    fwd = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .select("src", "dst")
        .persist()
    )
    bwd = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")).persist()
    if source == target:
        return 0
    ds = spark.createDataFrame([(int(source), 0)], "id bigint, dist int")
    dt = spark.createDataFrame([(int(target), 0)], "id bigint, dist int")
    fs, ft = ds, dt
    sz_s = sz_t = 1
    for _ in range(max_iter):
        meet = (
            ds.join(dt.withColumnRenamed("dist", "dt"), "id")
            .agg(F.min(F.col("dist") + F.col("dt")))
            .collect()[0][0]
        )
        if meet is not None:
            fwd.unpersist()
            bwd.unpersist()
            return int(meet)
        if fs.isEmpty() and ft.isEmpty():
            break
        expand_s = (not fs.isEmpty()) and (ft.isEmpty() or sz_s <= sz_t)
        if expand_s:
            new = (
                fs.join(fwd, fs.id == fwd.src)
                .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .join(ds.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            ds = ds.unionByName(new).localCheckpoint(eager=True)
            fs = new
            sz_s = new.count()
        else:
            new = (
                ft.join(bwd, ft.id == bwd.src)
                .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .join(dt.select("id"), "id", "left_anti")
                .localCheckpoint(eager=True)
            )
            dt = dt.unionByName(new).localCheckpoint(eager=True)
            ft = new
            sz_t = new.count()
    fwd.unpersist()
    bwd.unpersist()
    return None


def bidirectional_dijkstra(
    graph: Graph, source: int, target: int, max_iter: int = 10_000
):
    """Weighted source→target distance or None (distance/
    BidirectionalDijkstra.cpp): relaxation frontiers expand from both
    endpoints (backward over the transpose on directed graphs),
    alternating the SMALLER side. Correctness at μ = best meeting
    distance: with non-negative weights any tentative distance ≥ μ can
    only produce paths of length ≥ μ, so such candidates are pruned and
    the loop runs until both frontiers drain — each side touches only
    the region within μ of its endpoint (the bidirectional win) and the
    final μ is exact."""
    spark = graph.edges.sparkSession
    fwd = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    ).persist()
    bwd = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    ).persist()
    if int(source) == int(target):
        fwd.unpersist()
        bwd.unpersist()
        return 0.0
    ds = spark.createDataFrame([(int(source), 0.0)], "id bigint, dist double")
    dt = spark.createDataFrame([(int(target), 0.0)], "id bigint, dist double")
    fs, ft = ds, dt
    sz_s = sz_t = 1
    best = None
    for _ in range(max_iter):
        meet = (
            ds.join(dt.withColumnRenamed("dist", "db"), "id")
            .agg(F.min(F.col("dist") + F.col("db")))
            .collect()[0][0]
        )
        if meet is not None:
            best = float(meet) if best is None else min(best, float(meet))
        if sz_s == 0 and sz_t == 0:
            break
        expand_s = (sz_s > 0) and (sz_t == 0 or sz_s <= sz_t)
        edges, dist, frontier = (fwd, ds, fs) if expand_s else (bwd, dt, ft)
        cand = (
            frontier.join(edges, frontier.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("weight")).alias("nd"))
        )
        if best is not None:
            cand = cand.where(F.col("nd") < F.lit(best))
        improved = (
            cand.join(dist.select("id", F.col("dist").alias("old")), "id", "left")
            .where(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        n_new = improved.count()
        dist = (
            dist.join(improved.select("id"), "id", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        if expand_s:
            ds, fs, sz_s = dist, improved, n_new
        else:
            dt, ft, sz_t = dist, improved, n_new
    fwd.unpersist()
    bwd.unpersist()
    return best


def astar_landmarks(
    graph: Graph,
    source: int,
    target: int,
    n_landmarks: int = 4,
    seed: int = 42,
    max_iter: int = 10_000,
    return_path: bool = False,
):
    """Goal-directed point-to-point distance via ALT A* (distance/
    AStar.cpp contract; the landmark potential replaces the reference's
    user-supplied heuristic — undirected graphs, where landmark triangle
    bounds are valid both ways). π(v) = max_l |d(l,t) − d(l,v)| is an
    admissible lower bound on d(v,t); each relaxation round PRUNES
    frontier rows with g(v) + π(v) ≥ best-known d(s,t) — the A* cut,
    expressed as a filter on the frontier DataFrame. Landmark distances
    are computed with WEIGHTED relaxation (multi_source_sssp) so the
    triangle-inequality bound holds for any positive weights — hop-count
    landmarks are inadmissible when an edge weight is < 1."""
    spark = graph.edges.sparkSession
    nodes = graph.nodes()
    lms = [
        r["id"]
        for r in nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(n_landmarks)
        .collect()
    ]
    ld = multi_source_sssp(graph, lms).persist()
    lt = {
        r["source"]: r["dist"]
        for r in ld.where(F.col("id") == target).collect()
    }
    if not lt:
        ld.unpersist()
        if return_path:
            return (None, None) if source != target else (0, [int(source)])
        return None if source != target else 0
    # π per vertex: max over landmarks seen by BOTH v and t
    pi_terms = [
        F.abs(
            F.lit(float(dt))
            - F.max(F.when(F.col("source") == l, F.col("dist"))),
        )
        for l, dt in lt.items()
    ]
    pot = (
        ld.groupBy("id")
        .agg(F.greatest(*pi_terms, F.lit(0.0)).alias("pi"))
        .persist()
    )
    e = graph.symmetric_edges().select("src", "dst", "weight").persist()
    dist = spark.createDataFrame(
        [(int(source), 0.0, None)], "id bigint, dist double, pred bigint"
    ).localCheckpoint(eager=True)
    frontier = dist
    best = 0.0 if source == target else None
    for _ in range(max_iter):
        if best is not None:
            frontier = frontier.join(pot, "id", "left").where(
                F.col("dist") + F.coalesce("pi", F.lit(0.0)) < F.lit(best)
            ).select("id", "dist")
        cand = (
            frontier.join(e, frontier.id == e.src)
            .select(
                F.col("dst").alias("id"),
                F.struct(
                    (F.col("dist") + F.col("weight")).alias("nd"),
                    F.col("src").alias("pred"),
                ).alias("s"),
            )
            .groupBy("id")
            .agg(F.min("s").alias("s"))
            .select("id", F.col("s.nd").alias("nd"), F.col("s.pred").alias("np"))
        )
        merged = (
            cand.join(dist.select("id", "dist"), "id", "left")
            .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"), F.col("np").alias("pred"))
            .localCheckpoint(eager=True)
        )
        if merged.isEmpty():
            break
        dist = (
            dist.join(merged.select("id"), "id", "left_anti")
            .unionByName(merged)
            .localCheckpoint(eager=True)
        )
        t_row = dist.where(F.col("id") == target).collect()
        if t_row:
            best = float(t_row[0]["dist"])
        frontier = merged
    e.unpersist()
    pot.unpersist()
    ld.unpersist()
    if not return_path:
        return best
    if best is None:
        return None, None
    return best, get_path(dist, source, target)
