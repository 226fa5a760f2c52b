"""Selective community detection — seed-set expansion via personalized
PageRank + conductance sweep.

Reference parity: scd/PageRankNibble.cpp (Andersen–Chung–Lang style: run
(approximate) personalized PageRank from the seed, order vertices by
rank/degree, take the prefix minimizing conductance). The reference's
push-based APR is a sequential priority loop; the distributed twin runs
PPR as teleport-to-seed power iteration (same fixed point), and the sweep
is a window over the PPR SUPPORT — the localized non-zero set, thousands
of rows even on a web graph, never the full vertex table. The support is
explicitly capped (``max_support``) so the sweep's sort is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from linkgraph.graph import Graph


def personalized_pagerank(
    graph: Graph,
    seeds: list,
    alpha: float = 0.15,
    tol: float = 1e-8,
    max_iter: int = 60,
) -> DataFrame:
    """(id, rank) — PageRank with teleport restricted to ``seeds``
    (uniform over the seed set). Sparse state: only vertices with nonzero
    rank appear (the PPR support), so supersteps cost O(support·deg), not
    O(n) — the distributed analogue of push-based locality."""
    spark = graph.edges.sparkSession
    sym = (graph.edges if graph.directed else graph.symmetric_edges()).select(
        "src", "dst", "weight"
    )
    out_w = sym.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    e = (
        sym.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
        .persist()
    )
    s = 1.0 / len(seeds)
    seed_df = spark.createDataFrame(
        [(int(v), s) for v in seeds], "id bigint, teleport double"
    ).persist()
    rank = seed_df.select("id", F.col("teleport").alias("rank"))
    for it in range(max_iter):
        spread = (
            rank.join(e, rank.id == e.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("frac") * (1.0 - alpha)).alias("m"))
        )
        new = (
            spread.join(seed_df, "id", "full")
            .select(
                "id",
                (
                    F.coalesce("m", F.lit(0.0))
                    + F.lit(alpha) * F.coalesce("teleport", F.lit(0.0))
                ).alias("rank"),
            )
            .where(F.col("rank") > 0)
            .localCheckpoint(eager=True)
        )
        # convergence scan every 4th iteration only — the scan is a full
        # join + driver collect, 4x the cost of the superstep itself at
        # small support; the geometric (1-alpha) contraction means at most
        # 3 extra cheap iterations past the tol crossing
        if tol > 0 and (it % 4 == 3 or it == max_iter - 1):
            delta = (
                new.join(rank.withColumnRenamed("rank", "old"), "id", "full")
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce("rank", F.lit(0.0))
                            - F.coalesce("old", F.lit(0.0))
                        )
                    )
                )
                .collect()[0][0]
            )
            rank = new
            if delta is not None and delta < tol:
                break
        else:  # fixed-iteration mode (tol=0): no per-iter convergence scan
            rank = new
    e.unpersist()
    return rank


def pagerank_nibble(
    graph: Graph,
    seeds: list,
    alpha: float = 0.15,
    max_support: int = 10_000,
    tol: float = 1e-8,
    max_iter: int = 60,
    round_rank: int | None = None,
) -> DataFrame:
    """(id,) — the community around ``seeds``: the prefix of the
    rank/degree-ordered PPR support with minimum conductance
    (scd/PageRankNibble.cpp). The sweep's running sums are a window over
    at most ``max_support`` rows (top support by rank), explicitly
    bounded — never a full-table sort.

    ``tol=0`` + ``max_iter`` runs the PPR at a fixed iteration count and
    ``round_rank`` quantizes ranks before the sweep key — together they
    make the whole sweep (exact integer-weight vol/cut arithmetic over
    rounded ranks) bit-replayable by the DuckDB gate oracle
    (gate_sql.nibble_sql). Defaults keep the converged float path."""
    ppr = personalized_pagerank(
        graph, seeds, alpha=alpha, tol=tol, max_iter=max_iter
    )
    if round_rank is not None:
        ppr = ppr.select("id", F.round("rank", round_rank).alias("rank"))
    # WEIGHTED degree throughout: vol, cut and 2m must share one unit or
    # the sweep denominators disagree on weighted graphs
    deg = graph.remove_self_loops().degrees().select(
        "id", F.col("weighted_degree").alias("wdeg")
    )
    two_m = float(
        graph.symmetric_edges().agg(F.sum("weight")).collect()[0][0] or 0.0
    )
    support = (
        ppr.join(deg, "id")
        .where(F.col("wdeg") > 0)
        .select("id", (F.col("rank") / F.col("wdeg")).alias("key"), "wdeg")
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(max_support)
        .localCheckpoint(eager=True)
    )
    # prefix volume: running sum of weighted degree in sweep order
    w = Window.orderBy(F.desc("key"), F.asc("id"))
    pref = support.select(
        "id",
        F.row_number().over(w).alias("pos"),
        F.sum("wdeg").over(w).alias("vol"),
    ).persist()
    # cut(prefix) = vol(prefix) − 2·internal_edges(prefix): count internal
    # edges per prefix via the LATER endpoint's position.
    sym = graph.symmetric_edges().where(F.col("src") < F.col("dst"))
    pe = (
        sym.join(pref.select(F.col("id").alias("src"), F.col("pos").alias("pu")), "src")
        .join(pref.select(F.col("id").alias("dst"), F.col("pos").alias("pv")), "dst")
        .select(F.greatest("pu", "pv").alias("pos"), "weight")
        .groupBy("pos")
        .agg(F.sum("weight").alias("closed"))
    )
    # internal(prefix k) = Σ_{pos ≤ k} closed — another bounded window
    sweep = (
        pref.join(pe, "pos", "left")
        .withColumn(
            "internal",
            F.sum(F.coalesce("closed", F.lit(0.0))).over(
                Window.orderBy("pos")
            ),
        )
        .select(
            "id",
            "pos",
            "vol",
            (F.col("vol") - 2.0 * F.col("internal")).alias("cut"),
        )
    )
    denom = F.least(F.col("vol"), F.lit(two_m) - F.col("vol"))
    sweep = sweep.withColumn(
        "cond",
        F.when(denom > 0, F.col("cut") / denom).otherwise(F.lit(1.0)),
    )
    best = (
        sweep.orderBy(F.asc("cond"), F.asc("pos")).limit(1).collect()
    )
    pref.unpersist()
    if not best:
        return graph.nodes().select("id").limit(0)
    k = best[0]["pos"]
    return sweep.where(F.col("pos") <= k).select("id")


def conductance_of(graph: Graph, members: DataFrame) -> float:
    """Scalar conductance of a vertex set (scd quality helper)."""
    sym = graph.symmetric_edges()
    m = members.select("id")
    lab = sym.join(
        m.withColumnRenamed("id", "src").withColumn("in_s", F.lit(1)), "src", "left"
    ).join(
        m.withColumnRenamed("id", "dst").withColumn("in_t", F.lit(1)), "dst", "left"
    )
    row = lab.agg(
        F.sum(F.when(F.col("in_s").isNotNull(), F.col("weight")).otherwise(0.0)).alias("vol"),
        F.sum(
            F.when(
                F.col("in_s").isNotNull() & F.col("in_t").isNull(), F.col("weight")
            ).otherwise(0.0)
        ).alias("cut"),
        F.sum("weight").alias("two_m"),
    ).collect()[0]
    vol, cut, two_m = row["vol"] or 0.0, row["cut"] or 0.0, row["two_m"] or 0.0
    denom = min(vol, two_m - vol)
    return float(cut / denom) if denom > 0 else 1.0


# ---------------------------------------------------------------------------
# Remaining scd/ seed-set detectors (reference: scd/GCE.cpp, LFMLocal.cpp,
# TCE.cpp, LocalTightnessExpansion.cpp, CliqueDetect.cpp, CombinedSCD.cpp,
# RandomBFS.cpp). All are seed-local: the community never exceeds
# ``max_size`` vertices, so the driver greedy loop is bounded; each step's
# candidate scoring is ONE distributed join + aggregate over the boundary.
# ---------------------------------------------------------------------------


def random_bfs_community(graph: Graph, seed: int, size: int = 50) -> DataFrame:
    """(id,) — BFS ball around the seed cut to ``size`` vertices
    (scd/RandomBFS.cpp intent; deterministic hash order replaces the
    reference's random neighbor order for N-vs-4N identity)."""
    from linkgraph.algs.bfs import bfs

    d = bfs(graph, seed)
    return (
        d.orderBy(F.asc("dist"), F.xxhash64("id"), F.asc("id"))
        .limit(size)
        .select("id")
    )


def clique_detect(graph: Graph, seed: int) -> DataFrame:
    """(id,) — the largest clique containing the seed (scd/CliqueDetect.cpp):
    collect the seed's ego-net (bounded by its degree — the reference is
    likewise ego-local) and run Bron–Kerbosch restricted to the seed."""
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst"))
    nbrs = {
        r["dst"]
        for r in sym.where(F.col("src") == seed).select("dst").collect()
    }
    if not nbrs:
        return graph.edges.sparkSession.createDataFrame(
            [(int(seed),)], "id bigint"
        )
    adj_rows = (
        sym.where(F.col("src").isin(list(nbrs)) & F.col("dst").isin(list(nbrs)))
        .select("src", "dst")
        .collect()
    )
    adj: dict = {v: set() for v in nbrs}
    for r in adj_rows:
        adj[r["src"]].add(r["dst"])
    best: list = []

    def bk(r: set, p: set, x: set) -> None:
        nonlocal best
        if not p and not x:
            if len(r) > len(best):
                best = sorted(r)
            return
        pivot = max(p | x, key=lambda v: len(adj[v] & p))
        for v in sorted(p - adj[pivot]):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(nbrs), set())
    members = [int(seed)] + [int(v) for v in best]
    return graph.edges.sparkSession.createDataFrame(
        [(m,) for m in sorted(members)], "id bigint"
    )


def _greedy_expand(
    graph: Graph,
    seeds: list,
    score_mode: str,
    max_size: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Shared greedy seed-set expansion. Per step, boundary candidates are
    scored distributively; modes:

    - 'conductance' (GCE.cpp): add the candidate minimizing the expanded
      set's conductance; stop when no candidate improves it;
    - 'fitness' (LFMLocal.cpp): fitness f(S) = k_in/(k_in+k_out)^alpha;
      add the best positive-gain candidate;
    - 'tightness' (LocalTightnessExpansion.cpp): score w(i->S)/k_i
      (normalized attachment), relative-drop stopping: stop when the
      best candidate scores under half the previously accepted score —
      the similarity-ordering cliff the reference's expansion keys on;
    - 'triangles' (TCE.cpp): score = weight of edges among N(i) inside S
      (triangles closed with S); stop when the best closes none.
    """
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst")).persist()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.sum("weight").alias("k")
    ).persist()
    members = {int(s) for s in seeds}
    two_w = float(sym.agg(F.sum("weight")).collect()[0][0] or 0.0)

    def stats(mset: set):
        m = spark.createDataFrame([(v,) for v in mset], "id bigint")
        row = (
            sym.join(m.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(
                m.withColumnRenamed("id", "dst").withColumn("_in", F.lit(1)),
                "dst",
                "left",
            )
            .agg(
                F.sum("weight").alias("vol"),
                F.sum(
                    F.when(F.col("_in").isNull(), F.col("weight")).otherwise(0.0)
                ).alias("cut"),
            )
            .collect()[0]
        )
        return float(row["vol"] or 0.0), float(row["cut"] or 0.0)

    vol, cut = stats(members)
    prev_score = None
    while len(members) < max_size:
        m = spark.createDataFrame([(v,) for v in members], "id bigint")
        w_is = (
            sym.join(m.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .join(m.withColumnRenamed("id", "src"), "src", "left_anti")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("weight").alias("w"))
            .join(deg, "id")
        )
        if score_mode == "triangles":
            # weight of S-internal edges among the candidate's neighbors
            nb = sym.join(m.withColumnRenamed("id", "src"), "src", "left_anti").join(
                m.withColumnRenamed("id", "dst"), "dst", "left_semi"
            ).select(F.col("src").alias("id"), F.col("dst").alias("a"))
            s_edges = sym.join(
                m.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(m.withColumnRenamed("id", "dst"), "dst", "left_semi").select(
                F.col("src").alias("a"), F.col("dst").alias("b"), "weight"
            )
            tri = (
                nb.join(nb.withColumnRenamed("a", "b"), "id")
                .join(s_edges, ["a", "b"])
                .groupBy("id")
                .agg((F.sum("weight") / 2.0).alias("tw"))
            )
            cand = w_is.join(tri, "id", "left").select(
                "id", F.coalesce("tw", F.lit(0.0)).alias("score"), "w", "k"
            )
            best = (
                cand.orderBy(F.desc("score"), F.asc("id")).limit(1).collect()
            )
            if not best:
                break
            if best[0]["score"] <= 0:
                # bootstrap: a singleton seed closes no triangles yet —
                # take the strongest attachment once, then require
                # triangle support
                if len(members) >= 2:
                    break
                best = cand.orderBy(F.desc("w"), F.asc("id")).limit(1).collect()
                if not best:
                    break
            pick = best[0]
        elif score_mode == "tightness":
            cand = w_is.select(
                "id", (F.col("w") / F.col("k")).alias("score"), "w", "k"
            )
            best = cand.orderBy(F.desc("score"), F.asc("id")).limit(1).collect()
            if not best or best[0]["score"] <= 0:
                break
            if prev_score is not None and best[0]["score"] < 0.5 * prev_score:
                break
            prev_score = float(best[0]["score"])
            pick = best[0]
        elif score_mode == "fitness":
            k_in = (vol - cut) / 2.0
            f_old = (
                (2.0 * k_in) / ((2.0 * k_in + cut) ** alpha)
                if (2.0 * k_in + cut) > 0
                else 0.0
            )
            cand = w_is.select(
                "id",
                (
                    (2.0 * (F.lit(k_in) + F.col("w")))
                    / F.pow(
                        2.0 * (F.lit(k_in) + F.col("w"))
                        + (F.lit(cut) + F.col("k") - 2.0 * F.col("w")),
                        F.lit(alpha),
                    )
                    - F.lit(f_old)
                ).alias("score"),
                "w",
                "k",
            )
            best = cand.orderBy(F.desc("score"), F.asc("id")).limit(1).collect()
            if not best or best[0]["score"] <= 0:
                break
            pick = best[0]
        else:  # conductance
            denom_old = min(vol, two_w - vol)
            phi_old = cut / denom_old if denom_old > 0 else 1.0
            nv = F.lit(vol) + F.col("k")
            nc = F.lit(cut) + F.col("k") - 2.0 * F.col("w")
            nd = F.least(nv, F.lit(two_w) - nv)
            cand = w_is.select(
                "id",
                F.when(nd > 0, nc / nd).otherwise(F.lit(1.0)).alias("score"),
                "w",
                "k",
            )
            best = cand.orderBy(F.asc("score"), F.asc("id")).limit(1).collect()
            if not best or best[0]["score"] >= phi_old:
                break
            pick = best[0]
        members.add(int(pick["id"]))
        vol = vol + float(pick["k"])
        cut = cut + float(pick["k"]) - 2.0 * float(pick["w"])
    sym.unpersist()
    deg.unpersist()
    return spark.createDataFrame(
        [(v,) for v in sorted(members)], "id bigint"
    )


def ground_truth_comparison(
    detected: DataFrame, truth_cover: DataFrame, ignore_seeds: bool = False
) -> DataFrame:
    """(seed, tp, det_size, truth_size, precision, recall, f1, jaccard)
    per seed — scd/SCDGroundTruthComparison.cpp: the ground truth for a
    seed is the UNION of cover subsets containing that seed; each
    detected community is scored against it. ``ignore_seeds`` drops the
    seed vertex from both sides before scoring (the reference's flag).

    Inputs: ``detected`` (seed, id) — one row per detected member per
    seed; ``truth_cover`` (id, label) — overlapping cover. Empty sides
    score 0 (reference convention). Plan: three hash-aggs + three joins
    keyed on seed — no windows, scale-safe in the number of seeds ×
    community sizes."""
    seeds = detected.select("seed").distinct()
    seed_labels = seeds.join(
        truth_cover.select(F.col("id").alias("seed"), "label"), "seed"
    ).select("seed", "label").distinct()
    gt = (
        seed_labels.join(truth_cover, "label")
        .select("seed", "id")
        .distinct()
    )
    det = detected.select("seed", "id").distinct()
    if ignore_seeds:
        det = det.where(F.col("id") != F.col("seed"))
        gt = gt.where(F.col("id") != F.col("seed"))
    tp = det.join(gt, ["seed", "id"]).groupBy("seed").agg(
        F.count("*").alias("tp")
    )
    ds = det.groupBy("seed").agg(F.count("*").alias("det_size"))
    ts = gt.groupBy("seed").agg(F.count("*").alias("truth_size"))
    m = (
        seeds.join(ds, "seed", "left")
        .join(ts, "seed", "left")
        .join(tp, "seed", "left")
        .select(
            "seed",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("det_size", F.lit(0)).alias("det_size"),
            F.coalesce("truth_size", F.lit(0)).alias("truth_size"),
        )
    )
    p = F.when(
        F.col("det_size") > 0, F.col("tp") / F.col("det_size")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("truth_size") > 0, F.col("tp") / F.col("truth_size")
    ).otherwise(F.lit(0.0))
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    union_sz = F.col("det_size") + F.col("truth_size") - F.col("tp")
    jac = F.when(union_sz > 0, F.col("tp") / union_sz).otherwise(F.lit(0.0))
    return m.select(
        "seed",
        "tp",
        "det_size",
        "truth_size",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(jac, 6).alias("jaccard"),
    )


def gce(graph: Graph, seeds: list, max_size: int = 100) -> DataFrame:
    """Greedy Community Expansion (scd/GCE.cpp)."""
    return _greedy_expand(graph, seeds, "conductance", max_size)


def lfm_local(
    graph: Graph, seeds: list, alpha: float = 1.0, max_size: int = 100
) -> DataFrame:
    """LFM local fitness maximization (scd/LFMLocal.cpp)."""
    return _greedy_expand(graph, seeds, "fitness", max_size, alpha=alpha)


def local_tightness_expansion(
    graph: Graph, seeds: list, max_size: int = 100
) -> DataFrame:
    """Local tightness expansion (scd/LocalTightnessExpansion.cpp)."""
    return _greedy_expand(graph, seeds, "tightness", max_size)


def tce(graph: Graph, seeds: list, max_size: int = 100) -> DataFrame:
    """Triangle-based community expansion (scd/TCE.cpp)."""
    return _greedy_expand(graph, seeds, "triangles", max_size)


def combined_scd(graph: Graph, seeds: list, max_size: int = 100) -> DataFrame:
    """(id,) — run GCE, LFMLocal and PageRankNibble, return the lowest-
    conductance community (scd/CombinedSCD.cpp intent)."""
    results = [
        gce(graph, seeds, max_size=max_size),
        lfm_local(graph, seeds, max_size=max_size),
        pagerank_nibble(graph, seeds, max_support=max_size * 10),
    ]
    scored = [(conductance_of(graph, r), i, r) for i, r in enumerate(results)]
    scored.sort(key=lambda t: (t[0], t[1]))
    return scored[0][2]
