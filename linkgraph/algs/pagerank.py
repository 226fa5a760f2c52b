"""PageRank — power iteration with teleport, sink handling, skew handling.

Reference parity: networkit/cpp/centrality/PageRank.cpp::PageRank::run —
``r_{k+1}(u) = (1-d)/n + d * (Σ_{v∈in(u)} r_k(v)·w(v,u)/wdeg_out(v)
+ sinkMass/n)`` with L1 (or L2) residual convergence and
``SinkHandling::{NO_SINK_HANDLING, DISTRIBUTE_SINKS}``. The driver metric
(BASELINE.json:2) is edges/sec per superstep of this loop to 1e-6.

Plan per superstep (the three shuffles named in BASELINE.json:6):
1. message exchange: ranks ⋈ edges_frac on src → groupBy(dst).sum —
   partial aggregation combines map-side, so hub *in*-degree skew never
   concentrates raw rows on one reducer;
2. degree aggregation happens ONCE up front (edges_frac precomputes
   w/wdeg_out and is persisted across all iterations — static);
3. label/rank frontier re-join with the node set (left join, coalesce 0).

Explicit hub-skew handling (north rule: "partitioning / shuffle / skew
handled explicitly"): `hub_top_k` splits the rank⋈edge join — edges whose
src is a top-k out-degree heavy hitter join against a BROADCAST of just
those k frontier rows (k rows ≪ memory), everything else takes the normal
shuffle hash join; AQE skew-join remains the backstop. At fixture scale the
split is exercised by tests; at 10^12 scale k≈10^4 hubs cover the Zipf head.

Resumability: every superstep is checkpointed with a manifest (residual,
rows, per-partition counts) via linkgraph.superstep — a killed run resumes
from the last completed iteration (BASELINE.json:14).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import Superstep


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    distribute_sinks: bool = True,
    norm: str = "l1",
    hub_top_k: int = 0,
    work_dir: str | None = None,
    resume: bool = False,
    csr_partition: bool = True,
    teleport: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Return ``(id, rank)``; ranks sum to 1 when ``distribute_sinks``.

    ``init_ranks``: optional (id, rank) warm start — e.g. the previous
    crawl snapshot's converged ranks. Vertices absent from the frame
    start at 1/n; the vector renormalizes to sum 1. Measured on a 1%
    edge-churn snapshot diff (R-MAT 18, 4.2M edges,
    tools/warmstart_probe.py): 9 supersteps cold → 6 warm at tol=1e-6
    (11 → 9 at 1e-8) — the saving is the early coarse supersteps; the
    perturbation's own mixing time still has to run. The streaming
    pipeline's re-trigger path uses this.

    ``tol=0`` with a finite ``max_iter`` gives an exact fixed-iteration run
    (used by the unrolled-SQL DuckDB oracle).

    ``teleport``: optional (id, p) personalization vector (personalized
    PageRank / random walk with restart). p is normalized internally;
    vertices absent from the frame get p=0. The teleport term becomes
    (1−d)·p_i and dangling mass is redistributed ∝ p (so ranks still sum
    to 1 under ``distribute_sinks``). ``None`` (the default) keeps the
    uniform-vector fast path bit-identical to previous releases — p
    rides the O(n) state as a static column, adding no extra shuffle.
    """
    spark = graph.edges.sparkSession
    work_dir = work_dir or tempfile.mkdtemp(prefix="lg_pr_")

    nodes = graph.nodes().persist()
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))

    # Directed graphs rank over stored edges; undirected over both directions
    # (NetworKit treats undirected neighbors symmetrically).
    e = graph.edges if graph.directed else graph.symmetric_edges()
    if not graph.weighted:
        e = e.withColumn("weight", F.lit(1.0))

    out = e.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    # CSR-block discipline (BASELINE.json:6): hash-partition the static
    # edge table on src ONCE and persist. Catalyst then satisfies the
    # per-superstep ranks⋈edges join by shuffling only the O(n) rank state
    # to the edges' partitioning — without this, every superstep re-
    # shuffles the O(m) edge table (measured 2-3x superstep cost at 33M
    # edges). On a real cluster the same effect comes from bucketed
    # Iceberg/parquet tables (linkgraph.tables).
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_frac = e.join(out, "src").select(
        "src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac")
    )
    if csr_partition:
        edges_frac = edges_frac.repartition(n_parts, "src")
    edges_frac = edges_frac.persist()
    edges_frac.count()  # materialize once; static across supersteps

    hubs = hub_edges = rest_edges = None
    if hub_top_k > 0:
        hubs = (
            out.orderBy(F.desc("wdeg"), F.asc("src"))
            .limit(hub_top_k)
            .select(F.col("src").alias("id"))
            .persist()
        )
        hub_edges = edges_frac.join(
            F.broadcast(hubs.withColumnRenamed("id", "src")), "src"
        ).persist()
        rest_edges = edges_frac.join(
            F.broadcast(hubs.withColumnRenamed("id", "src")), "src", "left_anti"
        ).persist()

    personalized = teleport is not None
    tp_df = None
    if personalized:
        tsum = teleport.agg(F.sum("p")).collect()[0][0]
        if not tsum or tsum <= 0.0:
            raise ValueError("teleport vector must have positive total mass")
        tp_df = teleport.select(
            "id", (F.col("p") / F.lit(float(tsum))).alias("tp")
        )
    uniform_teleport = (1.0 - damping) / n

    def init() -> DataFrame:
        # sink flag is static per vertex → carried in the state so the
        # per-superstep dangling-mass sum is a scan-agg on the already-
        # materialized O(n) state, not a shuffle join
        out_ids = edges_frac.select(F.col("src").alias("id")).distinct()
        state = nodes.join(
            out_ids.withColumn("has_out", F.lit(True)), "id", "left"
        )
        if personalized:
            # p is static per vertex too → same trick: one init-time join,
            # then every superstep reads it from the materialized state
            base = state.join(tp_df, "id", "left").select(
                "id",
                F.coalesce("tp", F.lit(0.0)).alias("rank"),
                (~F.coalesce(F.col("has_out"), F.lit(False))).alias("sink"),
                F.lit(0.0).alias("delta"),
                F.coalesce("tp", F.lit(0.0)).alias("tp"),
            )
        else:
            base = state.select(
                "id",
                F.lit(1.0 / n).alias("rank"),
                (~F.coalesce(F.col("has_out"), F.lit(False))).alias("sink"),
                F.lit(0.0).alias("delta"),
            )
        if init_ranks is None:
            return base
        ir = init_ranks.select("id", F.col("rank").alias("_r0"))
        joined = base.join(ir, "id", "left").withColumn(
            "_r0", F.coalesce("_r0", F.lit(1.0 / n))
        )
        tot = joined.agg(F.sum("_r0")).collect()[0][0]
        return joined.withColumn(
            "rank", F.col("_r0") / F.lit(float(tot))
        ).drop("_r0")

    # sink mass is computed inside the SAME aggregation pass as the
    # convergence metric (one action per superstep, not two) and handed to
    # the next step through this holder; None → compute fresh (first step
    # of a run or a resume)
    holder = {"sink_mass": None}

    def step(state: DataFrame, k: int) -> DataFrame:
        if not distribute_sinks:
            sink_mass = 0.0
        elif holder["sink_mass"] is not None:
            sink_mass = holder["sink_mass"]
        else:
            sink_mass = (
                state.where("sink").agg(F.sum("rank").alias("s")).collect()[0]["s"]
                or 0.0
            )

        ranks = state.select("id", "rank")
        if hubs is not None:
            # heavy-hitter split: tiny hub frontier is broadcast, avoiding a
            # shuffle of the (huge) hub edge block on the skewed key
            hub_ranks = ranks.join(F.broadcast(hubs), "id")
            msg_hub = hub_edges.join(
                F.broadcast(hub_ranks.withColumnRenamed("id", "src")), "src"
            )
            msg_rest = rest_edges.join(ranks.withColumnRenamed("id", "src"), "src")
            contrib = msg_hub.unionByName(msg_rest)
        else:
            contrib = edges_frac.join(ranks.withColumnRenamed("id", "src"), "src")
        msgs = contrib.groupBy("dst").agg(F.sum(F.col("rank") * F.col("frac")).alias("msg"))

        if personalized:
            new_rank = F.lit(1.0 - damping) * F.col("tp") + F.lit(damping) * (
                F.coalesce(F.col("msg"), F.lit(0.0))
                + F.lit(sink_mass) * F.col("tp")
            )
            return (
                state.select("id", F.col("rank").alias("old_rank"), "sink", "tp")
                .join(msgs.withColumnRenamed("dst", "id"), "id", "left")
                .select(
                    "id",
                    new_rank.alias("rank"),
                    "sink",
                    (new_rank - F.col("old_rank")).alias("delta"),
                    "tp",
                )
            )
        new_rank = (
            F.lit(uniform_teleport)
            + F.lit(damping)
            * (F.coalesce(F.col("msg"), F.lit(0.0)) + F.lit(sink_mass / n))
        )
        return (
            state.select("id", F.col("rank").alias("old_rank"), "sink")
            .join(msgs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                new_rank.alias("rank"),
                "sink",
                (new_rank - F.col("old_rank")).alias("delta"),
            )
        )

    # The residual AND the next step's sink mass are observed DURING the
    # superstep materialization job (DataFrame.observe → CollectMetrics
    # accumulators): one driver action per superstep instead of two. The
    # same aggregates used to run as a second (cached-input) action; at
    # cluster scale the saved fixed job cost is the dominant term of
    # small-state supersteps.
    resid_expr = (
        F.sqrt(F.sum(F.col("delta") * F.col("delta")))
        if norm == "l2"
        else F.sum(F.abs(F.col("delta")))
    )
    metric_exprs = [
        resid_expr.alias("resid"),
        F.sum(F.when(F.col("sink"), F.col("rank")).otherwise(0.0)).alias("smass"),
    ]

    def metric_of(row: dict) -> float:
        holder["sink_mass"] = float(row["smass"] or 0.0)
        return float(row["resid"] or 0.0)

    try:
        result = Superstep(spark, work_dir, "pagerank").run(
            init,
            step,
            tol=tol,
            max_iter=max_iter,
            resume=resume,
            metric_exprs=metric_exprs,
            metric_of=metric_of,
        )
    finally:
        # release everything persisted above (a long-lived session would
        # otherwise accumulate cached blocks across pagerank() calls)
        for df in (edges_frac, nodes, hubs, hub_edges, rest_edges):
            if df is not None:
                df.unpersist()
    return result.state.select("id", "rank")
