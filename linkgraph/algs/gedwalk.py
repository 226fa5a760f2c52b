"""GedWalk group centrality — greedy walk-based group selection.

Reference parity: REF⚠ centrality/GedWalk.{hpp,cpp} (Angriman et al.,
ALENEX'20 "Group Centrality Maximization via Influence Maximization"):
GED-Walk score of a group S is φ(S) = Σ_ℓ α^ℓ · w_ℓ(S), where w_ℓ(S)
counts walks of length ℓ that touch S, and the group is grown greedily by
(approximate) marginal gain. The reference evaluates gains lazily with
upper/lower bounds tightened per candidate (ε-approximate greedy).

The distributed formulation here is the deterministic fixed-truncation
analog:

- walk counts are the canonical iterated relational joins — in-counts
  i_a(v) = Σ_{u→v} i_{a-1}(u) and out-counts o_b(v) = Σ_{v→w} o_{b-1}(w)
  over the residual graph H = G∖S, truncated at ``max_len`` (α^ℓ decays
  geometrically; the reference's bounds truncate adaptively for the same
  reason);
- the greedy pick per round is argmax over v of the closed-form
  through-walk score Σ_{a+b≤L-1} α^{a+b+1}·i_a(v)·o_b(v) — an upper bound
  on the exact marginal (walks touching v more than once are counted per
  touch), the same quantity the reference's upper-bound oracle starts
  from; ties break by vertex id;
- after each pick the EXACT truncated group score
  φ_L(S) = Σ_{ℓ≤L} α^ℓ · (W_ℓ(G) − W_ℓ(G∖S)) is reported (walks touching
  S = all walks minus walks avoiding S — no bound involved).

All counts are integer-valued doubles (exact under summation reordering
up to 2^53), every float combination is a fixed-order row expression, and
no randomness is involved, so a fixed-α run replays exactly in SQL
(gate_sql.gedwalk_sql — the doc_gedwalk gate entry).

Scale: per greedy round, 2·L join+agg supersteps over the residual edge
table plus one L-step total-walk chain — O(k·L) shuffles total, each
keyed on vertex id; the group list S lives on the driver (k rows) and is
applied as an isin filter, never a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _walk_totals(edges: DataFrame, nodes: DataFrame, max_len: int) -> list[float]:
    """[W_1 .. W_max_len] — total walk counts by length; W_ℓ = Σ_v o_ℓ(v)."""
    cur = nodes.select("id", F.lit(1.0).alias("cnt"))
    totals: list[float] = []
    for _ in range(max_len):
        cur = (
            edges.join(cur.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        totals.append(cur.agg(F.sum("cnt")).collect()[0][0] or 0.0)
    return totals


def _count_chain(
    edges: DataFrame, nodes: DataFrame, max_len: int, incoming: bool
) -> list[DataFrame]:
    """[c_0 .. c_{max_len-1}] walk-count tables (id, cnt); incoming=True
    counts walks ending at id, else walks starting at id."""
    out = [nodes.select("id", F.lit(1.0).alias("cnt"))]
    key, grp = ("src", "dst") if incoming else ("dst", "src")
    for _ in range(max_len - 1):
        nxt = (
            edges.join(out[-1].withColumnRenamed("id", key), key)
            .groupBy(F.col(grp).alias("id"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        out.append(nxt)
    return out


def ged_walk(
    graph: Graph,
    k: int = 3,
    alpha: float | None = None,
    max_len: int = 8,
    round_to: int | None = None,
) -> DataFrame:
    """(ord, id, gain, ged_score) — the greedy GED-Walk group: pick order,
    member id, its through-walk selection score, and the exact truncated
    GED score φ_L of the group prefix. ``alpha=None`` uses 1/(1+maxdeg)
    (guarantees Σ α^ℓ W_ℓ converges, the reference's spectral-bound
    default); ``round_to`` rounds gains before the argmax (portable gate
    mode — keeps the pick order replayable across engines)."""
    spark = graph.edges.sparkSession
    base = (
        (graph.edges if graph.directed else graph.symmetric_edges())
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    nodes = graph.nodes().select("id").persist()
    if alpha is None:
        maxdeg = (
            base.groupBy("src").count().agg(F.max("count")).collect()[0][0] or 0
        )
        alpha = 1.0 / (1.0 + float(maxdeg))
    wg = _walk_totals(base, nodes, max_len)
    group: list[int] = []
    rows = []
    for step in range(int(k)):
        h = base
        hn = nodes
        if group:
            h = base.where(~F.col("src").isin(group) & ~F.col("dst").isin(group))
            hn = nodes.where(~F.col("id").isin(group))
        ins = _count_chain(h, hn, max_len, incoming=True)
        outs = _count_chain(h, hn, max_len, incoming=False)
        wide = hn
        for a, df in enumerate(ins):
            wide = wide.join(
                df.withColumnRenamed("cnt", f"ia{a}"), "id", "left"
            )
        for b, df in enumerate(outs):
            wide = wide.join(
                df.withColumnRenamed("cnt", f"ob{b}"), "id", "left"
            )
        gain = F.lit(0.0)
        for a in range(max_len):
            for b in range(max_len - a):
                gain = gain + F.lit(alpha ** (a + b + 1)) * F.coalesce(
                    F.col(f"ia{a}"), F.lit(0.0)
                ) * F.coalesce(F.col(f"ob{b}"), F.lit(0.0))
        if round_to is not None:
            gain = F.round(gain, round_to)
        pick = (
            wide.select("id", gain.alias("gain"))
            .orderBy(F.desc("gain"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not pick:
            break
        group.append(pick[0]["id"])
        h2 = base.where(~F.col("src").isin(group) & ~F.col("dst").isin(group))
        hn2 = nodes.where(~F.col("id").isin(group))
        wh = _walk_totals(h2, hn2, max_len)
        phi = 0.0
        for length in range(1, max_len + 1):
            phi = phi + alpha**length * (wg[length - 1] - wh[length - 1])
        rows.append((step, pick[0]["id"], float(pick[0]["gain"]), float(phi)))
    base.unpersist()
    nodes.unpersist()
    return spark.createDataFrame(
        rows, "ord int, id bigint, gain double, ged_score double"
    )
