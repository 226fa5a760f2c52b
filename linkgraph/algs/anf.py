"""ANF — approximate neighborhood function via Flajolet–Martin sketches.

Reference parity: distance/{EffectiveDiameterApproximation, HopPlot
Approximation, NeighborhoodFunctionApproximation}.cpp — per-vertex FM
bitmask sketches, iterated h hops (Palmer/Gibbons/Faloutsos ANF, KDD'02).

Spark formulation — entirely JVM bitwise expressions, no UDFs:
- state table (id, r, bits): R independent 64-bit FM registers per vertex;
  init sets bit p with P(p) = 2^-(p+1) via trailing-zeros of xxhash64(id,r);
- superstep: bits(v) |= OR over neighbors' bits — one join + one
  ``bit_or`` hash-agg on (id, r); state is n·R rows (R=8 default);
- estimator: FM count = 2^b / 0.77351 where b = index of lowest UNSET
  bit, averaged over registers; lowest-zero-bit extraction is the
  identity ((bits+1) & ~bits) followed by log2 via bit_count(x−1).

Outputs: hop plot N(h), effective diameter (smallest h covering q·N(∞)),
per-vertex neighborhood sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _fm_init(spark, nodes: DataFrame, registers: int, portable: bool = False) -> DataFrame:
    regs = spark.range(registers).withColumnRenamed("id", "r")
    if portable:
        # md5-based hash computable identically in DuckDB → the FM sketch
        # pipeline (bit_or supersteps + estimator) unrolls to an exact SQL
        # oracle; xxhash64 stays the production default (codegen, ~10× faster)
        from linkgraph.portable import phash

        h = phash(F.col("id"), F.col("r"))
    else:
        h = F.xxhash64("id", "r")
    # trailing zeros of the hash, capped at 62: bit_count(((h)&(-h))-1)
    low = h.bitwiseAND(-h)
    tz = F.least(F.bit_count(low - 1), F.lit(62))
    # F.shiftleft only takes a literal shift; column shifts go through expr
    return (
        nodes.crossJoin(regs)
        .withColumn("tzc", tz.cast("int"))
        .select("id", "r", F.expr("shiftleft(CAST(1 AS BIGINT), tzc)").alias("bits"))
    )


def _fm_estimate(state: DataFrame, phi: float = 0.77351) -> DataFrame:
    """(id, est) — FM cardinality estimate from the R registers."""
    # F.bitwise_not, NOT ~ — the ~ operator is logical NOT on Columns
    lowest_zero = (F.col("bits") + 1).bitwiseAND(F.bitwise_not(F.col("bits")))
    b = F.bit_count(lowest_zero - 1).cast("double")
    return (
        state.groupBy("id")
        .agg(F.avg(b).alias("bbar"))
        .select("id", (F.pow(F.lit(2.0), F.col("bbar")) / F.lit(phi)).alias("est"))
    )


def neighborhood_function(
    graph: Graph, max_h: int = 32, registers: int = 8, tol_ratio: float = 1.0001
) -> list:
    """[(h, N(h))] — estimated #pairs within distance ≤ h, h = 0..H;
    stops early when the sketch union saturates (N stops growing)."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().select("src", "dst").persist()
    nodes = graph.nodes()
    state = _fm_init(spark, nodes, registers).localCheckpoint(eager=True)
    out = []
    n0 = _fm_estimate(state).agg(F.sum("est")).collect()[0][0]
    out.append((0, float(n0)))
    for h in range(1, max_h + 1):
        nbr = (
            state.join(sym, state.id == sym.src)
            .select(F.col("dst").alias("id"), "r", "bits")
        )
        new = (
            state.select("id", "r", "bits")
            .unionByName(nbr)
            .groupBy("id", "r")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint(eager=True)
        )
        state = new
        nf = float(_fm_estimate(state).agg(F.sum("est")).collect()[0][0])
        out.append((h, nf))
        if nf <= out[-2][1] * tol_ratio:
            break
    sym.unpersist()
    return out


def neighborhood_function_heuristic(
    graph: Graph, n_samples: int = 8, max_h: int = 32, seed: int = 42
) -> list:
    """[(h, N̂(h))] — sampled-BFS neighborhood function (distance/
    NeighborhoodFunctionHeuristic.cpp): exact hop BFS from a hash-chosen
    vertex sample, per-h reachable counts (self included, matching
    :func:`neighborhood_function`'s convention) scaled by n/s. With
    ``n_samples >= n`` this IS the exact neighborhood function — the
    estimator's sanity anchor.

    Shape: one multi-source BFS (sources ride as a column — one
    superstep loop for the whole sample) + one (dist) histogram agg;
    cost O(sample × reachable), the knob the reference also exposes."""
    from linkgraph.algs.bfs import multi_source_bfs

    nodes = graph.nodes()
    n = nodes.count()
    if n == 0:
        return [(0, 0.0)]
    srcs = [
        int(r["id"])
        for r in nodes.orderBy(F.xxhash64("id", F.lit(seed)), F.asc("id"))
        .limit(min(int(n_samples), n))
        .collect()
    ]
    scale = n / len(srcs)
    hist = {
        int(r["dist"]): r["c"]
        for r in multi_source_bfs(graph, srcs, max_iter=max_h)
        .groupBy("dist")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    out, cum = [], 0
    for h in range(0, (max(hist) + 1) if hist else 1):
        cum += hist.get(h, 0)
        out.append((h, float(cum) * scale))
    return out


def hop_plot(graph: Graph, max_h: int = 32, registers: int = 8) -> list:
    """[(h, P(h))] — hop plot (distance/HopPlotApproximation.cpp): the
    fraction of reachable pairs within distance ≤ h, normalized by the
    saturated neighborhood function N(H_max). Same sketch supersteps as
    ``neighborhood_function``; one extra pass of arithmetic."""
    nf = neighborhood_function(graph, max_h=max_h, registers=registers)
    total = nf[-1][1]
    if total <= 0:
        return [(h, 0.0) for h, _ in nf]
    return [(h, v / total) for h, v in nf]


def effective_diameter(
    graph: Graph, ratio: float = 0.9, max_h: int = 32, registers: int = 8
) -> float:
    """Smallest h (with linear interpolation, as the reference does) such
    that N(h) ≥ ratio·N(H_max)."""
    nf = neighborhood_function(graph, max_h=max_h, registers=registers)
    total = nf[-1][1]
    target = ratio * total
    for (h0, v0), (h1, v1) in zip(nf, nf[1:]):
        if v1 >= target:
            if v1 == v0:
                return float(h1)
            return h0 + (target - v0) / (v1 - v0)
    return float(nf[-1][0])


def per_vertex_neighborhood_size(
    graph: Graph, h: int, registers: int = 8, portable: bool = False
) -> DataFrame:
    """(id, est) — estimated |{u : dist(id,u) ≤ h}| per vertex."""
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().select("src", "dst").persist()
    state = _fm_init(spark, graph.nodes(), registers, portable).localCheckpoint(eager=True)
    for _ in range(h):
        nbr = (
            state.join(sym, state.id == sym.src)
            .select(F.col("dst").alias("id"), "r", "bits")
        )
        state = (
            state.select("id", "r", "bits")
            .unionByName(nbr)
            .groupBy("id", "r")
            .agg(F.bit_or("bits").alias("bits"))
            .localCheckpoint(eager=True)
        )
    sym.unpersist()
    return _fm_estimate(state)
