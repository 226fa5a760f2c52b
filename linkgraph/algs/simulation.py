"""Epidemic simulation — SEIR compartment dynamics over the graph.

Reference parity: simulation/EpidemicSimulationSEIR.cpp: discrete ticks;
Susceptible vertices are Exposed by infectious neighbors (per-contact
probability), Exposed become Infectious after ``t_latent`` ticks,
Infectious Recover after ``t_infectious``. Returns the per-tick compartment
census (the reference's observable) and the final per-vertex state.

Spark shape: one (id, state, timer) table; each tick = one
frontier⋈edges join (only INFECTIOUS rows join — the frontier is the
epidemic's active set, not the full vertex table) + codegen timers.
Coins are counter-based xxhash64(id, src, tick) — deterministic under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph

S, E, I, R = 0, 1, 2, 3


def seir(
    graph: Graph,
    zero: list,
    p_transmit: float = 0.5,
    t_latent: int = 2,
    t_infectious: int = 4,
    ticks: int = 32,
    seed: int = 42,
    portable: bool = False,
) -> tuple[DataFrame, list]:
    """Run SEIR from patient-zero set ``zero``.

    Returns (final_states(id, state), census) where census is a list of
    (tick, n_susceptible, n_exposed, n_infectious, n_recovered) tuples.
    state codes: 0=S 1=E 2=I 3=R. ``portable=True`` draws contact coins
    from the md5 portable hash so the gate's DuckDB oracle can replay the
    identical epidemic tick by tick.
    """
    spark = graph.edges.sparkSession
    sym = graph.symmetric_edges().select("src", "dst").persist()
    z = spark.createDataFrame([(int(v),) for v in zero], "id bigint")
    state = (
        graph.nodes()
        .join(z.withColumn("z", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("z").isNotNull(), F.lit(I)).otherwise(F.lit(S)).alias("state"),
            F.when(F.col("z").isNotNull(), F.lit(t_infectious)).otherwise(F.lit(0)).alias("timer"),
        )
        .localCheckpoint(eager=True)
    )
    census = []

    def snapshot(t: int) -> None:
        row = state.agg(
            F.sum((F.col("state") == S).cast("int")).alias("s"),
            F.sum((F.col("state") == E).cast("int")).alias("e"),
            F.sum((F.col("state") == I).cast("int")).alias("i"),
            F.sum((F.col("state") == R).cast("int")).alias("r"),
        ).collect()[0]
        census.append((t, row["s"], row["e"], row["i"], row["r"]))

    snapshot(0)
    for t in range(1, ticks + 1):
        infectious = state.where(F.col("state") == I).select(F.col("id").alias("src"))
        if portable:
            from linkgraph.portable import phash

            raw = phash(F.col("id"), F.col("src"), F.lit(seed + t))
        else:
            raw = F.xxhash64("id", "src", F.lit(seed + t))
        exposures = (
            infectious.join(sym, "src")
            .select(F.col("dst").alias("id"), "src")
            .withColumn(
                "coin", F.pmod(raw, F.lit(1_000_000_007)) / 1_000_000_007.0
            )
            .where(F.col("coin") < p_transmit)
            .select("id")
            .distinct()
        )
        state = (
            state.join(exposures.withColumn("hit", F.lit(1)), "id", "left")
            .select(
                "id",
                F.when(
                    (F.col("state") == S) & F.col("hit").isNotNull(), F.lit(E)
                )
                .when((F.col("state") == E) & (F.col("timer") <= 1), F.lit(I))
                .when((F.col("state") == I) & (F.col("timer") <= 1), F.lit(R))
                .otherwise(F.col("state"))
                .alias("state"),
                F.when(
                    (F.col("state") == S) & F.col("hit").isNotNull(),
                    F.lit(t_latent),
                )
                .when((F.col("state") == E) & (F.col("timer") <= 1), F.lit(t_infectious))
                .when(F.col("state").isin(E, I), F.col("timer") - 1)
                .otherwise(F.lit(0))
                .alias("timer"),
            )
            .localCheckpoint(eager=True)
        )
        snapshot(t)
        if census[-1][2] == 0 and census[-1][3] == 0:  # no E, no I → stable
            break
    sym.unpersist()
    return state, census
