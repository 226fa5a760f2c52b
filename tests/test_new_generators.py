"""ClusteredRandomGraphGenerator + MocnikGenerator: structure checks
(planted densities, radius law), determinism across parallelism, and
grid-join ≡ brute-force equivalence for Mocnik."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.generators import clustered_random_graph, mocnik


def test_clustered_densities_and_labels(spark):
    n, k, p_in, p_out = 240, 4, 0.25, 0.02
    edges, labels = clustered_random_graph(spark, n, k, p_in, p_out, seed=9)
    lab = {r["id"]: r["label"] for r in labels.collect()}
    assert set(lab) == set(range(n))
    assert set(lab.values()) <= set(range(k))
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    assert all(s < d for s, d in rows)
    intra = sum(1 for s, d in rows if lab[s] == lab[d])
    inter = len(rows) - intra
    from collections import Counter

    sizes = Counter(lab.values())
    intra_pairs = sum(c * (c - 1) // 2 for c in sizes.values())
    inter_pairs = n * (n - 1) // 2 - intra_pairs
    # densities within 3.5 sigma of the planted probabilities
    for got, pairs, p in ((intra, intra_pairs, p_in), (inter, inter_pairs, p_out)):
        mean = pairs * p
        sd = (pairs * p * (1 - p)) ** 0.5
        assert abs(got - mean) < 3.5 * sd + 1, (got, mean, sd)


def test_clustered_determinism_across_parallelism(spark):
    def run(parts):
        e, lab = clustered_random_graph(spark, 120, 3, 0.2, 0.03, seed=4)
        e = e.repartition(parts)
        return (
            sorted((r["src"], r["dst"]) for r in e.collect()),
            sorted((r["id"], r["label"]) for r in lab.collect()),
        )

    assert run(2) == run(16)


def test_clustered_portable_matches_shape(spark):
    e, lab = clustered_random_graph(spark, 100, 3, 0.3, 0.02, seed=1, portable=True)
    assert e.count() > 0 and lab.count() == 100


def test_mocnik_grid_join_equals_brute_force(spark):
    """The 3^dim grid-cell candidate join must produce EXACTLY the
    brute-force within-radius pair set."""
    from linkgraph.generators import _u01  # noqa: F401  (doc anchor)

    n, dim, k, seed = 150, 2, 1.8, 7
    got = sorted(
        (r["src"], r["dst"])
        for r in mocnik(spark, n, dim=dim, k=k, seed=seed).collect()
    )
    radius = float(k) * float(n) ** (-1.0 / dim)
    pts = spark.range(n).select(
        "id",
        *[
            (
                F.shiftrightunsigned(F.xxhash64("id", F.lit(seed), F.lit(j)), 11)
                / F.lit(float(1 << 53))
            ).alias(f"x{j}")
            for j in range(dim)
        ],
    )
    a = pts.select(
        F.col("id").alias("src"), *[F.col(f"x{j}").alias(f"sx{j}") for j in range(dim)]
    )
    b = pts.select(
        F.col("id").alias("dst"), *[F.col(f"x{j}").alias(f"dx{j}") for j in range(dim)]
    )
    d2 = sum(
        (F.col(f"sx{j}") - F.col(f"dx{j}")) * (F.col(f"sx{j}") - F.col(f"dx{j}"))
        for j in range(dim)
    )
    want = sorted(
        (r["src"], r["dst"])
        for r in a.crossJoin(b)
        .where((F.col("src") != F.col("dst")) & (d2 < F.lit(radius * radius)))
        .collect()
    )
    assert got == want and len(got) > 0
    # both directions present (the reference emits a directed graph)
    s = set(got)
    assert all((d, u) in s for u, d in s)


def test_mocnik_dim3_and_determinism(spark):
    e = mocnik(spark, 80, dim=3, k=1.5, seed=3)
    one = sorted((r["src"], r["dst"]) for r in e.repartition(2).collect())
    two = sorted((r["src"], r["dst"]) for r in e.repartition(16).collect())
    assert one == two and len(one) > 0


def test_mocnik_density_scales_with_k(spark):
    lo = mocnik(spark, 120, dim=2, k=1.0, seed=5).count()
    hi = mocnik(spark, 120, dim=2, k=2.0, seed=5).count()
    assert hi > lo  # ~4x expected in 2d; monotonicity is the contract


def _replay_final(events):
    """Edge set after applying all events in ts order (last op per pair)."""
    from pyspark.sql import Window

    w = Window.partitionBy("src", "dst").orderBy(F.desc("ts"))
    last = (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.col("op") == "add_edge")
    )
    return sorted((r["src"], r["dst"]) for r in last.collect())


def test_dynamic_hyperbolic_events_replay(spark):
    from linkgraph.generators import (
        _hyperbolic_pairs,
        dynamic_hyperbolic_events,
        hyperbolic_points,
    )
    import math

    n, steps, avg_k, gamma, omega, seed = 120, 4, 6.0, 2.5, 0.6, 3
    ev = dynamic_hyperbolic_events(
        spark, n, steps, avg_degree=avg_k, gamma=gamma, omega=omega, seed=seed
    ).cache()
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert ops == {"add_edge", "remove_edge"}  # movement creates both
    # replaying the stream reproduces the step-`steps` snapshot exactly
    a = (gamma - 1.0) / 2.0
    R = 2.0 * math.log((2 * a * a * n) / (math.pi * avg_k * (a - 0.5) ** 2))
    pts0 = hyperbolic_points(spark, n, a, R, seed)
    vel = (
        F.shiftrightunsigned(F.xxhash64("id", F.lit(seed), F.lit("w")), 11)
        / F.lit(float(1 << 53))
        - 0.5
    ) * F.lit(omega)
    pts_T = pts0.select(
        "id",
        F.pmod(
            F.col("theta") + F.lit(float(steps)) * vel, F.lit(2 * math.pi)
        ).alias("theta"),
        "r",
    )
    want = sorted(
        (r["src"], r["dst"])
        for r in _hyperbolic_pairs(pts_T, R).select("src", "dst").collect()
    )
    assert _replay_final(ev) == want and len(want) > 0


def test_dynamic_pubweb_events_replay(spark):
    from linkgraph.generators import _pubweb_pairs, dynamic_pubweb_events

    n, steps, rad, v, seed = 150, 4, 0.15, 0.2, 9
    ev = dynamic_pubweb_events(
        spark, n, steps, neighborhood_radius=rad, velocity=v, seed=seed
    ).cache()
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert ops == {"add_edge", "remove_edge"}
    u = lambda k: (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_003))
        / 1_000_003.0
    )
    pts_T = spark.range(n).select(
        "id",
        F.pmod((u(0) + u(1)) / 2.0 + float(steps) * (u(4) - 0.5) * v, F.lit(1.0)).alias("x"),
        F.pmod((u(2) + u(3)) / 2.0 + float(steps) * (u(5) - 0.5) * v, F.lit(1.0)).alias("y"),
    )
    want = sorted(
        (r["src"], r["dst"])
        for r in _pubweb_pairs(pts_T, rad).select("src", "dst").collect()
    )
    assert _replay_final(ev) == want and len(want) > 0


def test_dynamic_forest_fire_structure(spark):
    from linkgraph.generators import dynamic_forest_fire_events

    ev = dynamic_forest_fire_events(spark, steps=60, p=0.35, seed=5)
    rows = sorted(
        (r["ts"], r["src"], r["dst"]) for r in ev.collect()
    )
    # every arriving node burns at least its ambassador
    srcs = {s for _, s, _ in rows}
    assert srcs == set(range(1, 61))
    # edges always point from the arriving node to an EARLIER node
    assert all(d < s for _, s, d in rows)
    # deterministic
    again = sorted(
        (r["ts"], r["src"], r["dst"])
        for r in dynamic_forest_fire_events(spark, steps=60, p=0.35, seed=5).collect()
    )
    assert rows == again
    # burning spreads: densification beyond one edge per node
    assert len(rows) > 90
