"""Minibatch graph sampling: fanout contracts, bias, determinism, plans."""

from collections import Counter

from conftest import make_graph

from pyspark.sql import functions as F

from linkgraph.algs.sampling import layered_neighbor_sample, negative_samples


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_layered_sample_contracts(karate):
    seeds = karate.nodes().where(F.col("id") < 5)
    out = layered_neighbor_sample(karate, seeds, fanouts=(3, 2), seed=1)
    rows = out.collect()
    edges = {
        (r.src, r.dst) for r in karate.symmetric_edges().collect()
    }
    assert all((r.src, r.dst) in edges for r in rows)
    per = Counter((r.hop, r.src) for r in rows)
    assert all(c <= 3 for (h, s), c in per.items() if h == 1)
    assert all(c <= 2 for (h, s), c in per.items() if h == 2)
    h1_src = {r.src for r in rows if r.hop == 1}
    assert h1_src <= {0, 1, 2, 3, 4}
    h1_dst = {r.dst for r in rows if r.hop == 1}
    h2_src = {r.src for r in rows if r.hop == 2}
    assert h2_src <= h1_dst  # hop-2 expands exactly the hop-1 frontier
    # deduplicated frontier: each frontier vertex expanded once (<=2 rows)
    assert all(c <= 2 for (h, s), c in per.items() if h == 2)


def test_layered_sample_deterministic_and_partition_invariant(karate):
    seeds = karate.nodes().where(F.col("id") % 7 == 0)
    a = {tuple(r) for r in layered_neighbor_sample(karate, seeds, (4, 3), seed=5).collect()}
    b = {tuple(r) for r in layered_neighbor_sample(karate, seeds.repartition(7), (4, 3), seed=5).collect()}
    assert a == b
    c = {tuple(r) for r in layered_neighbor_sample(karate, seeds, (4, 3), seed=6).collect()}
    assert a != c  # seed actually matters


def test_layered_sample_small_degree_keeps_all(spark):
    g = make_graph(spark, [(0, 1), (0, 2), (3, 4)])
    seeds = spark.createDataFrame([(0,), (3,)], "id bigint")
    rows = layered_neighbor_sample(g, seeds, fanouts=(10,)).collect()
    got = {(r.src, r.dst) for r in rows}
    assert got == {(0, 1), (0, 2), (3, 4)}  # under-fanout keeps everything


def test_negative_samples_caps_and_bias(spark):
    # star: hub 0 with 20 leaves + a 2-path appendix
    g = make_graph(spark, [(0, i) for i in range(1, 21)] + [(21, 22)])
    neg = negative_samples(g, n_per_node=4, power=0.75, seed=3)
    per_src = Counter(r.src for r in neg.collect())
    assert all(c <= 4 for c in per_src.values())
    counts = Counter(r.neg for r in neg.collect())
    hub = counts.get(0, 0)
    leaf_avg = sum(counts.get(i, 0) for i in range(1, 21)) / 20.0
    assert hub > leaf_avg  # degree bias pulls the hub up
    again = sorted((r.src, r.neg) for r in negative_samples(g, 4, 0.75, 3).collect())
    assert sorted((r.src, r.neg) for r in neg.collect()) == again


def test_sampling_plans_no_single_partition(karate):
    seeds = karate.nodes().where(F.col("id") < 3)
    p1 = _plan(layered_neighbor_sample(karate, seeds, (3,), seed=1, materialize=False))
    assert "SinglePartition" not in p1
    assert "Window" in p1  # the per-src rank really is in the plan
    p2 = _plan(negative_samples(karate, n_per_node=2, materialize=False))
    assert "SinglePartition" not in p2
