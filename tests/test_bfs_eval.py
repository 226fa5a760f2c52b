"""Multi-source BFS, sampled harmonic closeness, link-pred eval harness."""

from conftest import collect_map, make_graph
from pyspark.sql import functions as F

from linkgraph.algs.bfs import harmonic_closeness_sampled, multi_source_bfs
from linkgraph.algs.linkpred import (
    common_neighbors,
    precision_at_k,
    random_link_sample,
    roc_auc,
)


def test_multi_source_bfs(path_5):
    d = {(r.source, r.id): r.dist for r in multi_source_bfs(path_5, [0, 4]).collect()}
    assert d[(0, 4)] == 4.0 and d[(4, 0)] == 4.0 and d[(0, 2)] == 2.0 and d[(4, 2)] == 2.0


def test_harmonic_closeness_exact_when_full(star_8):
    # n_samples ≥ n → exact harmonic closeness
    hc = collect_map(harmonic_closeness_sampled(star_8, n_samples=16), "id", "score")
    # hub: Σ 1/1 over 8 leaves = 8; scale (n-1)/n_sources = 8/9 → 8·8/9
    assert abs(hc[0] - 8.0 * 8 / 9) < 1e-9
    # leaf: 1 + 7·(1/2) = 4.5, scaled by 8/9
    assert abs(hc[1] - 4.5 * 8 / 9) < 1e-9


def test_roc_auc_perfect_and_random(spark, complete_k4, path_5):
    cn = common_neighbors(path_5)  # pairs (0,2),(1,3),(2,4) score 1.0
    pos = spark.createDataFrame([(0, 2), (1, 3), (2, 4)], "u bigint, v bigint")
    assert roc_auc(cn, pos) == 0.5  # all scores tied → 0.5 by construction
    scored = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.2), (0, 4, 0.1)],
        "u bigint, v bigint, score double",
    )
    pos2 = spark.createDataFrame([(0, 1), (0, 2)], "u bigint, v bigint")
    assert roc_auc(scored, pos2) == 1.0
    neg_first = spark.createDataFrame([(0, 3), (0, 4)], "u bigint, v bigint")
    assert roc_auc(scored, neg_first) == 0.0


def test_precision_at_k(spark):
    scored = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.2)], "u bigint, v bigint, score double"
    )
    pos = spark.createDataFrame([(0, 1)], "u bigint, v bigint")
    assert precision_at_k(scored, pos, 1) == 1.0
    assert precision_at_k(scored, pos, 2) == 0.5


def test_random_link_sample_partition(karate):
    train, test = random_link_sample(karate, 0.25)
    assert train.count() + test.count() == 78
    t2, s2 = random_link_sample(karate, 0.25)
    assert t2.count() == train.count()  # deterministic
    # disjoint
    assert train.join(test, ["src", "dst"], "left_semi").count() == 0
