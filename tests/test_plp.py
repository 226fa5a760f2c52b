"""PLP on LP-stable fixtures + modularity/NMI oracles (SURVEY §5.2 strategy)."""

from conftest import KARATE_EDGES, collect_map, make_graph
from oracles import modularity_numpy

from linkgraph.algs.community import adjusted_rand, modularity, nmi
from linkgraph.algs.plp import canonicalize_labels, label_propagation


def test_plp_two_triangles_bridge(two_triangles_bridge):
    labels = collect_map(label_propagation(two_triangles_bridge), "id", "label")
    # LP-stable fixture: the two triangles must be separate communities
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    # canonical form: min member id
    assert labels[0] == 0 and labels[3] == 3


def test_plp_modularity_positive(two_triangles_bridge):
    labels_df = label_propagation(two_triangles_bridge)
    labels = collect_map(labels_df, "id", "label")
    q_spark = modularity(two_triangles_bridge, labels_df)
    q_np = modularity_numpy(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)], labels
    )
    assert abs(q_spark - q_np) < 1e-9
    assert q_spark > 0.3


def test_plp_sbm_planted(spark):
    """Planted 2-block SBM (deterministic construction): two K8 cliques
    joined by one bridge edge — PLP must recover the planted partition."""
    block_a = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    block_b = [(i, j) for i in range(10, 18) for j in range(i + 1, 18)]
    g = make_graph(spark, block_a + block_b + [(7, 10)])
    labels_df = label_propagation(g)
    labels = collect_map(labels_df, "id", "label")
    assert len({labels[i] for i in range(8)}) == 1
    assert len({labels[i] for i in range(10, 18)}) == 1
    assert labels[0] != labels[10]


def test_plp_karate_converges(karate):
    labels_df = label_propagation(karate, max_iter=50)
    q = modularity(karate, labels_df)
    # async reference PLP typically lands ~0.35-0.42 on karate; our
    # synchronous variant must find genuine community structure too
    assert q > 0.1
    n_comms = labels_df.select("label").distinct().count()
    assert 1 < n_comms < 34


def test_plp_parallelism_invariance(spark, two_triangles_bridge):
    """Same labels bitwise under different shuffle partitioning — the
    sandbox proxy for N-vs-4N executor identity."""
    a = collect_map(label_propagation(two_triangles_bridge), "id", "label")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = collect_map(label_propagation(two_triangles_bridge), "id", "label")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_canonicalize_labels(spark):
    df = spark.createDataFrame(
        [(0, 77), (1, 77), (2, 99), (3, 99)], "id bigint, label bigint"
    )
    out = collect_map(canonicalize_labels(df), "id", "label")
    assert out == {0: 0, 1: 0, 2: 2, 3: 2}


def test_nmi_ari_identical_partitions(spark):
    a = spark.createDataFrame([(i, i // 3) for i in range(12)], "id bigint, label bigint")
    assert abs(nmi(a, a) - 1.0) < 1e-9
    assert abs(adjusted_rand(a, a) - 1.0) < 1e-9


def test_nmi_ari_relabeling_invariant(spark):
    a = spark.createDataFrame([(i, i // 3) for i in range(12)], "id bigint, label bigint")
    b = spark.createDataFrame([(i, 100 + i // 3) for i in range(12)], "id bigint, label bigint")
    assert abs(nmi(a, b) - 1.0) < 1e-9
    assert abs(adjusted_rand(a, b) - 1.0) < 1e-9


def test_modularity_one_partition_zero(karate):
    from linkgraph.algs.community import one_partition

    q = modularity(karate, one_partition(karate))
    assert abs(q) < 1e-9


def test_plp_active_frontier_equivalence(spark, karate):
    # The activeNodes restriction (community/PLP.cpp) must be label-exact:
    # frac=1.0 restricts from round 2 on, frac=0.0 never restricts.
    import random

    full = collect_map(
        label_propagation(karate, active_frontier_frac=0.0), "id", "label"
    )
    restricted = collect_map(
        label_propagation(
            karate, active_frontier_frac=1.0, min_frontier_edges=0
        ),
        "id",
        "label",
    )
    assert full == restricted

    rng = random.Random(3)
    pairs = set()
    for u in range(60):
        for _ in range(2):
            v = rng.randrange(60)
            if u != v:
                pairs.add((min(u, v), max(u, v)))
    g = make_graph(spark, sorted(pairs))
    a = collect_map(label_propagation(g, active_frontier_frac=0.0), "id", "label")
    b = collect_map(
        label_propagation(g, active_frontier_frac=1.0, min_frontier_edges=0),
        "id",
        "label",
    )
    assert a == b


def test_plp_update_threshold_default(two_triangles_bridge):
    # None -> reference theta = n/1e5, which truncates to 0 below 100k
    # nodes: identical labels to the explicit update_threshold=0 run.
    base = collect_map(
        label_propagation(two_triangles_bridge, update_threshold=0), "id", "label"
    )
    dflt = collect_map(label_propagation(two_triangles_bridge), "id", "label")
    assert base == dflt
