"""Shared Spark session + canonical fixture graphs (FIXTURES.md §2)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from linkgraph.graph import Graph
from linkgraph.session import get_spark

# Zachary karate club — public domain edge list (34 nodes, 78 edges),
# the reference's canonical fixture (input/karate.graph).
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


@pytest.fixture(scope="session")
def spark(tmp_path_factory) -> SparkSession:
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    s = get_spark(
        cores=4,
        shuffle_partitions=4,
        app_name="linkgraph-tests",
        checkpoint_dir=ckpt,
    )
    yield s


def make_graph(spark, pairs, directed=False, weighted=False):
    rows = [(int(a), int(b), float(w[0]) if w else 1.0) for a, b, *w in pairs]
    df = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    return Graph.from_edges(df, directed=directed, weighted=weighted)


@pytest.fixture(scope="session")
def karate(spark) -> Graph:
    return make_graph(spark, KARATE_EDGES)


@pytest.fixture(scope="session")
def path_5(spark) -> Graph:
    return make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])


@pytest.fixture(scope="session")
def cycle_6(spark) -> Graph:
    return make_graph(spark, [(i, (i + 1) % 6) for i in range(6)])


@pytest.fixture(scope="session")
def star_8(spark) -> Graph:
    return make_graph(spark, [(0, i) for i in range(1, 9)])


@pytest.fixture(scope="session")
def complete_k4(spark) -> Graph:
    return make_graph(spark, [(i, j) for i in range(4) for j in range(i + 1, 4)])


@pytest.fixture(scope="session")
def two_triangles_bridge(spark) -> Graph:
    return make_graph(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )


@pytest.fixture(scope="session")
def two_components(spark) -> Graph:
    # K3 ∪ path_3 (disjoint): {0,1,2} triangle, {5,6,7} path
    return make_graph(spark, [(0, 1), (1, 2), (0, 2), (5, 6), (6, 7)])


@pytest.fixture(scope="session")
def directed_dangling(spark) -> Graph:
    # 0→1, 1→2, 2→0, 2→3; 3 is a sink
    return make_graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=True)


@pytest.fixture(scope="session")
def weighted_triangle(spark) -> Graph:
    return make_graph(
        spark, [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0)], weighted=True
    )


@pytest.fixture(scope="session")
def self_loop(spark) -> Graph:
    # K3 + node 9 with a self-loop
    return make_graph(spark, [(0, 1), (1, 2), (0, 2), (9, 9)])


@pytest.fixture(scope="session")
def isolated_via_selfloop(spark) -> Graph:
    # parquet edge tables cannot express a truly edge-less vertex; the
    # engine's node set is edge-derived, so "isolated" fixtures use the
    # subgraph path instead (see test_graph.py::test_subgraph)
    return make_graph(spark, [(0, 1), (1, 2), (0, 2), (9, 9)])


def collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}
