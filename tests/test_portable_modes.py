"""Portable-hash (md5) mode smoke tests for the operators whose gate
oracles replay them in DuckDB: the portable switch must preserve result
VALIDITY and determinism (it changes tie-break/gating draws, so labels
may legitimately differ from the xxhash64 default — exact equality with
the SQL replay is the driver gate's job, tools/check_entry.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _is_partition(labels, graph):
    n = graph.nodes().count()
    assert labels.count() == n
    assert labels.select("id").distinct().count() == n


def test_louvain_portable_valid_and_deterministic(two_triangles_bridge):
    from linkgraph.algs.plm import louvain

    a = louvain(two_triangles_bridge, max_rounds=6, max_levels=2, portable=True)
    b = louvain(two_triangles_bridge, max_rounds=6, max_levels=2, portable=True)
    _is_partition(a, two_triangles_bridge)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # two triangles joined by one bridge edge: portable Louvain must still
    # split them (the canonical min-member labels differ across the bridge)
    labs = {r["id"]: r["label"] for r in a.collect()}
    assert labs[0] == labs[1] == labs[2]
    assert labs[3] == labs[4] == labs[5]
    assert labs[0] != labs[3]


def test_leiden_portable_valid(two_triangles_bridge):
    from linkgraph.algs.leiden import leiden

    lab = leiden(
        two_triangles_bridge,
        max_rounds=4,
        max_levels=1,
        refine_rounds=4,
        portable=True,
    )
    _is_partition(lab, two_triangles_bridge)
    labs = {r["id"]: r["label"] for r in lab.collect()}
    assert labs[0] == labs[1] == labs[2]
    assert labs[3] == labs[4] == labs[5]
    assert labs[0] != labs[3]


def test_ego_splitting_portable_butterfly(spark):
    """Butterfly (two triangles sharing vertex 0): the shared vertex must
    belong to two overlapping communities in portable mode too."""
    from linkgraph.algs.egosplit import ego_splitting
    from linkgraph.graph import Graph

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)],
        "src bigint, dst bigint",
    ).withColumn("weight", F.lit(1.0))
    g = Graph.from_edges(e, directed=False)
    cover = ego_splitting(g, portable=True)
    by_id = {}
    for r in cover.collect():
        by_id.setdefault(r["id"], set()).add(r["label"])
    assert len(by_id[0]) == 2  # hub is split across both triangles
    assert by_id[1] == by_id[2]
    assert by_id[3] == by_id[4]
    assert by_id[1] != by_id[3]


def test_betweenness_portable_sampling_full_sample_exact(karate):
    """With |S| = n the portable sample is the whole vertex set, so the
    sampled estimator must equal exact betweenness regardless of hash."""
    from linkgraph.algs.betweenness import betweenness

    n = karate.nodes().count()
    exact = {r["id"]: r["score"] for r in betweenness(karate).collect()}
    samp = {
        r["id"]: r["score"]
        for r in betweenness(karate, n_samples=n, portable=True).collect()
    }
    for k in exact:
        assert abs(exact[k] - samp[k]) < 1e-9


def test_nibble_fixed_iteration_rounding(two_triangles_bridge):
    """Fixed-iteration + rounded-rank mode finds the seed triangle."""
    from linkgraph.algs.scd import pagerank_nibble

    out = pagerank_nibble(
        two_triangles_bridge, [0], tol=0.0, max_iter=25, round_rank=6
    )
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [0, 1, 2]
