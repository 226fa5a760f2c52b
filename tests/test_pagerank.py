"""PageRank vs dense-numpy power iteration — allclose(atol=1e-6) per
BASELINE.json:14."""

import numpy as np
from conftest import KARATE_EDGES, collect_map
from oracles import pagerank_numpy

from linkgraph.algs.pagerank import pagerank


def _check(graph, edges, nodes, directed=False, **kw):
    got = collect_map(pagerank(graph, tol=1e-10, **kw), "id", "rank")
    want = pagerank_numpy(edges, nodes, directed=directed,
                          distribute_sinks=kw.get("distribute_sinks", True))
    ids = sorted(want)
    assert np.allclose([got[i] for i in ids], [want[i] for i in ids], atol=1e-6)
    return got


def test_pagerank_karate(karate):
    got = _check(karate, KARATE_EDGES, list(range(34)))
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation
    # hubs 33 and 0 carry the top ranks
    top2 = sorted(got, key=got.get, reverse=True)[:2]
    assert set(top2) == {33, 0}


def test_pagerank_cycle_uniform(cycle_6):
    got = collect_map(pagerank(cycle_6, tol=1e-12), "id", "rank")
    assert np.allclose(list(got.values()), 1.0 / 6, atol=1e-9)


def test_pagerank_directed_sink(directed_dangling):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = _check(directed_dangling, edges, [0, 1, 2, 3], directed=True)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_no_sink_handling(directed_dangling):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    _check(directed_dangling, edges, [0, 1, 2, 3], directed=True,
           distribute_sinks=False)


def test_pagerank_weighted(weighted_triangle):
    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0)]
    _check(weighted_triangle, edges, [0, 1, 2])


def test_pagerank_star_hub_max(star_8):
    got = collect_map(pagerank(star_8, tol=1e-10), "id", "rank")
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 9)]
    assert np.allclose(leaves, leaves[0], atol=1e-12)


def test_pagerank_hub_split_identical(karate):
    """Explicit heavy-hitter split path must give bit-compatible results
    with the plain path (skew handling is a physical choice only)."""
    plain = collect_map(pagerank(karate, tol=1e-10), "id", "rank")
    split = collect_map(pagerank(karate, tol=1e-10, hub_top_k=3), "id", "rank")
    assert np.allclose(
        [plain[i] for i in sorted(plain)], [split[i] for i in sorted(split)],
        atol=1e-12,
    )


def test_pagerank_resume(karate, tmp_path):
    wd = str(tmp_path / "pr")
    a = collect_map(pagerank(karate, tol=1e-10, work_dir=wd), "id", "rank")
    b = collect_map(
        pagerank(karate, tol=1e-10, work_dir=wd, resume=True), "id", "rank"
    )
    assert a == b


def test_pagerank_warm_start_converges_faster(spark, tmp_path, karate):
    import json
    import os

    from linkgraph.algs.pagerank import pagerank

    cold_dir = str(tmp_path / "cold")
    pr = pagerank(karate, tol=1e-10, max_iter=60, work_dir=cold_dir)
    ranks = pr.localCheckpoint(eager=True)

    def iters(d):
        path = os.path.join(d, "pagerank", "manifest.jsonl")
        return len([1 for _ in open(path)])

    cold_iters = iters(cold_dir)
    warm_dir = str(tmp_path / "warm")
    pr2 = pagerank(
        karate, tol=1e-10, max_iter=60, work_dir=warm_dir, init_ranks=ranks
    )
    got = {r.id: r.rank for r in pr2.collect()}
    want = {r.id: r.rank for r in ranks.collect()}
    assert all(abs(got[i] - want[i]) < 1e-8 for i in got)
    assert iters(warm_dir) < cold_iters  # warm start skips most supersteps
