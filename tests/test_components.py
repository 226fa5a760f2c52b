"""Connected components vs union-find oracle; canonical labels exact."""

from conftest import KARATE_EDGES, collect_map
from oracles import components_unionfind

from linkgraph.algs.components import (
    component_sizes,
    connected_components,
    largest_component_nodes,
    weakly_connected_components,
)


def test_cc_two_components(two_components):
    cc = collect_map(connected_components(two_components), "id", "component")
    assert cc == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5}


def test_cc_karate_single_component(karate):
    cc = collect_map(connected_components(karate), "id", "component")
    oracle = components_unionfind(KARATE_EDGES, list(range(34)))
    assert cc == oracle


def test_cc_path(path_5):
    cc = collect_map(connected_components(path_5), "id", "component")
    assert set(cc.values()) == {0}


def test_wcc_directed(directed_dangling):
    cc = collect_map(weakly_connected_components(directed_dangling), "id", "component")
    assert set(cc.values()) == {0}


def test_component_sizes_and_largest(two_components):
    comps = connected_components(two_components)
    sizes = collect_map(component_sizes(comps), "component", "size")
    assert sizes == {0: 3, 5: 3}
    largest = sorted(r.id for r in largest_component_nodes(comps).collect())
    assert largest == [0, 1, 2]  # tie broken by smallest component label


def test_cc_resume(two_components, tmp_path):
    """Kill-and-resume: a run resumed from checkpoints equals a fresh run
    (BASELINE.json:14 resumability contract)."""
    wd = str(tmp_path / "cc_resume")
    first = collect_map(
        connected_components(two_components, work_dir=wd), "id", "component"
    )
    # second invocation resumes from the converged manifest — no recompute
    second = collect_map(
        connected_components(two_components, work_dir=wd, resume=True),
        "id",
        "component",
    )
    assert first == second


def test_cc_star_matches_hash_to_min(two_components, karate):
    """Alternating large-star/small-star (method="star") returns the same
    canonical labels as hash-to-min on every fixture shape."""
    from linkgraph.algs.components import connected_components_star

    for g in (two_components, karate):
        a = collect_map(connected_components(g), "id", "component")
        b = collect_map(connected_components_star(g), "id", "component")
        assert a == b


def test_cc_star_long_path_few_rounds(spark, tmp_path):
    """A 60-vertex path (diameter 59) — the case the star algorithm
    exists for: hash-to-min needs ~59 supersteps, star converges in
    O(log² n) (assert ≤ 12 rounds here) with identical labels."""
    import json
    import os

    from linkgraph.graph import Graph

    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(59)], "src bigint, dst bigint, weight double"
    )
    g = Graph.from_edges(edges)
    wd = str(tmp_path / "star_path")
    cc = collect_map(
        connected_components(g, method="star", work_dir=wd), "id", "component"
    )
    assert cc == {i: 0 for i in range(60)}
    with open(os.path.join(wd, "ccstar", "manifest.jsonl")) as f:
        rounds = sum(
            1 for ln in f if json.loads(ln).get("metric") is not None
        )
    assert rounds <= 12, f"star took {rounds} rounds on a 60-path"


def test_cc_star_random_er_vs_unionfind(spark):
    """A sparse random ER graph (many small components) agrees with the
    union-find oracle under the star method."""
    from linkgraph.algs.components import connected_components_star
    from linkgraph.generators import erdos_renyi
    from linkgraph.graph import Graph

    er = Graph.from_edges(erdos_renyi(spark, n=200, p=0.012, seed=7))
    edges = [(r["src"], r["dst"]) for r in er.edges.select("src", "dst").collect()]
    nodes = [r["id"] for r in er.nodes().collect()]
    a = collect_map(connected_components_star(er), "id", "component")
    assert a == components_unionfind(edges, nodes)
