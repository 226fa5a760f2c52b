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
