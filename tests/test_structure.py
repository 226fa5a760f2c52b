"""IO (edge list / METIS / partition), CSR tables, generators, BFS, SCC,
sparsification, community utilities."""

import numpy as np
from conftest import collect_map, make_graph
from pyspark.sql import functions as F

from linkgraph.algs.bfs import bfs, diameter_lower_bound, eccentricity, sssp
from linkgraph.algs.community import coarsen, one_partition, singleton_partition
from linkgraph.algs.components import strongly_connected_components
from linkgraph.algs.sparsification import (
    local_degree_score,
    local_sparsifier,
    random_edge_score,
)
from linkgraph.generators import erdos_renyi, planted_sbm, rmat
from linkgraph.graph import Graph
from linkgraph.io import read_edge_list, read_metis, read_partition, write_edge_list
from linkgraph.tables import read_block_range, read_csr_blocks, write_csr_blocks


def test_edge_list_roundtrip(spark, karate, tmp_path):
    p = str(tmp_path / "el")
    write_edge_list(karate, p)
    g2 = read_edge_list(spark, p)
    assert g2.num_edges() == 78 and g2.num_nodes() == 34


def test_edge_list_comments_firstnode(spark, tmp_path):
    f = tmp_path / "g.txt"
    f.write_text("# comment\n1 2\n2 3 2.5\n\n")
    g = read_edge_list(spark, str(f), first_node=1)
    rows = {(r.src, r.dst, r.weight) for r in g.edges.collect()}
    assert rows == {(0, 1, 1.0), (1, 2, 2.5)}


def test_metis_reader(spark, tmp_path):
    # triangle + pendant: METIS 1-based adjacency
    f = tmp_path / "m.graph"
    f.write_text("4 4\n2 3\n1 3\n1 2 4\n3\n")
    g = read_metis(spark, str(f))
    assert g.num_nodes() == 4 and g.num_edges() == 4
    deg = collect_map(g.degrees(), "id", "degree")
    assert deg == {0: 2, 1: 2, 2: 3, 3: 1}


def test_partition_reader(spark, tmp_path):
    f = tmp_path / "p.txt"
    f.write_text("0\n0\n1\n1\n")
    labels = read_partition(spark, str(f))
    assert collect_map(labels, "id", "label") == {0: 0, 1: 0, 2: 1, 3: 1}


def test_csr_blocks_roundtrip(spark, karate, tmp_path):
    p = str(tmp_path / "csr")
    write_csr_blocks(karate.edges, p, n_blocks=8, n_salts=2, id_bits=8)
    back = read_csr_blocks(spark, p)
    a = {(r.src, r.dst) for r in karate.edges.collect()}
    b = {(r.src, r.dst) for r in back.collect()}
    assert a == b


def test_csr_block_range_prunes(spark, karate, tmp_path):
    p = str(tmp_path / "csr2")
    write_csr_blocks(karate.edges, p, n_blocks=8, n_salts=2, id_bits=8)
    part = read_block_range(spark, p, 0, 7, n_blocks=8, id_bits=8)
    assert part.count() == karate.edges.where("src <= 7").count()


def test_csr_blocks_negative_hash_ids_default_params(spark, tmp_path):
    """Regression (ADVICE r1): xxhash64-encoded ids are negative about half
    the time; the write-side block formula and the read-side range pruning
    must agree for them, at the DEFAULT parameters (id_bits=62 — the old
    default 63 crashed on a Java long literal overflow)."""
    rows = [
        (-100, 1, 1.0),
        (-3_000_000_000_000_000_000, 2, 1.0),
        (200, 3, 1.0),
        (9_000_000_000_000_000_000, 4, 1.0),
    ]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    p = str(tmp_path / "csr_neg")
    write_csr_blocks(edges, p)  # default n_blocks/n_salts/id_bits
    back = read_csr_blocks(spark, p)
    assert {(r.src, r.dst) for r in back.collect()} == {
        (r[0], r[1]) for r in rows
    }
    # the ADVICE repro: a pure-negative range must return BOTH matching rows
    part = read_block_range(spark, p, -3_000_000_000_000_000_000, -100)
    assert {r.src for r in part.collect()} == {-100, -3_000_000_000_000_000_000}
    # a range crossing 0 wraps the pmod domain → pruning disabled, still correct
    part2 = read_block_range(spark, p, -100, 200)
    assert {r.src for r in part2.collect()} == {-100, 200}


def test_metis_weighted_fmt_codes(spark, tmp_path):
    """Regression (ADVICE r1): fmt=10 (vertex weights, skip) and fmt=11
    (vertex + edge weights) must skip the leading vertex-weight token."""
    # triangle, vertex weights 7/8/9, fmt 10 → edge weights default 1
    f = tmp_path / "vw.graph"
    f.write_text("3 3 10\n7 2 3\n8 1 3\n9 1 2\n")
    g = read_metis(spark, str(f))
    assert g.num_nodes() == 3 and g.num_edges() == 3
    assert {r.weight for r in g.edges.collect()} == {1.0}
    # fmt 11: vertex weight then (neighbor, edge-weight) pairs
    f2 = tmp_path / "vwew.graph"
    f2.write_text("3 3 11\n7 2 5 3 6\n8 1 5 3 4\n9 1 6 2 4\n")
    g2 = read_metis(spark, str(f2))
    assert g2.num_edges() == 3
    w = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert w[(0, 1)] == 5.0 and w[(0, 2)] == 6.0 and w[(1, 2)] == 4.0


def test_rmat_deterministic_and_skewed(spark):
    a = rmat(spark, scale=10, edge_factor=8)
    b = rmat(spark, scale=10, edge_factor=8)
    assert a.count() == 8 << 10
    ha = a.select(F.bit_xor(F.xxhash64("src", "dst")).alias("h")).collect()[0]["h"]
    hb = b.select(F.bit_xor(F.xxhash64("src", "dst")).alias("h")).collect()[0]["h"]
    assert ha == hb
    deg = a.groupBy("src").count()
    mx = deg.agg(F.max("count")).collect()[0][0]
    avg = deg.agg(F.avg("count")).collect()[0][0]
    assert mx > 10 * avg  # hub skew present


def test_erdos_renyi_edge_count(spark):
    g = erdos_renyi(spark, 100, 0.1, seed=1)
    m = g.count()
    assert 300 < m < 700  # E[m] = 495


def test_planted_sbm_recoverable(spark):
    edges, labels = planted_sbm(spark, n=40, blocks=2, p_in=0.5, p_out=0.01)
    from linkgraph.algs.plp import label_propagation

    g = Graph.from_edges(edges)
    got = collect_map(label_propagation(g), "id", "label")
    want = collect_map(labels, "id", "label")
    # allow isolated vertices (absent from edge-derived node set)
    agree = sum(1 for k in got if got[k] == want.get(k, got[k]))
    assert agree >= len(got) - 2


def test_bfs_distances(path_5):
    d = collect_map(bfs(path_5, 0), "id", "dist")
    assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
    assert eccentricity(path_5, 0) == 4.0
    assert diameter_lower_bound(path_5) == 4.0


def test_sssp_weighted(spark):
    g = make_graph(spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)], weighted=True)
    d = collect_map(sssp(g, 0), "id", "dist")
    assert d == {0: 0.0, 1: 1.0, 2: 2.0}


def test_bfs_unreachable_absent(two_components):
    d = collect_map(bfs(two_components, 0), "id", "dist")
    assert set(d) == {0, 1, 2}


def test_scc_directed(directed_dangling):
    scc = collect_map(strongly_connected_components(directed_dangling), "id", "component")
    assert scc[0] == scc[1] == scc[2] == 0
    assert scc[3] == 3


def test_scc_two_cycles(spark):
    g = make_graph(spark, [(0, 1), (1, 0), (2, 3), (3, 4), (4, 2), (1, 2)], directed=True)
    scc = collect_map(strongly_connected_components(g), "id", "component")
    assert scc[0] == scc[1] and scc[2] == scc[3] == scc[4]
    assert scc[0] != scc[2]


def test_local_degree_score_and_sparsifier(star_8):
    scores = local_degree_score(star_8)
    hub_rows = scores.where(F.col("src") == 0).collect()
    assert len(hub_rows) == 8
    sp = local_sparsifier(star_8, alpha=0.5)
    # every leaf keeps its only edge (score 1.0 ≥ 0.5) → graph intact
    assert sp.num_edges() == 8


def test_random_edge_score_stable(karate):
    a = {(r.src, r.dst): r.score for r in random_edge_score(karate).collect()}
    b = {(r.src, r.dst): r.score for r in random_edge_score(karate).collect()}
    assert a == b and all(0 <= v < 1 for v in a.values())


def test_coarsen_two_triangles(two_triangles_bridge):
    from linkgraph.algs.plp import label_propagation

    labels = label_propagation(two_triangles_bridge)
    cg = coarsen(two_triangles_bridge, labels)
    rows = {(r.src, r.dst): r.weight for r in cg.edges.collect()}
    # two self-loops (3 intra edges each) + one bridge
    assert rows[(0, 0)] == 3.0 and rows[(3, 3)] == 3.0 and rows[(0, 3)] == 1.0


def test_partition_generators(karate):
    assert singleton_partition(karate).select("label").distinct().count() == 34
    assert one_partition(karate).select("label").distinct().count() == 1
