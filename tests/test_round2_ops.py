"""Round-2 operators: edge scores, extra link-prediction indices, KFold,
partition quality metrics, suitor matching, ego splitting, IO readers,
dynamic CC removals, pruned streaming merge, banded LSH, approx cc."""

import os

import networkx as nx
import numpy as np
import pytest
from conftest import KARATE_EDGES, collect_map, make_graph

from linkgraph.graph import Graph


# --------------------------------------------------------------------------
# Edge scores
# --------------------------------------------------------------------------

def test_prefix_jaccard_triangle_plus_tail(spark):
    from linkgraph.algs.edgescores import prefix_jaccard_score

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    s = {(r.src, r.dst): r.score for r in prefix_jaccard_score(g, k=5).collect()}
    # prefixes (k≥deg): N(0)={1,2}, N(1)={0,2}, N(2)={0,1,3}, N(3)={2}
    assert s[(0, 1)] == pytest.approx(1 / 3)  # {1,2}∩{0,2}={2}, union {0,1,2}
    assert s[(2, 3)] == pytest.approx(0.0)  # {0,1,3} vs {2} disjoint


def test_simmelian_overlap_two_cliques(spark):
    from linkgraph.algs.edgescores import simmelian_overlap_score

    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pairs += [(3, 4)]  # pendant edge: no triangles
    g = make_graph(spark, pairs)
    s = {(r.src, r.dst): r.score for r in simmelian_overlap_score(g, max_rank=3).collect()}
    assert s[(3, 4)] == 0.0
    assert s[(0, 1)] > 0.0  # strong clique ties share top neighbors


def test_normalize_and_blend(spark):
    from linkgraph.algs.edgescores import blend_scores, normalize_scores

    rows = [(0, 1, 2.0), (1, 2, 4.0), (2, 3, 6.0)]
    df = spark.createDataFrame(rows, "src bigint, dst bigint, score double")
    n = {(r.src, r.dst): r.score for r in normalize_scores(df).collect()}
    assert n[(0, 1)] == 0.0 and n[(2, 3)] == 1.0 and n[(1, 2)] == pytest.approx(0.5)
    b = blend_scores(df, df, alpha=0.25)
    assert {r.score for r in b.collect()} == {2.0, 4.0, 6.0}


def test_geometric_mean_score_symmetric(spark):
    from linkgraph.algs.edgescores import geometric_mean_score

    rows = [(0, 1, 1.0), (1, 2, 1.0)]
    df = spark.createDataFrame(rows, "src bigint, dst bigint, score double")
    # S(0)=1, S(1)=2, S(2)=1 → score(0,1) = 1/sqrt(2)
    g = {(r.src, r.dst): r.score for r in geometric_mean_score(df).collect()}
    assert g[(0, 1)] == pytest.approx(1 / np.sqrt(2))


# --------------------------------------------------------------------------
# Link prediction additions
# --------------------------------------------------------------------------

def test_total_and_cosine_neighbors(spark):
    from linkgraph.algs.linkpred import neighborhood_distance, total_neighbors

    # square 0-1-2-3-0: (0,2) have 2 common nbrs, deg all 2
    g = make_graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    tn = {(r.u, r.v): r.score for r in total_neighbors(g).collect()}
    nd = {(r.u, r.v): r.score for r in neighborhood_distance(g).collect()}
    assert tn[(0, 2)] == pytest.approx(2.0)  # 2+2-2
    assert nd[(0, 2)] == pytest.approx(1.0)  # 2/sqrt(4)


def test_same_community_and_degree_indices(spark):
    from linkgraph.algs.linkpred import same_community, u_degree_index, v_degree_index

    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 9)], "id bigint, label bigint"
    )
    pairs = spark.createDataFrame([(0, 2), (0, 3)], "u bigint, v bigint")
    sc = {(r.u, r.v): r.score for r in same_community(pairs, labels).collect()}
    assert sc[(0, 2)] == 1.0 and sc[(0, 3)] == 0.0
    ud = {(r.u, r.v): r.score for r in u_degree_index(g).collect()}
    vd = {(r.u, r.v): r.score for r in v_degree_index(g).collect()}
    assert ud[(0, 1)] == 2.0 and vd[(0, 1)] == 2.0
    assert vd[(1, 3)] == 1.0 if (1, 3) in vd else True


def test_katz_index_path_counts(spark):
    from linkgraph.algs.linkpred import katz_index

    # path 0-1-2: paths(0,2) length2 = 1; (0,1): length1=1, length3: 0-1-0-1? uses
    # walks, so A^3[0,1] = 2 on the path graph
    g = make_graph(spark, [(0, 1), (1, 2)])
    beta = 0.1
    got = {(r.u, r.v): r.score for r in katz_index(g, beta=beta, max_length=3).collect()}
    A = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float)
    want = beta * A + beta**2 * (A @ A) + beta**3 * (A @ A @ A)
    for (u, v), s in got.items():
        assert s == pytest.approx(want[u, v], abs=1e-12)


def test_thresholder_and_sorter(spark):
    from linkgraph.algs.linkpred import link_thresholder, sort_predictions

    df = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.1), (0, 2, 0.5)], "u bigint, v bigint, score double"
    )
    assert link_thresholder(df, 0.5).count() == 2
    top = sort_predictions(df).collect()
    assert (top[0].u, top[0].v) == (0, 1) and (top[-1].u, top[-1].v) == (1, 2)


def test_kfold_cross_validation_cliques(spark):
    from linkgraph.algs.linkpred import common_neighbors, kfold_cross_validation

    # two 6-cliques + bridge: held-out intra-clique edges keep many common
    # neighbors in every training fold → CN must rank them clearly above
    # the cross-clique non-edges
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(i, j) for i in range(6, 12) for j in range(i + 1, 12)]
    pairs += [(0, 6)]
    g = make_graph(spark, pairs)
    aucs = kfold_cross_validation(g, common_neighbors, k=3)
    assert len(aucs) == 3
    assert all(0.0 <= a <= 1.0 for a in aucs)
    # deterministic hash split; a fold whose scored candidate set has no
    # negatives reports the neutral 0.5 — the informative folds must score
    assert max(aucs) >= 0.85
    assert sum(aucs) / 3 >= 0.65


# --------------------------------------------------------------------------
# Partition quality metrics
# --------------------------------------------------------------------------

@pytest.fixture()
def two_triangles(spark):
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)], "id bigint, label bigint"
    )
    return g, labels


def test_quality_metrics_two_triangles(spark, two_triangles):
    from linkgraph.algs.community import (
        hub_dominance,
        intrapartition_density,
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
        stable_partition_nodes,
    )

    g, labels = two_triangles
    hd = collect_map(hub_dominance(g, labels), "label", "hub_dominance")
    assert hd[0] == pytest.approx(1.0)  # triangle: every vertex hits size-1
    den = collect_map(intrapartition_density(g, labels), "label", "density")
    assert den[0] == pytest.approx(1.0) and den[3] == pytest.approx(1.0)
    cond = collect_map(
        isolated_interpartition_conductance(g, labels), "label", "conductance"
    )
    # cut=1, vol(C)=7 (6 intra ends + 1 cut end), 2W=14 → 1/7
    assert cond[0] == pytest.approx(1 / 7)
    exp = collect_map(
        isolated_interpartition_expansion(g, labels), "label", "expansion"
    )
    assert exp[0] == pytest.approx(1 / 3)
    st = collect_map(stable_partition_nodes(g, labels), "id", "stable")
    assert st[0] and st[1] and st[4]
    assert st[2] and st[3]  # 2/3 of weighted degree inside (>= half)


def test_partition_fragmentation(spark):
    from linkgraph.algs.community import partition_fragmentation

    # community {0,1,2,3} where 3 is disconnected from 0-1-2
    g = make_graph(spark, [(0, 1), (1, 2), (3, 4)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 9)], "id bigint, label bigint"
    )
    fr = collect_map(partition_fragmentation(g, labels), "label", "fragmentation")
    assert fr[0] == pytest.approx(1 - 3 / 4)
    assert fr[9] == pytest.approx(0.0)


# --------------------------------------------------------------------------
# Suitor matching
# --------------------------------------------------------------------------

def test_suitor_matching_validity_and_quality(spark, karate):
    from linkgraph.algs.matching import suitor_matching

    m = suitor_matching(karate).collect()
    seen = {}
    for r in m:
        assert r.u < r.v
        assert r.u not in seen and r.v not in seen
        seen[r.u] = True
        seen[r.v] = True
    got_w = sum(r.weight for r in m)
    nxg = nx.Graph()
    for a, b in KARATE_EDGES:
        nxg.add_edge(a, b, weight=1.0)
    opt = nx.max_weight_matching(nxg)
    opt_w = float(len(opt))
    assert got_w >= 0.5 * opt_w


def test_suitor_matching_weighted_preference(spark):
    from linkgraph.algs.matching import suitor_matching

    g = make_graph(spark, [(0, 1, 1.0), (1, 2, 10.0), (2, 3, 1.0)], weighted=True)
    m = {(r.u, r.v) for r in suitor_matching(g).collect()}
    assert (1, 2) in m


# --------------------------------------------------------------------------
# EgoSplitting (Cover)
# --------------------------------------------------------------------------

def test_ego_splitting_butterfly(spark):
    from linkgraph.algs.egosplit import ego_splitting

    # two triangles sharing vertex 2 — the canonical overlapping case
    g = make_graph(spark, [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)])
    cover = ego_splitting(g).collect()
    per_node = {}
    for r in cover:
        per_node.setdefault(r.id, set()).add(r.label)
    assert len(per_node[2]) == 2  # the shared vertex is in BOTH communities
    assert len(per_node[0]) == 1 and len(per_node[3]) == 1


# --------------------------------------------------------------------------
# IO readers
# --------------------------------------------------------------------------

def test_snap_konect_readers(spark, tmp_path):
    from linkgraph.io import read_konect, read_snap

    f = tmp_path / "snap.txt"
    f.write_text("# Directed graph\n# FromNodeId ToNodeId\n0\t1\n1\t2\n")
    g = read_snap(spark, str(f), directed=True)
    assert g.num_edges() == 2 and g.directed
    f2 = tmp_path / "konect.tsv"
    f2.write_text("% sym unweighted\n1 2\n2 3\n")
    g2 = read_konect(spark, str(f2))
    assert not g2.directed
    assert {(r.src, r.dst) for r in g2.edges.collect()} == {(0, 1), (1, 2)}


def test_gml_roundtrip(spark, tmp_path):
    from linkgraph.io import read_gml, write_gml

    g = make_graph(spark, [(0, 1, 2.5), (1, 2, 1.0)], weighted=True)
    p = str(tmp_path / "g.gml")
    write_gml(g, p)
    g2 = read_gml(spark, p)
    a = {(r.src, r.dst, r.weight) for r in g.edges.collect()}
    b = {(r.src, r.dst, r.weight) for r in g2.edges.collect()}
    assert a == b


def test_cover_reader(spark, tmp_path):
    from linkgraph.io import read_cover

    f = tmp_path / "c.cover"
    f.write_text("0 1\n0\n1\n")
    cov = read_cover(spark, str(f))
    got = {(r.id, r.label) for r in cov.collect()}
    assert got == {(0, 0), (0, 1), (1, 0), (2, 1)}


# --------------------------------------------------------------------------
# Dynamic CC removals
# --------------------------------------------------------------------------

def test_incremental_cc_removal_bridge_splits(spark):
    from linkgraph.algs.components import connected_components
    from linkgraph.streaming.deltas import incremental_cc_removals

    g_before = make_graph(spark, [(0, 1), (1, 2), (3, 4), (2, 3)])
    labels = connected_components(g_before)
    g_after = make_graph(spark, [(0, 1), (1, 2), (3, 4)])
    removed = spark.createDataFrame([(2, 3)], "src bigint, dst bigint")
    new = collect_map(
        incremental_cc_removals(labels, g_after, removed), "id", "label"
    )
    assert new[0] == new[1] == new[2] == 0
    assert new[3] == new[4] == 3


def test_incremental_cc_removal_non_bridge_stable(spark):
    from linkgraph.algs.components import connected_components
    from linkgraph.streaming.deltas import incremental_cc_removals

    g_before = make_graph(spark, [(0, 1), (1, 2), (0, 2)])
    labels = connected_components(g_before)
    g_after = make_graph(spark, [(0, 1), (1, 2)])
    removed = spark.createDataFrame([(0, 2)], "src bigint, dst bigint")
    new = collect_map(
        incremental_cc_removals(labels, g_after, removed), "id", "label"
    )
    assert new == collect_map(labels, "id", "component")


# --------------------------------------------------------------------------
# Pruned streaming merge
# --------------------------------------------------------------------------

def test_pruned_merge_touches_only_affected_blocks(spark, tmp_path):
    import glob
    import json

    from linkgraph.streaming.deltas import (
        read_blocked_edges,
        stream_apply_deltas_pruned,
        write_blocked_edges,
    )

    rows = [(i, i + 100, 1.0) for i in range(32)]
    edges = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    table = str(tmp_path / "edges_tbl")
    write_blocked_edges(edges, table, n_blocks=16)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(table + "/block=*/*.parquet")
    }
    # one delta touching src=5 → block 5 only
    ddir = tmp_path / "deltas"
    ddir.mkdir()
    (ddir / "d1.json").write_text(
        json.dumps(
            {
                "op": "update_weight",
                "src": 5,
                "dst": 105,
                "weight": 9.0,
                "ts": "2026-01-01T00:00:00.000Z",
            }
        )
        + "\n"
    )
    q = stream_apply_deltas_pruned(
        spark, str(ddir), table, str(tmp_path / "ckpt"), n_blocks=16
    )
    q.awaitTermination(120)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(table + "/block=*/*.parquet")
    }
    untouched = [p for p in before if "block=5" not in p]
    assert untouched and all(
        p in after and after[p] == before[p] for p in untouched
    ), "untouched block files must remain byte-identical"
    merged = read_blocked_edges(spark, table)
    got = {(r.src, r.dst): r.weight for r in merged.collect()}
    assert got[(5, 105)] == 9.0 and len(got) == 32


# --------------------------------------------------------------------------
# Banded LSH + approx clustering coefficient
# --------------------------------------------------------------------------

def test_banded_lsh_recall_beats_single_probe(spark):
    from linkgraph.text.similarity import (
        cosine_topk,
        lsh_cosine_topk,
        lsh_cosine_topk_banded,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from pyspark.sql import functions as F

    qs = emb.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, qs, k=5).collect()}
    single = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk(emb, qs, k=5, n_planes=16).collect()
    }
    banded = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk_banded(emb, qs, k=5, n_planes=16, bands=8).collect()
    }
    recall_single = len(single & exact) / len(exact)
    recall_banded = len(banded & exact) / len(exact)
    assert recall_banded >= 0.9
    assert recall_banded >= recall_single


def test_approx_clustering_coefficient_band(spark, karate):
    from linkgraph.algs.triangles import (
        approx_global_clustering_coefficient,
        global_clustering_coefficient,
    )

    exact = global_clustering_coefficient(karate)
    approx = approx_global_clustering_coefficient(karate, trials=4000)
    assert abs(approx - exact) < 0.08


# --------------------------------------------------------------------------
# Sfigality / similarity sparsification scores / TopCloseness / attr assort
# --------------------------------------------------------------------------

def test_sfigality_star(spark):
    from linkgraph.algs.centrality import sfigality

    g = make_graph(spark, [(0, 1), (0, 2), (0, 3)])
    s = collect_map(sfigality(g), "id", "score")
    assert s[0] == 0.0            # hub: no neighbor has higher degree
    assert s[1] == s[2] == s[3] == 1.0  # leaves: all neighbors dominate


def test_local_similarity_and_scan(spark):
    from linkgraph.algs.sparsification import (
        local_similarity_score,
        scan_structural_similarity,
    )

    # triangle 0-1-2 plus pendant 2-3
    g = make_graph(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
    ls = {(r.src, r.dst): r.score for r in local_similarity_score(g).collect()}
    # edge (0,1): T=1, deg 2+2 → 1/(2+2-1-2) = 1
    assert ls[(0, 1)] == pytest.approx(1.0)
    assert ls[(2, 3)] == pytest.approx(0.0)
    sc = {(r.src, r.dst): r.score for r in scan_structural_similarity(g).collect()}
    # edge (0,1): (1+2)/sqrt(3*3) = 1
    assert sc[(0, 1)] == pytest.approx(1.0)
    # edge (2,3): (0+2)/sqrt(4*2)
    assert sc[(2, 3)] == pytest.approx(2 / np.sqrt(8))


def test_top_closeness_path(spark, path_5):
    from linkgraph.algs.bfs import top_closeness

    top = top_closeness(path_5, k=1).collect()
    assert top[0].id == 2  # path center is the most central


def test_attribute_assortativity(spark):
    from linkgraph.algs.centrality import attribute_assortativity

    g = make_graph(spark, [(0, 1), (2, 3)])
    # attribute perfectly aligned within edges → corr = 1
    attrs = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 5.0), (3, 5.0)], "id bigint, value double"
    )
    assert attribute_assortativity(g, attrs) == pytest.approx(1.0)
    # anti-aligned attribute
    attrs2 = spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, 5.0), (3, 1.0)], "id bigint, value double"
    )
    assert attribute_assortativity(g, attrs2) == pytest.approx(-1.0)
