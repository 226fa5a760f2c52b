"""PLM/Louvain: exact recovery on planted structures + modularity quality."""

from conftest import collect_map, make_graph

from linkgraph.algs.community import modularity
from linkgraph.algs.plm import louvain


def test_louvain_two_triangles(two_triangles_bridge):
    labels = collect_map(louvain(two_triangles_bridge), "id", "label")
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]


def test_louvain_two_cliques(spark):
    block_a = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    block_b = [(i, j) for i in range(10, 18) for j in range(i + 1, 18)]
    g = make_graph(spark, block_a + block_b + [(7, 10)])
    labels = collect_map(louvain(g), "id", "label")
    assert len({labels[i] for i in range(8)}) == 1
    assert len({labels[i] for i in range(10, 18)}) == 1
    assert labels[0] != labels[10]


def test_louvain_karate_modularity(karate):
    labels_df = louvain(karate)
    q = modularity(karate, labels_df)
    # Louvain on karate reaches Q ≈ 0.40-0.42; any real structure > 0.30
    assert q > 0.30, q
    n = labels_df.select("label").distinct().count()
    assert 2 <= n <= 8


def test_louvain_beats_or_matches_plp_on_karate(karate):
    from linkgraph.algs.plp import label_propagation

    q_plm = modularity(karate, louvain(karate))
    q_plp = modularity(karate, label_propagation(karate))
    assert q_plm >= q_plp - 0.02


def test_louvain_deterministic(two_triangles_bridge):
    a = collect_map(louvain(two_triangles_bridge), "id", "label")
    b = collect_map(louvain(two_triangles_bridge), "id", "label")
    assert a == b
