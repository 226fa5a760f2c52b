"""Graph handle: degrees, symmetrize, transforms (NetworKit Graph/GraphTools parity)."""

from conftest import collect_map, make_graph


def test_degrees_karate(karate):
    deg = collect_map(karate.degrees(), "id", "degree")
    # known degrees of Zachary karate club
    assert deg[0] == 16
    assert deg[33] == 17
    assert deg[32] == 12
    assert sum(deg.values()) == 2 * 78


def test_out_in_degrees_directed(directed_dangling):
    out = collect_map(directed_dangling.out_degrees(), "id", "degree")
    inn = collect_map(directed_dangling.in_degrees(), "id", "degree")
    assert out == {0: 1, 1: 1, 2: 2, 3: 0}
    assert inn == {0: 1, 1: 1, 2: 1, 3: 1}


def test_weighted_degrees(weighted_triangle):
    wd = collect_map(weighted_triangle.degrees(), "id", "weighted_degree")
    assert wd == {0: 4.0, 1: 3.0, 2: 5.0}


def test_num_nodes_edges(karate):
    assert karate.num_nodes() == 34
    assert karate.num_edges() == 78


def test_symmetric_edges_count(karate):
    assert karate.symmetric_edges().count() == 156


def test_transpose(directed_dangling):
    t = directed_dangling.transpose()
    pairs = {(r.src, r.dst) for r in t.edges.collect()}
    assert pairs == {(1, 0), (2, 1), (0, 2), (3, 2)}


def test_to_undirected(directed_dangling):
    u = directed_dangling.to_undirected()
    pairs = {(r.src, r.dst) for r in u.edges.collect()}
    assert pairs == {(0, 1), (1, 2), (0, 2), (2, 3)}


def test_subgraph(spark, karate):
    ids = spark.createDataFrame([(i,) for i in range(5)], "id bigint")
    sub = karate.subgraph(ids)
    pairs = {(r.src, r.dst) for r in sub.edges.collect()}
    assert all(s < 5 and d < 5 for s, d in pairs)
    assert (0, 1) in pairs and (0, 4) in pairs


def test_compact_ids(spark, two_components):
    g, mapping = two_components.compact_ids()
    new_ids = sorted(r.new_id for r in mapping.collect())
    assert new_ids == list(range(6))
    assert g.num_edges() == two_components.num_edges()


def test_density_volume_maxdeg(complete_k4):
    assert abs(complete_k4.density() - 1.0) < 1e-12
    assert complete_k4.volume() == 12.0  # 2 * 6 edges
    assert complete_k4.max_degree() == 3


def test_orient_by_degree(karate):
    o = karate.orient_by_degree()
    assert o.count() == 78  # one direction per undirected edge
    # orientation must be acyclic on (degree, id): no pair both ways
    pairs = {(r.src, r.dst) for r in o.collect()}
    assert not any((d, s) in pairs for s, d in pairs)


def test_self_loop_conventions(self_loop):
    deg = collect_map(self_loop.degrees(), "id", "degree")
    assert deg[9] == 1  # self-loop contributes one symmetric row
    simple = self_loop.remove_self_loops()
    assert simple.num_edges() == 3
