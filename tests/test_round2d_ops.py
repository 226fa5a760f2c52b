"""Round-2 continuation: topological sort, graph append/merge, maximal
cliques (final GraphTools/clique rows of SURVEY §2A)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from tests.conftest import make_graph

nx = pytest.importorskip("networkx")


# -- topological sort --------------------------------------------------------

def _levels(df):
    return {r["id"]: r["level"] for r in df.collect()}


def test_topological_levels_diamond(spark):
    from linkgraph.algs.dag import topological_levels

    # 0 -> 1 -> 3, 0 -> 2 -> 3, 0 -> 3: longest path to 3 has length 2.
    g = make_graph(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)], directed=True)
    assert _levels(topological_levels(g)) == {0: 0, 1: 1, 2: 1, 3: 2}


def test_topological_levels_match_networkx(spark):
    from linkgraph.algs.dag import topological_levels

    rng = __import__("random").Random(7)
    # Random DAG: edges always low -> high id, so acyclic by construction.
    pairs = sorted({(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(120)})
    pairs = [(a, b) for a, b in pairs if a < b]
    g = make_graph(spark, pairs, directed=True)
    got = _levels(topological_levels(g))

    ng = nx.DiGraph(pairs)
    want = {}
    for v in nx.topological_sort(ng):
        preds = list(ng.predecessors(v))
        want[v] = max((want[u] + 1 for u in preds), default=0)
    assert got == want


def test_topological_order_is_valid(spark):
    from linkgraph.algs.dag import topological_order

    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4)]
    g = make_graph(spark, pairs, directed=True)
    pos = {r["id"]: r["pos"] for r in topological_order(g).collect()}
    assert sorted(pos.values()) == list(range(5))
    for a, b in pairs:
        assert pos[a] < pos[b]


def test_topological_levels_cycle_raises(spark, cycle_6):
    from linkgraph.algs.dag import topological_levels

    g = Graph.from_edges(cycle_6.edges, directed=True)
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(g)


def test_topological_levels_requires_directed(spark, path_5):
    from linkgraph.algs.dag import topological_levels

    with pytest.raises(ValueError, match="directed"):
        topological_levels(path_5)


# -- append / merge ----------------------------------------------------------

def test_append_disjoint_union(spark, path_5):
    h = make_graph(spark, [(0, 1), (1, 2)])
    combined = path_5.append(h)
    assert combined.num_edges() == 4 + 2
    assert combined.num_nodes() == 5 + 3
    # Shifted ids start past max id of the left graph (4) -> offset 5.
    ids = {r["id"] for r in combined.nodes().collect()}
    assert ids == {0, 1, 2, 3, 4, 5, 6, 7}


def test_append_hash_ids_raise(spark, path_5):
    # Full-range hash ids admit no collision-free shift: must refuse loudly
    # instead of overflowing (caught live via spark-submit under ANSI mode).
    h = make_graph(spark, [(-(2**62), 2**62)])
    with pytest.raises(ValueError, match="compact_ids"):
        path_5.append(h)
    with pytest.raises(ValueError, match="compact_ids"):
        h.append(path_5)


def test_merge_shared_ids_dedups(spark, path_5):
    h = make_graph(spark, [(3, 4, 2.5), (4, 5)], weighted=True)
    merged = path_5.merge(h)
    assert merged.num_edges() == 5  # (3,4) deduped
    w = {
        (r["src"], r["dst"]): r["weight"]
        for r in merged.edges.collect()
    }
    assert w[(3, 4)] == 2.5  # max-weight dedup rule


# -- maximal cliques ---------------------------------------------------------

def _nx_cliques(pairs):
    ng = nx.Graph(pairs)
    return sorted(tuple(sorted(c)) for c in nx.find_cliques(ng))


def _spark_cliques(g):
    from linkgraph.algs.cliques import maximal_cliques

    return sorted(tuple(r["members"]) for r in maximal_cliques(g).collect())


def test_maximal_cliques_karate(spark, karate):
    from tests.conftest import KARATE_EDGES

    assert _spark_cliques(karate) == _nx_cliques(KARATE_EDGES)


@pytest.mark.parametrize("seed,p", [(1, 0.15), (2, 0.3), (3, 0.45)])
def test_maximal_cliques_random(spark, seed, p):
    rng = __import__("random").Random(seed)
    pairs = [
        (a, b)
        for a in range(24)
        for b in range(a + 1, 24)
        if rng.random() < p
    ]
    g = make_graph(spark, pairs)
    assert _spark_cliques(g) == _nx_cliques(pairs)


def test_maximal_cliques_selfloop_singleton(spark):
    g = make_graph(spark, [(0, 1), (2, 2)])
    assert _spark_cliques(g) == [(0, 1), (2,)]


def test_clique_size_histogram(spark, karate):
    from linkgraph.algs.cliques import clique_size_histogram

    hist = {r["size"]: r["n_cliques"] for r in clique_size_histogram(karate).collect()}
    want = {}
    for c in _nx_cliques(__import__("tests.conftest", fromlist=["KARATE_EDGES"]).KARATE_EDGES):
        want[len(c)] = want.get(len(c), 0) + 1
    assert hist == want


# -- node2vec skip-gram training ---------------------------------------------

def test_node2vec_embeddings_structure(spark):
    from linkgraph.algs.embedding import node2vec_embeddings

    # Barbell: two K4s joined by one bridge — embeddings must separate sides.
    left = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    right = [(a + 10, b + 10) for a, b in left]
    g = make_graph(spark, left + right + [(3, 10)])
    emb = node2vec_embeddings(
        g, dim=8, walks_per_node=12, walk_length=8, max_iter=4, seed=7
    )
    vecs = {r["id"]: r["embedding"] for r in emb.collect()}
    assert set(vecs) == {0, 1, 2, 3, 10, 11, 12, 13}
    assert all(len(v) == 8 for v in vecs.values())

    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    intra = [cos(vecs[a], vecs[b]) for a, b in left] + [
        cos(vecs[a + 10], vecs[b + 10]) for a, b in left
    ]
    inter = [cos(vecs[a], vecs[b + 10]) for a in range(4) for b in range(4)]
    assert np.mean(intra) > np.mean(inter)


def test_node2vec_embeddings_deterministic(spark, two_triangles_bridge):
    from linkgraph.algs.embedding import node2vec_embeddings

    kw = dict(dim=4, walks_per_node=4, walk_length=5, max_iter=1, seed=11)
    a = node2vec_embeddings(two_triangles_bridge, **kw).collect()
    b = node2vec_embeddings(two_triangles_bridge, **kw).collect()
    va = {r["id"]: list(r["embedding"]) for r in a}
    vb = {r["id"]: list(r["embedding"]) for r in b}
    assert va == vb


# -- group closeness ---------------------------------------------------------

def _greedy_group_closeness_brute(pairs, k):
    ng = nx.Graph(pairs)
    n = ng.number_of_nodes()
    dist = dict(nx.all_pairs_shortest_path_length(ng))
    cur = {u: float(n) for u in ng.nodes}
    group = []
    for _ in range(k):
        best_v, best_red = None, 0.0
        for v in sorted(ng.nodes):
            if v in group:
                continue
            red = sum(max(cur[u] - d, 0.0) for u, d in dist[v].items())
            if red > best_red:
                best_v, best_red = v, red
        if best_v is None:
            break
        group.append(best_v)
        for u, d in dist[best_v].items():
            cur[u] = min(cur[u], float(d))
    return group


def test_group_closeness_karate(spark, karate):
    from linkgraph.algs.bfs import group_closeness
    from tests.conftest import KARATE_EDGES

    got = sorted(r["id"] for r in group_closeness(karate, k=3).collect())
    want = sorted(_greedy_group_closeness_brute(KARATE_EDGES, 3))
    assert got == want


def test_group_closeness_disconnected(spark):
    from linkgraph.algs.bfs import group_closeness

    # Two components: the greedy must cover both before polishing distance.
    g = make_graph(spark, [(0, 1), (1, 2), (10, 11)])
    got = {r["id"] for r in group_closeness(g, k=2).collect()}
    assert got == {1, 10}


# -- max flow (push-relabel) -------------------------------------------------

def test_max_flow_classic(spark):
    from linkgraph.algs.flow import max_flow

    # CLRS-style example: value 23.
    caps = [
        (0, 1, 16), (0, 2, 13), (1, 3, 12), (2, 1, 4), (2, 4, 14),
        (3, 2, 9), (3, 5, 20), (4, 3, 7), (4, 5, 4),
    ]
    g = make_graph(spark, [(a, b, float(c)) for a, b, c in caps], directed=True, weighted=True)
    value, flows = max_flow(g, 0, 5)
    assert value == pytest.approx(23.0)
    # feasibility: 0 <= flow <= cap, conservation at interior vertices
    rows = flows.collect()
    assert all(-1e-9 <= r["flow"] <= r["cap"] + 1e-9 for r in rows)
    net = {}
    for r in rows:
        net[r["src"]] = net.get(r["src"], 0.0) - r["flow"]
        net[r["dst"]] = net.get(r["dst"], 0.0) + r["flow"]
    for v, e in net.items():
        if v not in (0, 5):
            assert abs(e) < 1e-9


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_max_flow_random_matches_networkx(spark, seed):
    from linkgraph.algs.flow import max_flow

    rng = __import__("random").Random(seed)
    pairs = {}
    for _ in range(40):
        a, b = rng.randrange(10), rng.randrange(10)
        if a != b:
            pairs[(a, b)] = float(rng.randint(1, 10))
    g = make_graph(
        spark, [(a, b, c) for (a, b), c in pairs.items()], directed=True, weighted=True
    )
    value, _ = max_flow(g, 0, 9)

    ng = nx.DiGraph()
    for (a, b), c in pairs.items():
        ng.add_edge(a, b, capacity=c)
    if 0 in ng and 9 in ng:
        want = nx.maximum_flow_value(ng, 0, 9)
    else:
        want = 0.0
    assert value == pytest.approx(want)


def test_max_flow_disconnected_zero(spark):
    from linkgraph.algs.flow import max_flow

    g = make_graph(spark, [(0, 1, 5.0), (2, 3, 5.0)], directed=True, weighted=True)
    value, _ = max_flow(g, 0, 3)
    assert value == pytest.approx(0.0)


def test_min_cut_undirected_bridge(spark, two_triangles_bridge):
    from linkgraph.algs.flow import min_cut_value

    # Bridge capacity 1 separates the triangles: min cut across = 1.
    ids = sorted(r["id"] for r in two_triangles_bridge.nodes().collect())
    assert min_cut_value(two_triangles_bridge, ids[0], ids[-1]) == pytest.approx(1.0)


# -- hyperbolic generator ----------------------------------------------------

def _hyp_brute(spark, n, gamma, avg_degree, seed):
    import math

    from linkgraph.generators import hyperbolic_points

    a = (gamma - 1.0) / 2.0
    R = 2.0 * math.log((2.0 * a * a * n) / (math.pi * avg_degree * (a - 0.5) ** 2))
    pts = {r["id"]: (r["theta"], r["r"]) for r in hyperbolic_points(spark, n, a, R, seed).collect()}
    edges = set()
    for u in pts:
        for v in pts:
            if u >= v:
                continue
            tu, ru = pts[u]
            tv, rv = pts[v]
            dt = abs(tu - tv)
            dt = min(dt, 2 * math.pi - dt)
            ch = math.cosh(ru) * math.cosh(rv) - math.sinh(ru) * math.sinh(rv) * math.cos(dt)
            if ch <= math.cosh(R) + 1e-12:
                edges.add((u, v))
    return edges


@pytest.mark.parametrize("n,seed", [(150, 1), (400, 2)])
def test_hyperbolic_matches_bruteforce(spark, n, seed):
    from linkgraph.generators import hyperbolic

    got = {
        (r["src"], r["dst"])
        for r in hyperbolic(spark, n, avg_degree=6.0, gamma=2.5, seed=seed).collect()
    }
    want = _hyp_brute(spark, n, 2.5, 6.0, seed)
    assert got == want


def test_hyperbolic_degree_envelope(spark):
    from linkgraph.generators import hyperbolic

    n = 600
    e = hyperbolic(spark, n, avg_degree=8.0, gamma=2.7, seed=3)
    m = e.count()
    avg = 2.0 * m / n
    # Krioukov estimate is asymptotic — accept a loose band at small n.
    assert 2.0 < avg < 32.0
    # hub skew: max degree far above the mean (power-law signature)
    from linkgraph.graph import Graph

    g = Graph.from_edges(e)
    assert g.max_degree() > 4 * avg


def test_hyperbolic_deterministic(spark):
    from linkgraph.generators import hyperbolic

    a = sorted(map(tuple, hyperbolic(spark, 200, seed=9).collect()))
    b = sorted(map(tuple, hyperbolic(spark, 200, seed=9).collect()))
    assert a == b


# -- Laplacian-solver centralities -------------------------------------------

def test_effective_resistance_path(spark, path_5):
    from linkgraph.algs.electrical import effective_resistance

    assert effective_resistance(path_5, 0, 4) == pytest.approx(4.0, abs=1e-5)
    assert effective_resistance(path_5, 1, 3) == pytest.approx(2.0, abs=1e-5)


def test_effective_resistance_cycle(spark, cycle_6):
    from linkgraph.algs.electrical import effective_resistance

    # Parallel paths of 1 and 5 unit resistors: 5/6.
    assert effective_resistance(cycle_6, 0, 1) == pytest.approx(5.0 / 6.0, abs=1e-5)
    # Antipodal: 3*3/6 = 1.5.
    assert effective_resistance(cycle_6, 0, 3) == pytest.approx(1.5, abs=1e-5)


def test_effective_resistance_karate_vs_numpy(spark, karate):
    # numpy pinv oracle (nx.resistance_distance needs scipy, absent here)
    import numpy as np

    from linkgraph.algs.electrical import effective_resistance
    from tests.conftest import KARATE_EDGES

    n = 34
    L = np.zeros((n, n))
    for a, b in KARATE_EDGES:
        L[a, a] += 1
        L[b, b] += 1
        L[a, b] -= 1
        L[b, a] -= 1
    Lp = np.linalg.pinv(L)
    for u, v in [(0, 33), (5, 10)]:
        want = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        assert effective_resistance(karate, u, v) == pytest.approx(want, abs=1e-4)


def test_spanning_edge_centrality_cycle(spark, cycle_6):
    from linkgraph.algs.electrical import spanning_edge_centrality

    # Every cycle edge has SEC = r_eff = 5/6; JL error ~ 1/sqrt(k).
    sec = {(r["src"], r["dst"]): r["sec"] for r in
           spanning_edge_centrality(cycle_6, k=24, seed=4).collect()}
    assert len(sec) == 6
    for v in sec.values():
        assert v == pytest.approx(5.0 / 6.0, rel=0.45)
    # SEC sums to n-1 exactly in expectation (cycle: 6 * 5/6 = 5).
    assert sum(sec.values()) == pytest.approx(5.0, rel=0.25)


def test_electrical_closeness_cycle_uniform(spark, cycle_6):
    from linkgraph.algs.electrical import electrical_closeness

    # Symmetric graph: all scores equal; exact value (n-1)/sum_d r.
    # r(0,d) = d(6-d)/6: farness = 2*(5/6 + 8/6) + 9/6 = 35/6.
    got = {r["id"]: r["score"] for r in electrical_closeness(cycle_6, k=24, seed=5).collect()}
    want = 5.0 / (35.0 / 6.0)
    vals = list(got.values())
    for v in vals:
        assert v == pytest.approx(want, rel=0.35)
    assert max(vals) - min(vals) < 0.35 * want


# -- cut clustering ----------------------------------------------------------

def test_cut_clustering_two_triangles(spark, two_triangles_bridge):
    from linkgraph.algs.flow import cut_clustering

    # alpha in (1/3, 1/2): triangle side (cut 1 + 3a) beats singleton
    # (2 + a) and whole-graph (6a) cuts
    labels = {r["id"]: r["label"] for r in cut_clustering(two_triangles_bridge, alpha=0.4).collect()}
    groups = {}
    for i, l in labels.items():
        groups.setdefault(l, set()).add(i)
    parts = sorted(map(tuple, (sorted(g) for g in groups.values())))
    # bridge capacity 1 < alpha-side pull: triangles split cleanly
    assert len(parts) == 2
    assert all(len(p) == 3 for p in parts)


def test_cut_clustering_alpha_extremes(spark, path_5):
    from linkgraph.algs.flow import cut_clustering

    big = {r["id"]: r["label"] for r in cut_clustering(path_5, alpha=10.0).collect()}
    assert len(set(big.values())) == 5  # singletons
