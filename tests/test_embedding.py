"""Node2Vec walk corpus: validity, determinism, bias direction."""

from conftest import make_graph
from pyspark.sql import functions as F

from linkgraph.algs.embedding import node2vec_walks


def _walks(df):
    out = {}
    for r in df.orderBy("walk_id", "pos").collect():
        out.setdefault(r.walk_id, []).append(r.vertex)
    return out


def test_walks_are_paths(karate):
    corpus = node2vec_walks(karate, walks_per_node=1, walk_length=4)
    walks = _walks(corpus)
    assert len(walks) == 34
    edges = {(r.src, r.dst) for r in karate.symmetric_edges().collect()}
    for w in walks.values():
        assert len(w) == 4  # karate has no dead ends
        for a, b in zip(w, w[1:]):
            assert (a, b) in edges


def test_walks_deterministic(two_triangles_bridge):
    a = _walks(node2vec_walks(two_triangles_bridge, walks_per_node=2, walk_length=5))
    b = _walks(node2vec_walks(two_triangles_bridge, walks_per_node=2, walk_length=5))
    assert a == b


def test_return_bias(path_5):
    # p→0 makes returning overwhelmingly likely: on a path, low p walks
    # oscillate; count immediate returns vs high p
    low_p = _walks(node2vec_walks(path_5, walks_per_node=4, walk_length=6, p=0.01, seed=7))
    high_p = _walks(node2vec_walks(path_5, walks_per_node=4, walk_length=6, p=100.0, seed=7))

    def returns(walks):
        n = 0
        for w in walks.values():
            n += sum(1 for i in range(2, len(w)) if w[i] == w[i - 2])
        return n

    assert returns(low_p) > returns(high_p)


def test_walk_length_on_dead_end(spark):
    g = make_graph(spark, [(0, 1)])
    corpus = node2vec_walks(g, walks_per_node=1, walk_length=5)
    # 0-1 edge: walks oscillate (undirected), full length
    assert corpus.groupBy("walk_id").count().agg(F.min("count")).collect()[0][0] == 5
