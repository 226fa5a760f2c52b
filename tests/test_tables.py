

# ---------------------------------------------------------------------------
# community_shard_plan (round-3 session-3)
# ---------------------------------------------------------------------------


def test_shard_plan_balances_heads(spark):
    from pyspark.sql import functions as F

    from linkgraph.tables import community_shard_plan

    # 4 big communities (sizes 40, 30, 20, 10) + 20 singletons
    rows = (
        [(i, 100) for i in range(40)]
        + [(100 + i, 101) for i in range(30)]
        + [(200 + i, 102) for i in range(20)]
        + [(300 + i, 103) for i in range(10)]
        + [(400 + i, 200 + i) for i in range(20)]
    )
    labels = spark.createDataFrame(rows, "id bigint, label bigint")
    plan = community_shard_plan(labels, n_shards=2, max_explicit=4)
    got = {r.label: r.shard for r in plan.collect()}
    # sorted round-robin: 40→s0, 30→s1, 20→s0, 10→s1
    assert got[100] == 0 and got[101] == 1 and got[102] == 0 and got[103] == 1
    assert set(got) == {100, 101, 102, 103} | {200 + i for i in range(20)}
    assert all(0 <= s < 2 for s in got.values())
    # deterministic
    again = {r.label: r.shard for r in community_shard_plan(labels, 2, 4).collect()}
    assert got == again


def test_apply_shard_plan_colocates(spark):
    from pyspark.sql import functions as F

    from linkgraph.tables import apply_shard_plan, community_shard_plan

    labels = spark.createDataFrame(
        [(i, i // 5) for i in range(20)], "id bigint, label bigint"
    )
    edges = spark.createDataFrame(
        [(i, (i + 1) % 20, 1.0) for i in range(20)],
        "src bigint, dst bigint, weight double",
    )
    plan = community_shard_plan(labels, n_shards=3, max_explicit=10)
    tagged = apply_shard_plan(edges, labels, plan, n_shards=3)
    assert tagged.count() == 20
    # every edge's shard equals its src community's planned shard
    pl = {r.label: r.shard for r in plan.collect()}
    for r in tagged.collect():
        assert r.shard == pl[r.src // 5]


def test_adjacency_table_roundtrip_and_chunking(spark):
    from conftest import make_graph

    from pyspark.sql import functions as F

    from linkgraph.tables import adjacency_table, edges_from_adjacency

    # hub 0 with 20 neighbors + a small tail
    g = make_graph(spark, [(0, i) for i in range(1, 21)] + [(30, 31)], directed=True)
    adj = adjacency_table(g, max_chunk=8)
    rows = {(r.src, r.chunk): r for r in adj.collect()}
    assert {(s, c) for s, c in rows} == {(0, 0), (0, 1), (0, 2), (30, 0)}
    assert rows[(0, 0)].n == 8 and rows[(0, 2)].n == 4
    # chunk 0 holds the 8 smallest neighbors in order
    assert rows[(0, 0)].neighbors == ",".join(str(i) for i in range(1, 9))
    back = {(r.src, r.dst) for r in edges_from_adjacency(adj).collect()}
    assert back == {(0, i) for i in range(1, 21)} | {(30, 31)}
