"""Streaming deltas: batch merge semantics, windowed rates, incremental CC."""

import json

from conftest import collect_map, make_graph
from pyspark.sql import functions as F

from linkgraph.algs.components import connected_components
from linkgraph.streaming.deltas import (
    DELTA_SCHEMA,
    apply_deltas,
    edge_rate_windows,
    incremental_cc_additions,
    read_delta_stream,
    stream_apply_deltas,
)


def _deltas(spark, rows):
    import datetime as dt

    rows = [
        (op, s, d, w, dt.datetime.fromisoformat(ts)) for op, s, d, w, ts in rows
    ]
    return spark.createDataFrame(rows, DELTA_SCHEMA)


def test_apply_deltas_last_writer_wins(spark):
    edges = spark.createDataFrame([(0, 1, 1.0)], "src bigint, dst bigint, weight double")
    deltas = _deltas(
        spark,
        [
            ("add_edge", 1, 2, 1.0, "2026-01-01T00:00:00"),
            ("remove_edge", 1, 2, 0.0, "2026-01-01T00:05:00"),  # later wins
            ("update_weight", 0, 1, 9.0, "2026-01-01T00:01:00"),
            ("add_edge", 5, 6, 2.0, "2026-01-01T00:02:00"),
        ],
    )
    out = {(r.src, r.dst): r.weight for r in apply_deltas(edges, deltas).collect()}
    assert out == {(0, 1): 9.0, (5, 6): 2.0}


def test_streaming_end_to_end(spark, tmp_path):
    ddir = tmp_path / "deltas"
    ddir.mkdir()
    (ddir / "b1.json").write_text(
        json.dumps({"op": "add_edge", "src": 1, "dst": 2, "weight": 1.0, "ts": "2026-01-01T00:00:00"})
        + "\n"
        + json.dumps({"op": "add_edge", "src": 2, "dst": 3, "weight": 1.0, "ts": "2026-01-01T00:01:00"})
    )
    (ddir / "b2.json").write_text(
        json.dumps({"op": "remove_edge", "src": 1, "dst": 2, "weight": 0.0, "ts": "2026-01-01T00:02:00"})
    )
    q = stream_apply_deltas(
        spark, str(ddir), str(tmp_path / "table"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = {(r.src, r.dst) for r in spark.read.parquet(str(tmp_path / "table")).collect()}
    assert out == {(2, 3)}


def test_edge_rate_windows_batch(spark):
    deltas = _deltas(
        spark,
        [
            ("add_edge", 1, 2, 1.0, "2026-01-01T00:00:10"),
            ("add_edge", 2, 3, 1.0, "2026-01-01T00:00:50"),
            ("remove_edge", 1, 2, 0.0, "2026-01-01T00:01:10"),
        ],
    )
    rows = edge_rate_windows(deltas, "1 minute").collect()
    got = {(str(r.window_start), r.op): r.n for r in rows}
    assert got[("2026-01-01 00:00:00", "add_edge")] == 2
    assert got[("2026-01-01 00:01:00", "remove_edge")] == 1


def test_incremental_cc_merges_components(spark, two_components):
    labels = connected_components(two_components)
    added = spark.createDataFrame([(2, 5, 1.0)], "src bigint, dst bigint, weight double")
    merged = collect_map(incremental_cc_additions(labels, added), "id", "label")
    assert len(set(merged.values())) == 1 and set(merged.values()) == {0}


def test_incremental_cc_noop_without_cross_edges(spark, two_components):
    labels = connected_components(two_components)
    added = spark.createDataFrame([(0, 1, 1.0)], "src bigint, dst bigint, weight double")
    merged = collect_map(incremental_cc_additions(labels, added), "id", "label")
    assert merged == collect_map(labels, "id", "component" if "component" in labels.columns else "label")


def test_delta_stream_is_streaming(spark, tmp_path):
    d = tmp_path / "s"
    d.mkdir()
    (d / "x.json").write_text(
        json.dumps({"op": "add_edge", "src": 0, "dst": 1, "weight": 1.0, "ts": "2026-01-01T00:00:00"})
    )
    s = read_delta_stream(spark, str(d))
    assert s.isStreaming


def test_incremental_additions_with_new_vertices(spark):
    """An added edge touching a vertex with no label row must create the
    row and merge components (inner joins silently dropped it before)."""
    from linkgraph.streaming.deltas import incremental_cc_additions

    labels = spark.createDataFrame([(1, 1), (2, 2)], "id bigint, label bigint")
    added = spark.createDataFrame(
        [(1, 99), (99, 2)], "src bigint, dst bigint"
    )
    out, changed = incremental_cc_additions(labels, added, with_changed=True)
    lab = {r.id: r.label for r in out.collect()}
    assert lab == {1: 1, 2: 1, 99: 1}  # 99 joined AND bridged 1-2
    assert 99 in {r.id for r in changed.collect()}
