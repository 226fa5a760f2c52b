"""Gephi graph-streaming export — protocol-shape round-trips."""

import glob
import json

from conftest import make_graph

from pyspark.sql import functions as F

from linkgraph.gephi import (
    attribute_events,
    delta_events,
    graph_events,
    write_event_stream,
)


def _read_lines(path):
    out = []
    for f in sorted(glob.glob(path + "/part-*")):
        with open(f) as fh:
            out += [json.loads(ln) for ln in fh if ln.strip()]
    return out


def test_graph_events_shape(spark, tmp_path):
    g = make_graph(spark, [(0, 1, 2.0), (1, 2, 1.0)], directed=True, weighted=True)
    path = str(tmp_path / "stream")
    write_event_stream(graph_events(g), path)
    lines = _read_lines(path)
    kinds = [next(iter(l)) for l in lines]
    # all nodes strictly before all edges
    assert kinds == ["an", "an", "an", "ae", "ae"]
    ae = [l["ae"] for l in lines if "ae" in l]
    keys = {next(iter(e)) for e in ae}
    assert keys == {"0-1", "1-2"}
    e01 = next(e["0-1"] for e in ae if "0-1" in e)
    assert e01 == {"source": "0", "target": "1", "directed": True, "weight": 2.0}


def test_node_attribute_join(spark, tmp_path):
    g = make_graph(spark, [(0, 1)])
    attrs = spark.createDataFrame([(0, 0.75), (1, 0.25)], "id bigint, rank double")
    path = str(tmp_path / "stream2")
    write_event_stream(graph_events(g, node_attrs=attrs), path)
    an = {k: v for l in _read_lines(path) if "an" in l for k, v in l["an"].items()}
    assert an["0"]["rank"] == 0.75
    assert an["1"]["label"] == "1"


def test_attribute_events(spark, tmp_path):
    vals = spark.createDataFrame(
        [(3, 7, 0.5), (4, 2, 0.1)], "id bigint, community bigint, score double"
    )
    path = str(tmp_path / "cn")
    write_event_stream(attribute_events(vals), path)
    lines = _read_lines(path)
    assert all("cn" in l for l in lines)
    cn = {k: v for l in lines for k, v in l["cn"].items()}
    assert cn["3"] == {"community": 7, "score": 0.5}


def test_delta_events_order_and_kinds(spark, tmp_path):
    deltas = spark.createDataFrame(
        [(2, "remove", 0, 1, 1.0), (1, "add", 0, 1, 1.0)],
        "ts bigint, op string, src bigint, dst bigint, weight double",
    )
    path = str(tmp_path / "deltas")
    write_event_stream(delta_events(deltas), path)
    lines = _read_lines(path)
    assert [next(iter(l)) for l in lines] == ["ae", "de"]  # ts order
    assert "0-1" in lines[1]["de"]


def test_post_events_against_local_server(spark):
    """Drive the live-POST transport against an in-process HTTP server:
    bodies arrive in seq order, batched, with CRLF line termination."""
    import http.server
    import threading

    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(self.rfile.read(n).decode("utf-8"))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from linkgraph.gephi import graph_events, post_events

        g = make_graph(spark, [(0, 1), (1, 2)])
        url = f"http://127.0.0.1:{srv.server_port}/ws?operation=updateGraph"
        post_events(graph_events(g), url, batch=2)
        lines = [
            json.loads(ln)
            for body in received
            for ln in body.split("\r\n")
            if ln.strip()
        ]
        kinds = [next(iter(l)) for l in lines]
        assert kinds == ["an", "an", "an", "ae", "ae"]
        assert len(received) == 3  # 5 events at batch=2 → 2+2+1 requests
        assert all(body.endswith("\r\n") for body in received)
    finally:
        srv.shutdown()
