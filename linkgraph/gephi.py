"""Gephi graph-streaming export (gephi/ module parity).

Reference parity: networkit/python/gephi/streaming.py
(GephiStreamingClient) — NetworKit pushes a graph plus per-node attribute
columns into a running Gephi instance through the Graph Streaming plugin's
JSON event protocol: one JSON object per line, each wrapping a single
event type — ``an`` (add node), ``ae`` (add edge), ``cn`` (change node),
``ce`` (change edge), ``dn``/``de`` (deletes).

Spark-first re-expression: event GENERATION is a DataFrame program
(``to_json(struct(...))`` expressions, no Python in the loop) that scales
with the graph; the transport is separated out:

- :func:`graph_events` / :func:`attribute_events` /
  :func:`delta_events` build ordered event DataFrames;
- :func:`write_event_stream` sinks them as JSON-lines text, exactly the
  byte stream the plugin's ``?operation=updateGraph`` endpoint consumes
  (replayable later with ``curl --data-binary @file``);
- :func:`post_events` performs the live HTTP push. No Gephi master
  exists in the sandbox, but the transport is driven in tests against an
  in-process HTTP server (ordering, batching, CRLF framing); a real
  endpoint sees the identical payload bytes as the file sink.

Event ordering: the protocol is order-sensitive (an edge may only
reference existing nodes), so every builder returns a ``seq`` column and
the sinks sort by it — nodes before edges, deletes after changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def _json_obj(kind: str, key_col, payload) -> F.Column:
    """One protocol line: {"<kind>": {"<key>": {payload…}}}."""
    return F.to_json(
        F.create_map(F.lit(kind), F.create_map(key_col.cast("string"), payload))
    )


def graph_events(graph: Graph, node_attrs: DataFrame | None = None) -> DataFrame:
    """(seq, event) — ``an`` events for every vertex (with optional
    attribute columns from ``node_attrs`` (id, …)), then ``ae`` events for
    every stored edge. Edge keys are "src-dst" (the reference uses its own
    running edge ids; a content key keeps the stream deterministic and
    replay-idempotent)."""
    nodes = graph.nodes()
    if node_attrs is not None:
        nodes = nodes.join(node_attrs, "id", "left")
    attr_cols = [c for c in nodes.columns if c != "id"]
    payload = F.struct(
        F.col("id").cast("string").alias("label"),
        *[F.col(c).alias(c) for c in attr_cols],
    )
    an = nodes.select(
        F.col("id").cast("bigint").alias("_k"),
        _json_obj("an", F.col("id"), payload).alias("event"),
        F.lit(0).alias("_phase"),
    )
    e = graph.edges.select("src", "dst", "weight")
    ae = e.select(
        # hash key, not src*C+dst: ids are 64-bit hashes in the extraction
        # pipeline and the product overflows under ANSI arithmetic
        F.xxhash64("src", "dst").alias("_k"),
        _json_obj(
            "ae",
            F.concat_ws("-", F.col("src"), F.col("dst")),
            F.struct(
                F.col("src").cast("string").alias("source"),
                F.col("dst").cast("string").alias("target"),
                F.lit(graph.directed).alias("directed"),
                F.col("weight").cast("double").alias("weight"),
            ),
        ).alias("event"),
        F.lit(1).alias("_phase"),
    )
    both = an.unionByName(ae)
    # phase-major seq (all nodes strictly before all edges), key-minor.
    # seq is NOT collision-free (pmod into 40 bits) — the sinks break
    # remaining ties on the event string, so exports are byte-stable.
    return both.select(
        (F.col("_phase") * F.lit(1 << 40) + F.pmod(F.col("_k"), F.lit(1 << 40))).alias(
            "seq"
        ),
        "event",
    )


def attribute_events(values: DataFrame, id_col: str = "id") -> DataFrame:
    """(seq, event) — ``cn`` change-node events pushing every non-id
    column of ``values`` as a node attribute (the reference's
    exportNodeValues: centrality scores, partition labels, …)."""
    attr_cols = [c for c in values.columns if c != id_col]
    payload = F.struct(*[F.col(c).alias(c) for c in attr_cols])
    return values.select(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(1 << 40)).alias("seq"),
        _json_obj("cn", F.col(id_col), payload).alias("event"),
    )


def delta_events(deltas: DataFrame) -> DataFrame:
    """(seq, event) — translate a graph-event delta stream
    (linkgraph.streaming.deltas schema: ts, op ∈ {add, remove}, src, dst,
    weight) into ``ae``/``de`` protocol lines ordered by timestamp.
    Same-timestamp events for the same edge have no defined order in the
    delta schema; the sinks' (seq, event) sort makes the replay
    deterministic ("ae" sorts before "de" at equal ts)."""
    key = F.concat_ws("-", F.col("src"), F.col("dst"))
    add = F.when(
        F.col("op") == "add",
        _json_obj(
            "ae",
            key,
            F.struct(
                F.col("src").cast("string").alias("source"),
                F.col("dst").cast("string").alias("target"),
                F.col("weight").cast("double").alias("weight"),
            ),
        ),
    )
    rem = _json_obj("de", key, F.struct(F.lit(True).alias("filter")))
    return deltas.select(
        F.col("ts").cast("bigint").alias("seq"),
        F.coalesce(add, rem).alias("event"),
    )


def write_event_stream(events: DataFrame, path: str) -> None:
    """Sink (seq, event) as a single ordered JSON-lines file — the exact
    byte stream Gephi's updateGraph endpoint accepts. Single text file ⇒
    fixture-scale helper (the protocol itself is a sequential stream; at
    scale, post per-partition with :func:`post_events` instead)."""
    # secondary sort on the event string: seq ties (hash collisions,
    # same-timestamp deltas) replay in a deterministic byte order
    events.orderBy("seq", "event").coalesce(1).select("event").write.mode(
        "overwrite"
    ).text(path)


def post_events(
    events: DataFrame,
    url: str = "http://localhost:8080/workspace1?operation=updateGraph",
    batch: int = 1000,
) -> None:
    """Live push: POST events to a Gephi Graph Streaming master in seq
    order, ``batch`` lines per request (tested against an in-process
    HTTP server; payload bytes identical to :func:`write_event_stream`'s
    output)."""
    import urllib.request

    def send(lines: list[str]) -> None:
        body = ("\r\n".join(lines) + "\r\n").encode("utf-8")
        req = urllib.request.Request(url, data=body, method="POST")
        urllib.request.urlopen(req).read()

    buf: list[str] = []
    # protocol is order-sensitive → sequential driver-side iteration
    # (toLocalIterator streams one partition at a time, no full collect)
    for row in events.orderBy("seq", "event").select("event").toLocalIterator():
        buf.append(row.event)
        if len(buf) >= batch:
            send(buf)
            buf = []
    if buf:
        send(buf)
