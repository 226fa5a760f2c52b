"""Graph IO — edge-list, METIS, and partition/label files.

Reference parity: io/EdgeListReader.cpp (separator, comment prefix,
firstNode offset), io/METISGraphReader.cpp (the format NetworKit's own
fixtures use: header ``n m [fmt]``, line i+1 = whitespace-separated
neighbors of vertex i, 1-based), io/PartitionReader.cpp (one label per
line). Everything is a declarative scan: csv/text readers + split/
posexplode projections — no driver-side parsing loops.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from linkgraph.graph import Graph


def read_edge_list(
    spark: SparkSession,
    path: str,
    sep: str = r"\s+",
    comment: str = "#",
    first_node: int = 0,
    directed: bool = False,
) -> Graph:
    """Delimited ``u v [w]`` lines → Graph. ``first_node`` shifts ids so
    1-based files land on 0-based ids (EdgeListReader's firstNode)."""
    lines = (
        spark.read.text(path)
        .where(~F.col("value").startswith(comment))
        .where(F.length(F.trim("value")) > 0)
        .select(F.split(F.trim("value"), sep).alias("p"))
    )
    edges = lines.select(
        (F.col("p")[0].cast("bigint") - first_node).alias("src"),
        (F.col("p")[1].cast("bigint") - first_node).alias("dst"),
        # F.get tolerates a missing 3rd column (ANSI mode makes [] raise)
        F.coalesce(F.get(F.col("p"), 2).cast("double"), F.lit(1.0)).alias("weight"),
    )
    return Graph.from_edges(edges, directed=directed)


def write_edge_list(graph: Graph, path: str, sep: str = " ") -> None:
    (
        graph.edges.select(
            F.concat_ws(sep, F.col("src"), F.col("dst"), F.col("weight")).alias("value")
        ).write.mode("overwrite").text(path)
    )


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METIS adjacency format → undirected Graph.

    Line numbering must be recovered deterministically; a global
    row-number over a zipWithIndex-free window is wrong under parallel
    text splits, so the file is read via ``wholetext`` (METIS fixtures are
    small — karate.graph etc.; huge graphs arrive as edge lists/parquet,
    not METIS). Weighted fmt codes (1/10/11) are supported for vertex/edge
    weights being skipped/read respectively.
    """
    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    lines = [ln.strip() for ln in raw.splitlines()]
    # keep BLANK lines: an isolated vertex's adjacency line is empty and
    # dropping it would shift every later vertex id (read_cover documents
    # the same rule); only comments go, and leading blanks before header
    lines = [ln for ln in lines if not ln.startswith("%")]
    while lines and not lines[0]:
        lines.pop(0)
    header = lines[0].split()
    n_vertices = int(header[0])
    # fmt is a 3-digit bitfield: [vertex sizes][vertex weights][edge weights]
    fmt = (header[2] if len(header) > 2 else "0").zfill(3)
    has_vs, has_vw, has_ew = fmt[0] == "1", fmt[1] == "1", fmt[2] == "1"
    # optional 4th header token: weights per vertex (only when has_vw)
    ncon = int(header[3]) if len(header) > 3 and has_vw else (1 if has_vw else 0)
    skip = (1 if has_vs else 0) + ncon
    rows = []
    for i, ln in enumerate(lines[1 : 1 + n_vertices], start=0):
        toks = ln.split()[skip:]
        if has_ew:
            pairs = list(zip(toks[0::2], toks[1::2]))
            for v, w in pairs:
                if i <= int(v) - 1:
                    rows.append((i, int(v) - 1, float(w)))
        else:
            for v in toks:
                if i <= int(v) - 1:
                    rows.append((i, int(v) - 1, 1.0))
    edges = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    return Graph.from_edges(edges, directed=False)


def read_partition(spark: SparkSession, path: str) -> DataFrame:
    """One label per line, line i = label of vertex i (PartitionReader).
    Uses wholetext for deterministic line numbering (fixture-scale)."""
    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    rows = [
        (i, int(v)) for i, v in enumerate(x for x in raw.splitlines() if x.strip())
    ]
    return spark.createDataFrame(rows, "id bigint, label bigint")


def write_partition(labels: DataFrame, path: str) -> None:
    """Parquet label table (engine-native; the line-file format does not
    survive distributed writes)."""
    labels.select("id", "label").write.mode("overwrite").parquet(path)


def read_snap(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """SNAP edge-list format (io/SNAPGraphReader.cpp): '#'-comment header
    lines, whitespace-separated ``FromNodeId ToNodeId`` rows. Pure
    declarative scan — identical plan shape to read_edge_list with SNAP's
    conventions pinned (tab-or-space separators, no weights)."""
    return read_edge_list(spark, path, sep=r"\s+", comment="#", directed=directed)


def read_konect(spark: SparkSession, path: str) -> Graph:
    """KONECT format (io/KONECTGraphReader.cpp): '%'-prefixed header lines
    ('%% sym|asym ...'), rows ``u v [weight [ts]]``, 1-based ids. The
    directedness flag is read from the first header line."""
    first = spark.read.text(path).limit(1).collect()
    directed = True
    if first and first[0]["value"].startswith("%"):
        directed = "asym" in first[0]["value"]
    return read_edge_list(
        spark, path, sep=r"\s+", comment="%", first_node=1, directed=directed
    )


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GML reader (io/GMLGraphReader.cpp) for the node/edge subset the
    reference reads: ``node [ id N ]`` and ``edge [ source A target B
    (value W)? ]`` blocks; ``directed 1`` honored. Declarative scan:
    wholetext + regex extraction (fixture-scale format — big graphs ship
    as edge lists/parquet)."""
    import re as _re

    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    directed = bool(_re.search(r"\bdirected\s+1\b", raw))
    edges = []
    # parse per-BLOCK then extract fields: a strict source-target-value
    # pattern silently dropped any edge carrying extra attributes
    # (label, id, ... — networkx and Gephi both emit them)
    for m in _re.finditer(r"edge\s*\[([^\]]*)\]", raw):
        body = m.group(1)
        sm = _re.search(r"\bsource\s+(\d+)", body)
        tm = _re.search(r"\btarget\s+(\d+)", body)
        if not sm or not tm:
            continue
        vm = _re.search(r"\b(?:value|weight)\s+([0-9.eE+-]+)", body)
        w = float(vm.group(1)) if vm else 1.0
        edges.append((int(sm.group(1)), int(tm.group(1)), w))
    df = spark.createDataFrame(edges, "src bigint, dst bigint, weight double")
    return Graph.from_edges(df, directed=directed)


def write_gml(graph: Graph, path: str) -> None:
    """GML writer (GMLGraphWriter.cpp) — fixture-scale (driver-side
    stringify; the engine-native interchange format is parquet)."""
    nodes = sorted(r["id"] for r in graph.nodes().collect())
    edges = graph.edges.collect()
    lines = ["graph", "["]
    if graph.directed:
        lines.append("  directed 1")
    for n in nodes:
        lines.append(f"  node [ id {n} ]")
    for e in edges:
        lines.append(
            f"  edge [ source {e['src']} target {e['dst']} value {e['weight']} ]"
        )
    lines.append("]")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """Cover file (io/CoverReader.cpp): line i = whitespace-separated
    subset ids of node i → exploded (id, label) rows (a node may carry
    several labels — the overlapping-community structure)."""
    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    rows = []
    # enumerate ALL lines: line i = node i, a blank line means node i
    # belongs to no subset (skipping blanks would shift every later id)
    for i, line in enumerate(raw.splitlines()):
        for lab in line.split():
            rows.append((i, int(lab)))
    return spark.createDataFrame(rows, "id bigint, label bigint")


def write_cover(cover: DataFrame, path: str) -> None:
    """Cover as parquet (id, label) pairs — the distributed-safe form
    (CoverWriter's line format does not survive distributed writes)."""
    cover.select("id", "label").write.mode("overwrite").parquet(path)


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphML reader (io/GraphMLReader.cpp scope): <node id>, <edge
    source target> elements, edgedefault honored, optional numeric
    <data key="weight"> child on edges. Fixture-scale (driver-side
    ElementTree parse — GraphML is an interchange format; big graphs ship
    as edge lists/parquet). Node ids: the reference maps arbitrary string
    ids to dense ints in document order; same here."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    root = ET.fromstring(raw)
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    g = root.find(f"{ns}graph")
    directed = (g.get("edgedefault", "undirected") == "directed")
    ids: dict[str, int] = {}
    for node in g.findall(f"{ns}node"):
        ids.setdefault(node.get("id"), len(ids))
    # only <data> whose key declares attr.name="weight" (or is literally
    # "weight") is a weight — any other numeric attribute (year, count…)
    # previously hijacked the edge weight
    wkeys = {
        k.get("id")
        for k in root.findall(f"{ns}key")
        if k.get("attr.name") == "weight" or k.get("id") == "weight"
    }
    wkeys.add("weight")
    edges, weighted = [], False
    for e in g.findall(f"{ns}edge"):
        u = ids.setdefault(e.get("source"), len(ids))
        v = ids.setdefault(e.get("target"), len(ids))
        w = 1.0
        for d in e.findall(f"{ns}data"):
            if d.get("key") not in wkeys:
                continue
            try:
                w = float(d.text)
                weighted = True
            except (TypeError, ValueError):
                pass
        edges.append((u, v, w))
    df = spark.createDataFrame(edges or [], "src bigint, dst bigint, weight double")
    return Graph.from_edges(df, directed=directed, weighted=weighted)


def write_graphml(graph: Graph, path: str) -> None:
    """GraphML writer (io/GraphMLWriter.cpp) — fixture-scale driver-side
    serialize, weight emitted as <data key="weight"> when the graph is
    weighted."""
    nodes = sorted(r["id"] for r in graph.nodes().collect())
    edges = graph.edges.collect()
    dflt = "directed" if graph.directed else "undirected"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '  <key id="weight" for="edge" attr.name="weight" attr.type="double"/>',
        f'  <graph id="G" edgedefault="{dflt}">',
    ]
    for n in nodes:
        out.append(f'    <node id="n{n}"/>')
    for e in edges:
        if graph.weighted:
            out.append(
                f'    <edge source="n{e["src"]}" target="n{e["dst"]}">'
                f'<data key="weight">{e["weight"]}</data></edge>'
            )
        else:
            out.append(f'    <edge source="n{e["src"]}" target="n{e["dst"]}"/>')
    out += ["  </graph>", "</graphml>"]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def read_gexf(spark: SparkSession, path: str) -> Graph:
    """GEXF reader (io/GEXFReader.cpp scope — the Gephi interchange
    format): <nodes><node id>, <edges><edge source target [weight]>,
    defaultedgetype honored. Fixture-scale driver-side parse, same
    disposition as GraphML. String node ids map to dense ints in document
    order (reference parity)."""
    import xml.etree.ElementTree as ET

    raw = spark.read.text(path, wholetext=True).collect()[0]["value"]
    root = ET.fromstring(raw)
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    g = root.find(f"{ns}graph")
    directed = (g.get("defaultedgetype", "undirected") == "directed")
    ids: dict[str, int] = {}
    nodes_el = g.find(f"{ns}nodes")
    if nodes_el is not None:
        for node in nodes_el.findall(f"{ns}node"):
            ids.setdefault(node.get("id"), len(ids))
    edges, weighted = [], False
    edges_el = g.find(f"{ns}edges")
    if edges_el is not None:
        for e in edges_el.findall(f"{ns}edge"):
            u = ids.setdefault(e.get("source"), len(ids))
            v = ids.setdefault(e.get("target"), len(ids))
            w = e.get("weight")
            if w is not None:
                weighted = True
            edges.append((u, v, float(w) if w is not None else 1.0))
    df = spark.createDataFrame(edges or [], "src bigint, dst bigint, weight double")
    return Graph.from_edges(df, directed=directed, weighted=weighted)


def write_gexf(graph: Graph, path: str) -> None:
    """GEXF 1.2 writer (io/GEXFWriter.cpp scope) — fixture-scale
    driver-side serialize; weight emitted as the edge ``weight``
    attribute when the graph is weighted."""
    nodes = sorted(r["id"] for r in graph.nodes().collect())
    edges = graph.edges.collect()
    dflt = "directed" if graph.directed else "undirected"
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">',
        f'  <graph defaultedgetype="{dflt}">',
        "    <nodes>",
    ]
    for n in nodes:
        out.append(f'      <node id="{n}"/>')
    out.append("    </nodes>")
    out.append("    <edges>")
    for i, e in enumerate(edges):
        w = f' weight="{e["weight"]}"' if graph.weighted else ""
        out.append(
            f'      <edge id="{i}" source="{e["src"]}" target="{e["dst"]}"{w}/>'
        )
    out += ["    </edges>", "  </graph>", "</gexf>"]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def write_dot(graph: Graph, path: str) -> None:
    """Graphviz DOT writer (io/DotGraphWriter.cpp) — fixture-scale
    visualization hand-off."""
    kind, arrow = ("digraph", "->") if graph.directed else ("graph", "--")
    lines = [f"{kind} G {{"]
    for e in graph.edges.collect():
        if graph.weighted:
            lines.append(f'  {e["src"]} {arrow} {e["dst"]} [weight={e["weight"]}];')
        else:
            lines.append(f'  {e["src"]} {arrow} {e["dst"]};')
    lines.append("}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _read_binary(spark: SparkSession, path: str) -> bytes:
    """Whole-file binary read through the Spark binaryFile source (the
    binary twin of the wholetext convention above; fixture-scale)."""
    return bytes(
        spark.read.format("binaryFile").load(path).select("content").collect()[0][0]
    )


def _varint_encode(x: int, out: bytearray) -> None:
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_thrill(spark: SparkSession, path: str) -> Graph:
    """ThrillGraphBinaryReader scope (io/ThrillGraphBinaryReader.cpp):
    varint-encoded adjacency lists — for each vertex in id order, a
    varint out-degree followed by that many varint neighbor ids (LEB128:
    7-bit groups, little-endian, high bit = continuation). Undirected
    graphs store each edge once, in the smaller endpoint's list (the
    write_thrill convention; round-trip tested). Fixture-scale
    driver-side parse; the distributed-native twin reads the engine's
    own parquet/CSR-block tables instead (linkgraph.tables)."""
    raw = _read_binary(spark, path)
    pos = 0

    def varint() -> int:
        nonlocal pos
        x = shift = 0
        while True:
            b = raw[pos]
            pos += 1
            x |= (b & 0x7F) << shift
            if not b & 0x80:
                return x
            shift += 7

    directed = bool(raw[pos]); pos += 1
    n = 0
    rows = []
    while pos < len(raw):
        deg = varint()
        for _ in range(deg):
            rows.append((n, varint()))
        n += 1
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in rows],
        "src bigint, dst bigint, weight double",
    )
    return Graph.from_edges(edges, directed=directed, weighted=False)


def write_thrill(graph: Graph, path: str) -> None:
    """Varint adjacency writer (io/ThrillGraphBinaryWriter.cpp scope):
    one leading directedness byte, then per-vertex varint degree +
    varint neighbor ids over dense 0..n-1 ids (compact first via
    graph.compact_ids() if ids are sparse)."""
    if graph.directed:
        rows = graph.edges.select("src", "dst").collect()
    else:
        e = graph.symmetric_edges().where(F.col("src") <= F.col("dst"))
        rows = e.select("src", "dst").collect()
    adj: dict = {}
    n = 0
    for r in rows:
        adj.setdefault(r["src"], []).append(r["dst"])
        n = max(n, r["src"] + 1, r["dst"] + 1)
    out = bytearray([1 if graph.directed else 0])
    for v in range(n):
        nbrs = sorted(adj.get(v, []))
        _varint_encode(len(nbrs), out)
        for u in nbrs:
            _varint_encode(u, out)
    with open(path, "wb") as f:
        f.write(bytes(out))


# graph-tool gt-format magic: "⛾ gt" (U+26FE + " gt"), per the public
# format spec at graph-tool.skewed.de (gt format documentation)
_GT_MAGIC = "⛾ gt".encode("utf-8")


def _gt_width(n: int) -> int:
    for w in (1, 2, 4, 8):
        if n <= (1 << (8 * w)) - 1:
            return w
    return 8


def read_graphtool(spark: SparkSession, path: str) -> Graph:
    """GraphToolBinaryReader parity (io/GraphToolBinaryReader.cpp scope;
    layout per graph-tool's public gt-format spec): magic '⛾ gt',
    version byte, big-endian bool byte, uint64-length-prefixed comment
    string, directed bool byte, uint64 N, then per-vertex out-adjacency
    as uint64 degree + neighbor ids in the smallest uint width holding
    N. Trailing property-map sections are ignored (the engine carries
    attributes as DataFrame columns, not serialized property maps).
    Fixture-scale driver-side parse."""
    raw = _read_binary(spark, path)
    if raw[: len(_GT_MAGIC)] != _GT_MAGIC:
        raise ValueError(f"{path}: not a gt-format file (bad magic)")
    pos = len(_GT_MAGIC)
    pos += 1  # version byte
    bo = "big" if raw[pos] else "little"; pos += 1
    clen = int.from_bytes(raw[pos : pos + 8], bo); pos += 8 + clen
    directed = bool(raw[pos]); pos += 1
    n = int.from_bytes(raw[pos : pos + 8], bo); pos += 8
    w = _gt_width(n)
    rows = []
    for v in range(n):
        deg = int.from_bytes(raw[pos : pos + 8], bo); pos += 8
        for _ in range(deg):
            rows.append((v, int.from_bytes(raw[pos : pos + w], bo)))
            pos += w
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in rows],
        "src bigint, dst bigint, weight double",
    )
    return Graph.from_edges(edges, directed=directed, weighted=False)


def write_graphtool(graph: Graph, path: str, comment: str = "") -> None:
    """gt-format writer (little-endian, version 1, no property maps).
    Undirected edges are stored once in the smaller endpoint's list —
    graph-tool's own storage convention. Dense 0..n-1 ids required."""
    if graph.directed:
        rows = graph.edges.select("src", "dst").collect()
    else:
        e = graph.symmetric_edges().where(F.col("src") <= F.col("dst"))
        rows = e.select("src", "dst").collect()
    adj: dict = {}
    n = 0
    for r in rows:
        adj.setdefault(r["src"], []).append(r["dst"])
        n = max(n, r["src"] + 1, r["dst"] + 1)
    w = _gt_width(n)
    cb = comment.encode("utf-8")
    out = bytearray(_GT_MAGIC)
    out.append(1)  # version
    out.append(0)  # little-endian
    out += len(cb).to_bytes(8, "little") + cb
    out.append(1 if graph.directed else 0)
    out += n.to_bytes(8, "little")
    for v in range(n):
        nbrs = sorted(adj.get(v, []))
        out += len(nbrs).to_bytes(8, "little")
        for u in nbrs:
            out += int(u).to_bytes(w, "little")
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_dgs(spark: SparkSession, path: str) -> DataFrame:
    """DGS dynamic-graph-stream parser (io/DGSStreamParser.cpp scope):
    produces the engine's canonical event table (ts, op, src, dst,
    weight) consumable by linkgraph.streaming.deltas / apply_deltas.

    Supported DGS events (the subset the reference's GraphUpdater
    consumes): ``st <t>`` time step, ``an <v>`` node add (recorded as a
    self-weight-0 marker row is NOT emitted — the engine's node set is
    edge-derived), ``ae <name> <u> <v> [w]`` edge add, ``ce <name> <w>``
    edge weight change, ``de <name>`` edge removal. Edge names map to
    their (u, v) pair from the ``ae`` that introduced them.

    Declarative scan for the row bulk is impossible here because ``de``/
    ``ce`` reference edge NAMES — resolving needs the ae-table; parsing
    is a driver-side pass (DGS is a fixture/interchange format; scale
    streams use the parquet delta source)."""
    raw = spark.read.text(path).collect()
    events = []
    t = 0
    names: dict[str, tuple] = {}
    for row in raw:
        line = row["value"].strip()
        if not line or line.startswith("#") or line.startswith("DGS"):
            continue
        parts = line.split()
        kind = parts[0].lower()
        if kind == "st":
            t = int(float(parts[1]))
        elif kind == "ae":
            u, v = int(parts[2]), int(parts[3])
            w = float(parts[4]) if len(parts) > 4 else 1.0
            names[parts[1]] = (u, v)
            events.append((float(t), "add_edge", u, v, w))
        elif kind == "ce" and parts[1] in names:
            u, v = names[parts[1]]
            events.append((float(t), "update_weight", u, v, float(parts[2])))
        elif kind == "de" and parts[1] in names:
            u, v = names[parts[1]]
            events.append((float(t), "remove_edge", u, v, 0.0))
        # an/dn/cn: node-level events — node set is edge-derived, ignored
    return spark.createDataFrame(
        events, "ts double, op string, src bigint, dst bigint, weight double"
    )


def write_dgs(events: DataFrame, path: str) -> None:
    """Serialize an engine event table back to DGS (fixture-scale)."""
    rows = events.select("ts", "op", "src", "dst", "weight").orderBy(
        "ts", "src", "dst"
    ).collect()
    out = ["DGS004", "dgs 0 0"]
    last_t = None
    for r in rows:
        t = int(r["ts"])
        if t != last_t:
            out.append(f"st {t}")
            last_t = t
        name = f"e{r['src']}_{r['dst']}"
        if r["op"] == "add_edge":
            out.append(f"ae {name} {r['src']} {r['dst']} {r['weight']}")
        elif r["op"] == "update_weight":
            out.append(f"ce {name} {r['weight']}")
        elif r["op"] == "remove_edge":
            out.append(f"de {name}")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def write_metis(graph: Graph, path: str) -> None:
    """METIS adjacency writer (io/METISGraphWriter.cpp): header ``n m``
    (fmt 1 appended when weighted), line i+1 = neighbors of vertex i
    (1-based), ``nbr weight`` pairs when weighted. Requires dense-ish ids
    (0..n-1 — compact first via Graph.compact_ids); fixture-scale
    driver-side stringify like the reference."""
    sym = graph.symmetric_edges().where(F.col("src") != F.col("dst"))
    rows = sym.select("src", "dst", "weight").collect()
    adj: dict = {}
    nodes = set()
    for r in rows:
        adj.setdefault(r["src"], []).append((r["dst"], r["weight"]))
        nodes.add(r["src"])
        nodes.add(r["dst"])
    n = (max(nodes) + 1) if nodes else 0
    m = sum(len(v) for v in adj.values()) // 2
    lines = [f"{n} {m} 1" if graph.weighted else f"{n} {m}"]
    for i in range(n):
        nbrs = sorted(adj.get(i, []))
        if graph.weighted:
            lines.append(" ".join(
                f"{v + 1} {int(w) if w == int(w) else w}" for v, w in nbrs
            ))
        else:
            lines.append(" ".join(str(v + 1) for v, _ in nbrs))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_edgelist_partition(
    spark: SparkSession, path: str, sep: str = r"\s+"
) -> DataFrame:
    """(id, label) from an edge-list-style partition file: each line
    ``vertex label`` (io/EdgeListPartitionReader.cpp; unlike
    PartitionReader the vertex id is explicit per line, so ordering and
    gaps are free). Pure distributed read.csv — no driver-side parse."""
    df = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), sep)
    return (
        df.where(F.length(F.trim("value")) > 0)
        .where(~F.trim("value").startswith("%") & ~F.trim("value").startswith("#"))
        .select(
            parts.getItem(0).cast("bigint").alias("id"),
            parts.getItem(1).cast("bigint").alias("label"),
        )
    )


# ---------------------------------------------------------------------------
# NetworKit binary graph format (nkbg)
# ---------------------------------------------------------------------------
# Layout follows the publicly documented NetworKit binary file format
# (io/NetworkitBinaryReader.cpp, io/NetworkitBinaryWriter.cpp,
# include/networkit/io/NetworkitBinaryGraph.hpp and the "NetworKit binary
# file format" docs page): an 8-byte magic + fixed little-endian uint64
# header with block offsets, a base block (node-existence bit flags +
# per-chunk first-vertex boundaries), then chunked, length-prefix-varint
# adjacency blocks (out lists; transpose/in lists when directed) and an
# optional weight block mirroring the adjacency structure. Chunking exists
# so each chunk can be decoded independently — the format's parallel-IO
# hook. The reference repo is unavailable in this sandbox to pin exact
# bytes against, so fidelity is spec-level (header fields, block order,
# prefix-varint scheme, weight-format enum) and validated by write→read
# round-trips plus hand-built byte fixtures, like the .gt/Thrill twins.

_NKB_MAGIC = b"nkbg003\x00"
_NKB_WGHT_NONE = 0  # weight-format enum (NetworkitBinaryGraph.hpp scope)
_NKB_WGHT_DOUBLE = 3
_NKB_HEADER_LEN = 8 + 11 * 8  # magic + checksum/features/nodes/chunks + 7 offsets


def _nkb_varint_encode(x: int, out: bytearray) -> None:
    """Length-prefixed varint: an n-byte encoding carries its length as
    n-1 trailing zero bits then a marker 1 in the first byte (x86/UTF-8
    style — the decoder learns the length from ONE byte instead of
    chasing continuation bits); 0x00 escapes to 8 raw little-endian
    bytes for values needing more than 56 bits."""
    if x >= (1 << 56):
        out.append(0)
        out += x.to_bytes(8, "little")
        return
    n = 1
    while x >= (1 << (7 * n)):
        n += 1
    out += (((x << 1) | 1) << (n - 1)).to_bytes(n, "little")


def _nkb_varint_decode(raw: bytes, pos: int) -> tuple:
    b = raw[pos]
    if b == 0:
        return int.from_bytes(raw[pos + 1 : pos + 9], "little"), pos + 9
    n = ((b & -b).bit_length() - 1) + 1  # trailing zeros + marker
    return int.from_bytes(raw[pos : pos + n], "little") >> n, pos + n


def _nkb_adj_block(adj: dict, weights: dict, lo_hi: list) -> tuple:
    """Encode one adjacency block: per-chunk byte sizes (uint64 array)
    then chunk payloads (per vertex: varint degree + varint neighbor
    ids). Returns (adj_bytes, weight_chunk_payloads) with neighbor order
    sorted so the byte stream is deterministic."""
    sizes = bytearray()
    payload = bytearray()
    wchunks = []
    for lo, hi in lo_hi:
        chunk = bytearray()
        wchunk = bytearray()
        for v in range(lo, hi):
            nbrs = sorted(adj.get(v, []))
            _nkb_varint_encode(len(nbrs), chunk)
            for u in nbrs:
                _nkb_varint_encode(u, chunk)
                if weights is not None:
                    wchunk += struct.pack("<d", weights[(v, u)])
        sizes += len(chunk).to_bytes(8, "little")
        payload += chunk
        wchunks.append(bytes(wchunk))
    return bytes(sizes) + bytes(payload), wchunks


def write_networkit_binary(graph: Graph, path: str, chunks: int = 4) -> None:
    """NetworkitBinaryWriter scope: header (magic ``nkbg003``, checksum,
    features bitfield — bit 0 directed, weight-format enum in bits 1-3 —
    node count, chunk count, per-block offsets), base block (node flags
    bitmask + chunk first-vertex array), chunked varint out-adjacency,
    chunked in-adjacency (directed only; undirected stores each edge
    once in the smaller endpoint's list, transpose offset 0), and a
    weight block of raw little-endian doubles mirroring the adjacency
    order when ``graph.weighted``. Dense 0..n-1 ids required
    (``compact_ids`` first for sparse id spaces); fixture-scale
    driver-side encode — the engine's scale-native format is the
    parquet/Iceberg CSR-block table (linkgraph.tables)."""
    if graph.directed:
        rows = graph.edges.select("src", "dst", "weight").collect()
    else:
        e = graph.symmetric_edges().where(F.col("src") <= F.col("dst"))
        rows = e.select("src", "dst", "weight").collect()
    adj: dict = {}
    tadj: dict = {}
    w: dict = {}
    tw: dict = {}
    n = 0
    for r in rows:
        s, d = r["src"], r["dst"]
        adj.setdefault(s, []).append(d)
        w[(s, d)] = r["weight"]
        if graph.directed:
            tadj.setdefault(d, []).append(s)
            tw[(d, s)] = r["weight"]
        n = max(n, s + 1, d + 1)
    chunks = max(1, min(chunks, n) if n else 1)
    per = -(-n // chunks) if n else 0
    lo_hi = [(c * per, min(n, (c + 1) * per)) for c in range(chunks)]

    flags = bytearray((n + 7) // 8)
    for v in range(n):  # engine graphs have no deleted nodes
        flags[v // 8] |= 1 << (v % 8)
    base = bytes(flags) + b"".join(
        lo.to_bytes(8, "little") for lo, _ in lo_hi[1:]
    )

    weights = w if graph.weighted else None
    adj_block, wchunks = _nkb_adj_block(adj, weights, lo_hi)
    if graph.directed:
        tadj_block, twchunks = _nkb_adj_block(tadj, tw if graph.weighted else None, lo_hi)
    else:
        tadj_block, twchunks = b"", []

    def _wblock(wcs: list) -> bytes:
        if not wcs:
            return b""
        return b"".join(len(c).to_bytes(8, "little") for c in wcs) + b"".join(wcs)

    w_block = _wblock(wchunks) if graph.weighted else b""
    tw_block = _wblock(twchunks) if graph.weighted else b""

    off_base = _NKB_HEADER_LEN
    off_adj = off_base + len(base)
    off_tadj = off_adj + len(adj_block) if graph.directed else 0
    pos_after_adj = off_adj + len(adj_block) + len(tadj_block)
    off_w = pos_after_adj if graph.weighted else 0
    off_tw = pos_after_adj + len(w_block) if (graph.weighted and graph.directed) else 0

    features = (1 if graph.directed else 0) | (
        (_NKB_WGHT_DOUBLE if graph.weighted else _NKB_WGHT_NONE) << 1
    )
    head = bytearray(_NKB_MAGIC)
    for v in (0, features, n, chunks, off_base, off_adj, off_tadj, off_w, off_tw, 0, 0):
        head += v.to_bytes(8, "little")
    with open(path, "wb") as f:
        f.write(bytes(head) + base + adj_block + tadj_block + w_block + tw_block)


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """NetworkitBinaryReader scope: parse the nkbg header/base blocks,
    then decode the out-adjacency chunks (each independently decodable
    via the per-chunk size array — the format's parallel-decode hook;
    at fixture scale decode is driver-side like the .gt/Thrill twins).
    Node-existence flags drop edges of absent nodes; weights are read
    from the double-format weight block when the features bitfield says
    the graph is weighted. The directed transpose block is redundant
    with the out block and skipped."""
    raw = _read_binary(spark, path)
    if raw[: len(_NKB_MAGIC)] != _NKB_MAGIC:
        raise ValueError(f"{path}: not a NetworKit binary file (bad magic)")
    vals = [
        int.from_bytes(raw[8 + 8 * i : 16 + 8 * i], "little") for i in range(11)
    ]
    _, features, n, chunks, off_base, off_adj, _, off_w, _, _, _ = vals
    directed = bool(features & 1)
    weighted = (features >> 1) & 0x7 == _NKB_WGHT_DOUBLE

    flags = raw[off_base : off_base + (n + 7) // 8]
    exists = [bool(flags[v // 8] >> (v % 8) & 1) for v in range(n)]
    fv_pos = off_base + (n + 7) // 8
    firsts = [0] + [
        int.from_bytes(raw[fv_pos + 8 * i : fv_pos + 8 * (i + 1)], "little")
        for i in range(chunks - 1)
    ]
    bounds = firsts + [n]

    sizes = [
        int.from_bytes(raw[off_adj + 8 * i : off_adj + 8 * (i + 1)], "little")
        for i in range(chunks)
    ]
    wsizes = []
    if weighted:
        wsizes = [
            int.from_bytes(raw[off_w + 8 * i : off_w + 8 * (i + 1)], "little")
            for i in range(chunks)
        ]
    rows = []
    pos = off_adj + 8 * chunks
    wpos = off_w + 8 * chunks if weighted else 0
    for c in range(chunks):
        end = pos + sizes[c]
        for v in range(bounds[c], bounds[c + 1]):
            deg, pos = _nkb_varint_decode(raw, pos)
            for _ in range(deg):
                u, pos = _nkb_varint_decode(raw, pos)
                wt = 1.0
                if weighted:
                    (wt,) = struct.unpack("<d", raw[wpos : wpos + 8])
                    wpos += 8
                if exists[v] and exists[u]:
                    rows.append((v, u, wt))
        if pos != end:
            raise ValueError(f"{path}: chunk {c} decoded {pos - (end - sizes[c])} bytes, expected {sizes[c]}")
    edges = spark.createDataFrame(rows, "src bigint, dst bigint, weight double")
    return Graph.from_edges(edges, directed=directed, weighted=weighted)
