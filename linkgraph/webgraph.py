"""Host/domain-level web graph — the contraction tier above the page graph.

Public-knowledge anchors (REF⚠, no internal systems): host- and
domain-level webgraphs are the standard aggregation in web IR — Broder
et al. "Graph structure in the Web" (WWW 2000) analyze the host graph;
the Common Crawl webgraph releases ship page-, host- and
registered-domain-level graphs; host-level PageRank / spam mass
(Gyöngyi et al., VLDB 2004) are computed on exactly this contraction.

Spark shape: everything here is one extraction pass (already
pandas-UDF-vectorized in :mod:`linkgraph.extract`) followed by
expression-only host parsing and ONE hash aggregation on
(src_host, dst_host) — no window, no driver loop. The host graph is
O(#hosts) ≪ O(#pages), so every downstream algorithm (PageRank, HITS,
components) gets a ~3-orders-of-magnitude smaller input; at 100 TB the
contraction is the scan + one shuffle on the host-pair key, and host
keys are low-cardinality enough that the result usually fits in
broadcast range for joining back against the page table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from linkgraph.extract import extract_hrefs, normalize_url
from linkgraph.graph import Graph

__all__ = [
    "host_of",
    "registered_domain",
    "host_links",
    "host_edges",
    "host_graph",
    "host_rank",
    "host_stats",
]


# Heuristic two-level public suffixes (a deterministic, documented subset —
# the full Mozilla PSL is data, not code; swap in a broadcast lookup table
# for production). Alternation tried FIRST so "bbc.co.uk" → "bbc.co.uk",
# not "co.uk".
_TWO_LEVEL = "co|com|net|org|ac|gov|edu"
_REG_DOMAIN_RE = (
    rf"([^.]+\.(?:{_TWO_LEVEL})\.[a-z][a-z]$|[^.]+\.[^.]+$)"
)


def host_of(url: Column) -> Column:
    """Lower-cased host of an absolute http(s) URL (port/path/query
    stripped); NULL for non-absolute/empty input. One regexp expression —
    stays in whole-stage codegen."""
    h = F.regexp_extract(F.lower(url), r"^https?://([^/:?#]+)", 1)
    return F.when(h == "", None).otherwise(h)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a host: last two labels, or last
    three when the trailing two are a known two-level public suffix
    (co.uk, com.au, …). Heuristic subset of the PSL, documented above."""
    d = F.regexp_extract(host, _REG_DOMAIN_RE, 1)
    return F.when(d == "", host).otherwise(d)


def host_links(pages: DataFrame, by_domain: bool = False) -> DataFrame:
    """(src_host, dst_host) — one row per extracted+normalized link whose
    BOTH endpoints parse to a host. Dangling targets are KEPT (unlike the
    page-graph inner join): the host graph is precisely where out-of-crawl
    structure is still meaningful. ``by_domain`` contracts one level
    further to registered domains."""
    links = (
        pages.select("url", extract_hrefs(F.col("html")).alias("hrefs"))
        .select("url", F.explode("hrefs").alias("href"))
        .select("url", normalize_url(F.col("href"), F.col("url")).alias("dst_url"))
        .where(F.col("dst_url").isNotNull())
    )
    sh = host_of(F.col("url"))
    dh = host_of(F.col("dst_url"))
    if by_domain:
        sh, dh = registered_domain(sh), registered_domain(dh)
    return links.select(sh.alias("src_host"), dh.alias("dst_host")).where(
        F.col("src_host").isNotNull() & F.col("dst_host").isNotNull()
    )


def host_edges(
    pages: DataFrame, keep_intra: bool = False, by_domain: bool = False
) -> DataFrame:
    """(src_host, dst_host, weight) — the contracted host graph's weighted
    edge list; weight = number of page-level links between the host pair.
    Intra-host links (the vast majority on the real web — nav bars) are
    dropped by default; ``keep_intra=True`` keeps them as self-loops."""
    hl = host_links(pages, by_domain=by_domain)
    if not keep_intra:
        hl = hl.where(F.col("src_host") != F.col("dst_host"))
    return hl.groupBy("src_host", "dst_host").agg(
        F.count("*").cast("double").alias("weight")
    )


def host_graph(
    pages: DataFrame, keep_intra: bool = False, by_domain: bool = False
) -> tuple[Graph, DataFrame]:
    """(Graph over xxhash64(host) ids, dictionary(host, id)). Hash ids —
    no global sort, stable across cluster sizes (same discipline as
    :func:`linkgraph.extract.dictionary_encode`)."""
    e = host_edges(pages, keep_intra=keep_intra, by_domain=by_domain)
    dictionary = (
        e.select(F.col("src_host").alias("host"))
        .unionAll(e.select("dst_host"))
        .distinct()
        .select("host", F.xxhash64("host").alias("id"))
    )
    edges = (
        e.join(dictionary.withColumnRenamed("host", "src_host"), "src_host")
        .withColumnRenamed("id", "src")
        .join(dictionary.withColumnRenamed("host", "dst_host"), "dst_host")
        .withColumnRenamed("id", "dst")
        .select("src", "dst", "weight")
    )
    return Graph.from_edges(edges, directed=True, weighted=True), dictionary


def host_rank(
    pages: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    by_domain: bool = False,
) -> DataFrame:
    """(host, rank) — PageRank over the contracted host graph (link
    multiplicities between a host pair collapse to ONE unweighted edge,
    the convention of host-level rank: a million nav links shouldn't be a
    million votes). The classic crawl-prioritization / site-authority
    score; TrustRank-style seeding composes via
    :func:`linkgraph.algs.pagerank.pagerank`'s ``teleport``."""
    from linkgraph.algs.pagerank import pagerank

    g, dictionary = host_graph(pages, by_domain=by_domain)
    pr = pagerank(
        g.to_unweighted(), damping=damping, tol=tol, max_iter=max_iter,
        distribute_sinks=True,
    )
    return pr.join(dictionary, "id").select("host", "rank")


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host crawl stats: (host, n_pages, out_links, intra_links,
    n_dst_hosts) — the site-level quality/spam signal block (a host whose
    out-links are 99% intra, or that fans out to thousands of hosts, is a
    different beast than a host with balanced linkage)."""
    hp = pages.select(host_of(F.col("url")).alias("host")).where(
        F.col("host").isNotNull()
    )
    n_pages = hp.groupBy("host").agg(F.count("*").alias("n_pages"))
    hl = host_links(pages)
    out = hl.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_links"),
        F.sum(
            (F.col("src_host") == F.col("dst_host")).cast("long")
        ).alias("intra_links"),
        F.count_distinct(
            F.when(F.col("dst_host") != F.col("src_host"), F.col("dst_host"))
        ).alias("n_dst_hosts"),
    )
    return n_pages.join(out, "host", "left").select(
        "host",
        "n_pages",
        F.coalesce("out_links", F.lit(0)).alias("out_links"),
        F.coalesce("intra_links", F.lit(0)).alias("intra_links"),
        F.coalesce("n_dst_hosts", F.lit(0)).alias("n_dst_hosts"),
    )
