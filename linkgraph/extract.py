"""Web-page → link-graph extraction (the engine's P0 source path).

Input table (BASELINE.json:15): ``pages(url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING)``. This module provides:

- :func:`synth_pages` — deterministic (seed-driven) synthetic Common-Crawl
  style page table used by tests and benchmarks (no external data).
- :func:`extract_text_pd` — the PINNED pure-pandas text extraction; the
  byte-identical-extracted-text invariant is enforced by frozen sha256
  goldens in tests/test_extract.py. Shared verbatim by the Spark UDF and
  the test oracle so there is exactly one definition of "extracted text".
- :func:`extract_hrefs` / :func:`normalize_url` — vectorized Arrow/pandas
  UDF href extraction (NO per-row Python anywhere, per BASELINE.json:15).
- :func:`pages_to_edges` — full pipeline: scan → pandas-UDF extraction →
  explode → url normalization → dictionary encode → edge table.

Scale notes:
- At 10^12 documents a global dense-rank dictionary is a non-starter (one
  giant sort). ``dictionary_encode(dense=False)`` therefore uses
  ``xxhash64(url)`` as the vertex id — collision-checked per batch scale in
  tests; dense ids are opt-in for fixture-scale NetworKit parity only.
- The extraction UDF is a scalar Arrow pandas UDF: pages stream through
  Python workers in columnar batches; everything after the explode is pure
  JVM expression work (whole-stage codegen).
"""

from __future__ import annotations

import datetime as _dt
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# ---------------------------------------------------------------------------
# Pinned extraction logic (pure pandas; shared by UDF and test oracle)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]+>")
_HREF_RE = re.compile(r'<a\s+href="([^"]*)"', re.IGNORECASE)
_WS_RE = re.compile(r"\s+")


def _decode_pd(html: pd.Series) -> pd.Series:
    """bytes → str, vectorized (``Series.str.decode``); None → "".

    Falls back to the per-element path only for mixed-type input (never
    produced by Spark's BINARY column — the fallback exists for direct
    test calls with unusual series)."""
    try:
        return html.str.decode("utf-8", errors="replace").fillna("")
    except (TypeError, AttributeError):
        return html.apply(
            lambda b: b.decode("utf-8", errors="replace")
            if isinstance(b, (bytes, bytearray))
            else (b or "")
        )


def extract_text_pd(html: pd.Series) -> pd.Series:
    """Visible-text extraction from raw html bytes — THE pinned definition.

    Strip tags, collapse whitespace, trim. Deterministic, byte-identical
    across runs and parallelism levels (pure function of the input bytes).
    """
    s = _decode_pd(html)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip()


def extract_hrefs_pd(html: pd.Series) -> pd.Series:
    """All ``<a href="...">`` targets per page, in document order."""
    return _decode_pd(html).str.findall(_HREF_RE)


_ANCHOR_PAIR_RE = re.compile(
    r'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', re.IGNORECASE | re.DOTALL
)
# \x1e (ASCII record separator) joins (href, anchor) inside one array
# element — it never survives tag-stripped/ws-collapsed anchor text
_PAIR_SEP = "\x1e"


def extract_anchor_pairs_pd(html: pd.Series) -> pd.Series:
    """Per page: list of ``href␞anchor`` strings in document order, where
    anchor = the <a> element's inner text, tag-stripped + whitespace-
    collapsed + trimmed (same cleaning as :func:`extract_text_pd`).
    Vectorized throughout: ``str.extractall`` → vectorized cleaning →
    ``groupby(level=0)`` regroup; no per-row Python."""
    s = _decode_pd(html)
    out = pd.Series([[] for _ in range(len(s))], index=s.index, dtype=object)
    m = s.str.extractall(_ANCHOR_PAIR_RE)
    if len(m):
        # extractall yields NaN (not "") for a group that matched the
        # empty string — an <a> with no inner text is still a reference
        anchor = (
            m[1]
            .fillna("")
            .str.replace(_TAG_RE, " ", regex=True)
            .str.replace(_WS_RE, " ", regex=True)
            .str.strip()
        )
        out.update(
            m[0].fillna("").str.cat(anchor, sep=_PAIR_SEP).groupby(level=0).agg(list)
        )
    return out


_BASE_RE = r"^(https?://[^/]+)(/.*)?$"


def normalize_url_pd(url: pd.Series, base: pd.Series) -> pd.Series:
    """Resolve relative hrefs against the page url; drop fragments/queries.

    Rules (pinned): strip '#...' and '?...'; absolute http(s) urls pass
    through; '/path' joins scheme://host of base; other relative forms join
    the base directory; trailing slash trimmed (except root). Entirely
    vectorized pandas str ops — no per-row Python (BASELINE.json:15); the
    frozen goldens in tests/test_extract.py pin byte-identity with the
    original row-at-a-time definition.
    """
    u = url.fillna("").str.split("#", n=1).str[0].str.split("?", n=1).str[0]
    invalid = u == ""
    is_abs = u.str.startswith("http://") | u.str.startswith("https://")
    bb = base.fillna("").str.extract(_BASE_RE)
    host = bb[0]  # NaN where base is not an absolute http(s) url
    dirpath = bb[1].fillna("/").str.rsplit("/", n=1).str[0]
    joined = np.where(
        u.str.startswith("/"), host + u, host + dirpath + "/" + u
    )  # NaN host propagates → unresolvable relative href → None
    res = pd.Series(np.where(is_abs, u, joined), index=url.index, dtype=object)
    trim = (res.str.len() > len("https://")) & res.str.endswith("/")
    res = res.where(~trim.fillna(False).astype(bool), res.str.rstrip("/"))
    return res.where(res.notna() & ~invalid, None)


# ---------------------------------------------------------------------------
# Spark-side vectorized UDFs
# ---------------------------------------------------------------------------

extract_text = F.pandas_udf(extract_text_pd, T.StringType())
extract_hrefs = F.pandas_udf(extract_hrefs_pd, T.ArrayType(T.StringType()))
normalize_url = F.pandas_udf(normalize_url_pd, T.StringType())
extract_anchor_pairs = F.pandas_udf(extract_anchor_pairs_pd, T.ArrayType(T.StringType()))


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

def dictionary_encode(
    pages_urls: DataFrame, dense: bool = False
) -> DataFrame:
    """url → vertex-id dictionary ``(url, id)``.

    dense=False (default, the at-scale path): id = xxhash64(url) — no global
    sort, embarrassingly parallel, stable across cluster sizes. dense=True:
    0..n-1 via a sort window (fixture-scale parity only).
    """
    urls = pages_urls.select("url").distinct()
    if dense:
        from pyspark.sql import Window

        return urls.select(
            "url", (F.row_number().over(Window.orderBy("url")) - 1).cast("bigint").alias("id")
        )
    return urls.select("url", F.xxhash64("url").alias("id"))


def pages_to_edges(pages: DataFrame, dense_ids: bool = False) -> tuple[DataFrame, DataFrame]:
    """pages → (edges(src, dst, weight), dictionary(url, id)).

    Plan shape: scan(url, html) → pandas-UDF hrefs → explode → normalize →
    join dictionary on src url → join dictionary on dst url (hrefs to urls
    outside the crawl are DROPPED by the inner join) → groupBy dedup with
    multiplicity as weight. Column pruning pushes (url, html) into the scan.
    """
    dictionary = dictionary_encode(pages, dense=dense_ids)
    links = (
        pages.select("url", extract_hrefs(F.col("html")).alias("hrefs"))
        .select("url", F.explode("hrefs").alias("href"))
        .select("url", normalize_url(F.col("href"), F.col("url")).alias("dst_url"))
        .where(F.col("dst_url").isNotNull())
    )
    edges = (
        links.join(dictionary.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst"), "dst_url")
        .join(dictionary.withColumnRenamed("id", "src"), "url")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    return edges, dictionary


def anchor_text_table(pages: DataFrame) -> DataFrame:
    """(dst_url, anchor, n_refs, n_src_pages) — the anchor-text table:
    for every link target, each distinct anchor string pointing at it,
    with total reference count and the number of distinct referring
    pages. The web-search / webtext-pipeline primitive for target-side
    document augmentation ("what the web calls this page") and anchor-
    spam signals (one page repeating an anchor vs many pages agreeing).

    Plan: scan(url, html) → pandas-UDF (href, anchor) pairs → explode →
    split on the record separator → normalize href against the page url
    (dangling targets are KEPT — anchor text is most valuable precisely
    for pages outside the crawl) → one hash-agg on (dst_url, anchor).
    """
    pairs = pages.select(
        "url", F.explode(extract_anchor_pairs(F.col("html"))).alias("pair")
    ).select(
        "url",
        F.split(F.col("pair"), _PAIR_SEP, 2).alias("ha"),
    )
    resolved = pairs.select(
        "url",
        normalize_url(F.col("ha").getItem(0), F.col("url")).alias("dst_url"),
        F.col("ha").getItem(1).alias("anchor"),
    ).where(F.col("dst_url").isNotNull())
    return resolved.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("n_refs"),
        F.count_distinct("url").alias("n_src_pages"),
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic pages table (seeded; no external data)
# ---------------------------------------------------------------------------

def synth_pages(spark: SparkSession, n_pages: int = 500, seed: int = 42, n_domains: int = 20) -> DataFrame:
    """Synthesize a Common-Crawl-style pages table per FIXTURES.md §1.

    Zipf-ish domain popularity gives built-in hub skew: most hrefs point at
    pages of low-index domains. Includes the FIXTURES.md edge cases: a page
    with zero hrefs, duplicate hrefs, a self-link, a dangling href to a url
    outside the table, relative/fragment/query href forms, an empty html
    page, and non-en pages.
    """
    rng = np.random.default_rng(seed)
    # domain popularity ~ Zipf over n_domains
    ranks = np.arange(1, n_domains + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    page_domain = rng.integers(0, n_domains, size=n_pages)

    def url_of(i: int) -> str:
        return f"https://d{page_domain[i]}.example.org/p{i}"

    rows = []
    epoch = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
    langs = ["de", "fr", "es"]
    for i in range(n_pages):
        n_links = int(rng.integers(3, 41))
        targets = rng.choice(n_pages, size=n_links, p=None, replace=True)
        # bias targets toward hub domains: re-sample half via domain-zipf
        hub_n = n_links // 2
        hub_domains = rng.choice(n_domains, size=hub_n, p=probs)
        hub_pages = [int(x) for d in hub_domains for x in np.flatnonzero(page_domain == d)[:1]]
        tgt = list(targets[: n_links - len(hub_pages)]) + hub_pages
        anchors = []
        for j, t in enumerate(tgt):
            href = url_of(int(t))
            if i % 97 == 3 and j == 0:
                href = f"/p{int(t)}"  # relative form
            if i % 89 == 5 and j == 1:
                href = href + "#frag"
            if i % 83 == 7 and j == 2:
                href = href + "?q=1"
            anchors.append(f'<a href="{href}">link{j}</a>')
        if i % 101 == 11:
            anchors.append(f'<a href="{url_of(i)}">self</a>')  # self-link
        if i % 103 == 13 and anchors:
            anchors.append(anchors[0])  # duplicate href
        if i % 107 == 17:
            anchors.append('<a href="https://offsite.example.net/x">off</a>')  # dangling
        if i % 109 == 19:
            anchors = []  # zero-href page (PageRank sink)
        body = " ".join(
            f"paragraph {i} token{k} value{(i * 31 + k) % 1000}" for k in range(int(rng.integers(5, 30)))
        )
        html = f"<html><body><p>{body}</p>" + "".join(anchors) + "</body></html>"
        if i % 113 == 23:
            html = ""  # empty page
        lang = "en" if (i % 37) > 3 else langs[i % 3]
        rows.append(
            (
                url_of(i),
                epoch + _dt.timedelta(seconds=137 * i),
                html.encode("utf-8"),
                None,  # text filled below via the pinned extraction
                lang,
            )
        )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("text", extract_text(F.col("html")))
