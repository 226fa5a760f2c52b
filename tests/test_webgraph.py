import re

import pytest
from pyspark.sql import functions as F

from linkgraph.webgraph import (
    host_edges,
    host_graph,
    host_links,
    host_of,
    host_rank,
    host_stats,
    registered_domain,
)


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-webgraph")


@pytest.fixture(scope="module")
def pages(spark):
    from linkgraph.extract import synth_pages

    return synth_pages(spark, n_pages=120, seed=42).persist()


def _col(spark, expr, values):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.y for r in df.select(expr(F.col("x")).alias("y")).collect()]


def test_host_of(spark):
    got = _col(
        spark,
        host_of,
        [
            "https://Example.COM/path?q=1",
            "http://a.b.c:8080/x",
            "https://plain.org",
            "/relative/only",
            "",
            "ftp://not.http/x",
        ],
    )
    assert got == ["example.com", "a.b.c", "plain.org", None, None, None]


def test_registered_domain(spark):
    got = _col(
        spark,
        registered_domain,
        [
            "www.bbc.co.uk",
            "news.bbc.co.uk",
            "a.b.example.com",
            "example.com",
            "sub.site.com.au",
            "localhost",
        ],
    )
    assert got == [
        "bbc.co.uk",
        "bbc.co.uk",
        "example.com",
        "example.com",
        "site.com.au",
        "localhost",
    ]


def _tiny_pages(spark):
    def html(*hrefs):
        return ("".join(f'<a href="{h}">x</a>' for h in hrefs)).encode()

    rows = [
        # a.com/1 → b.com twice (weight 2), self-host link (intra), dangling host c.net
        ("https://a.com/1", html("https://b.com/x", "https://b.com/y",
                                 "https://a.com/2", "https://c.net/z")),
        ("https://a.com/2", html("https://b.com/x")),
        ("https://b.com/x", html("/local", "https://a.com/1")),
        ("https://b.com/y", html()),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_host_edges_exact(spark):
    p = _tiny_pages(spark)
    got = {
        (r.src_host, r.dst_host): r.weight for r in host_edges(p).collect()
    }
    # intra-host (a.com→a.com, b.com→b.com via /local) dropped by default
    assert got == {
        ("a.com", "b.com"): 3.0,
        ("a.com", "c.net"): 1.0,
        ("b.com", "a.com"): 1.0,
    }
    with_intra = {
        (r.src_host, r.dst_host): r.weight
        for r in host_edges(p, keep_intra=True).collect()
    }
    assert with_intra[("a.com", "a.com")] == 1.0
    assert with_intra[("b.com", "b.com")] == 1.0  # relative /local resolves


def test_host_links_independent_recompute(spark, pages):
    # independent regex re-extraction of the synthetic corpus (the pytest
    # analogue of the DuckDB oracle): host pairs must match exactly
    rows = pages.select("url", "html").collect()
    exp = {}
    for r in rows:
        html = (r.html or b"").decode()
        base = re.match(r"^(https?://[^/]+)", r.url).group(1)
        for href in re.findall(r'<a\s+href="([^"]*)"', html):
            u = href.split("#")[0].split("?")[0]
            if not u:
                continue
            if u.startswith("http://") or u.startswith("https://"):
                dst = u
            elif u.startswith("/"):
                dst = base + u
            else:
                continue  # synth corpus has no other relative forms
            if len(dst) > 8 and dst.endswith("/"):
                dst = dst.rstrip("/")
            sh = re.match(r"^https?://([^/:?#]+)", r.url.lower()).group(1)
            dh = re.match(r"^https?://([^/:?#]+)", dst.lower())
            if dh:
                exp[(sh, dh.group(1))] = exp.get((sh, dh.group(1)), 0) + 1
    got = {
        (r.src_host, r.dst_host): r.n
        for r in host_links(pages)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_host_graph_and_rank(spark, pages):
    g, d = host_graph(pages)
    n_hosts = d.count()
    assert g.nodes().count() == n_hosts
    ranks = host_rank(pages, tol=0.0, max_iter=20).collect()
    assert len(ranks) == n_hosts
    assert sum(r.rank for r in ranks) == pytest.approx(1.0, abs=1e-6)
    # zipf bias: d0 (most popular target domain) outranks the median host
    by_host = {r.host: r.rank for r in ranks}
    med = sorted(by_host.values())[len(by_host) // 2]
    assert by_host["d0.example.org"] > med


def test_host_stats(spark, pages):
    st = {r.host: r for r in host_stats(pages).collect()}
    assert sum(r.n_pages for r in st.values()) == 120
    hl = host_links(pages)
    assert sum(r.out_links for r in st.values()) == hl.count()
    inter = hl.where(F.col("src_host") != F.col("dst_host")).count()
    assert sum(r.out_links - r.intra_links for r in st.values()) == inter
    for r in st.values():
        assert r.n_dst_hosts <= r.out_links - r.intra_links


def test_by_domain_contracts(spark):
    def html(*hrefs):
        return ("".join(f'<a href="{h}">x</a>' for h in hrefs)).encode()

    rows = [
        ("https://news.bbc.co.uk/1", html("https://sport.bbc.co.uk/x",
                                          "https://example.com/y")),
        ("https://sport.bbc.co.uk/x", html("https://example.com/y")),
    ]
    p = spark.createDataFrame(rows, "url string, html binary")
    got = {
        (r.src_host, r.dst_host): r.weight
        for r in host_edges(p, by_domain=True).collect()
    }
    # news→sport collapses to intra-domain (dropped); both → example.com
    assert got == {("bbc.co.uk", "example.com"): 2.0}
