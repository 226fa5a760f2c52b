"""WARC source/sink: round-trip, fast ≡ strict parity, edge payloads."""

from __future__ import annotations

import pyspark.sql.functions as F

from linkgraph.extract import synth_pages
from linkgraph.warc import read_warc, read_warc_strict, write_warc


def _md5(col):
    return F.md5(F.encode(col, "utf-8"))


def test_roundtrip_and_parity(spark, tmp_path):
    pages = synth_pages(spark, 80, seed=7).select("url", "warc_ts", "html")
    out = str(tmp_path / "rt")
    write_warc(pages, out)
    fast = read_warc(spark, out).cache()
    strict = read_warc_strict(spark, out).cache()
    assert fast.count() == 80 and strict.count() == 80
    assert fast.select("warc_type").distinct().collect()[0].warc_type == "response"
    assert fast.select("http_status").distinct().collect()[0].http_status == 200
    j = fast.select("url", _md5("html").alias("h1")).join(
        strict.select("url", _md5("html").alias("h2")), "url"
    )
    assert j.where(F.col("h1") != F.col("h2")).count() == 0
    # round-trip: decoded bodies byte-identical to the source html
    j2 = pages.select("url", F.md5("html").alias("h0")).join(
        fast.select("url", _md5("html").alias("h1")), "url"
    )
    assert j2.where(F.col("h0") != F.col("h1")).count() == 0
    assert j2.count() == 80  # includes the empty-html pages


def test_strict_handles_magic_in_payload(spark, tmp_path):
    """A payload containing the record magic splits the fast path early
    (documented caveat) but parses exactly under Content-Length."""
    evil = "before WARC/1.0\r\n after"
    df = spark.createDataFrame([("http://e.com/x", evil)], ["url", "html"])
    out = str(tmp_path / "evil")
    write_warc(df, out, date_col=None)
    got = read_warc_strict(spark, out).collect()
    assert len(got) == 1 and got[0].html == evil
    # fast path: record count inflates — the documented tradeoff
    assert read_warc(spark, out).count() >= 1


def test_date_header_and_resource_payload(spark, tmp_path):
    pages = synth_pages(spark, 5, seed=3).select("url", "warc_ts", "html")
    out = str(tmp_path / "dated")
    write_warc(pages, out)
    row = read_warc(spark, out).where(F.col("warc_date").isNotNull()).first()
    assert row.warc_date.endswith("Z") and "T" in row.warc_date


# ---------------------------------------------------------------------------
# SURT + CDXJ (round-3 session-3 additions)
# ---------------------------------------------------------------------------


def test_surt_key_forms(spark):
    from linkgraph.warc import surt_key

    cases = {
        "http://www.Example.com:80/Path?q=1": "com,example)/path?q=1",
        "https://sub.host.org/": "org,host,sub)/",
        "http://example.com": "com,example)/",
        "https://a.b.c.de/x/y": "de,c,b,a)/x/y",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.k for r in df.select("url", surt_key(F.col("url")).alias("k")).collect()}
    assert got == cases


def test_cdxj_roundtrip(spark, tmp_path):
    from linkgraph.warc import read_cdxj, surt_key, write_cdxj

    rows = [
        ("com,example)/a", "20240101120000", "http://example.com/a", 200,
         "text/html", "sha1:AAAA", 1234, 0, "crawl-00.warc.gz"),
        ("org,test)/", "20240102130000", "https://test.org/", 301,
         "text/html", "sha1:BBBB", 55, 4096, "crawl-01.warc.gz"),
    ]
    idx = spark.createDataFrame(
        rows,
        "surt string, ts string, url string, status int, mime string, "
        "digest string, length bigint, offset bigint, filename string",
    )
    path = str(tmp_path / "cdx")
    write_cdxj(idx, path)
    back = read_cdxj(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # surt of the url column reproduces the key for simple urls
    joined = back.select("surt", surt_key(F.col("url")).alias("k")).collect()
    assert all(r.surt == r.k for r in joined)


def test_strict_reads_gzip_multimember(spark, tmp_path):
    """.warc.gz per-record gzip members (the Common Crawl layout) read
    transparently by the strict reader."""
    import glob
    import gzip
    import os

    pages = synth_pages(spark, 5, seed=3)
    plain = str(tmp_path / "plain")
    write_warc(pages, plain)
    raw = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(plain + "/part-*"))
    )
    # split into two gzip members at a record boundary (multi-member)
    cut = raw.find(b"WARC/1.0\r\n", 10)
    gzdir = str(tmp_path / "gz")
    os.makedirs(gzdir)
    with open(gzdir + "/crawl.warc.gz", "wb") as f:
        f.write(gzip.compress(raw[:cut]) + gzip.compress(raw[cut:]))
    got = read_warc_strict(spark, gzdir)
    assert got.count() == 5
    plain_md5 = {
        (r.url, r.html) for r in read_warc_strict(spark, plain).collect()
    }
    assert {(r.url, r.html) for r in got.collect()} == plain_md5


def test_warc_11_magic_both_readers(spark, tmp_path):
    body = "<html>v11</html>"
    rec = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://x.org/a\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n" + body + "\r\n\r\n"
    )
    import os

    d = str(tmp_path / "w11")
    os.makedirs(d)
    with open(d + "/f.warc", "w", newline="") as f:
        f.write(rec)
    strict = read_warc_strict(spark, d).collect()
    assert len(strict) == 1 and strict[0].html == body
    fast = read_warc(spark, d, version="1.1").collect()
    assert len(fast) == 1 and fast[0].url == "http://x.org/a"


def test_fast_reader_malformed_status_and_header_spoof(spark, tmp_path):
    """A garbled HTTP status line must yield a NULL status (not an ANSI
    cast abort), and WARC-looking lines inside the payload must not leak
    into header columns."""
    import os

    payload = "HTTP/1.1 OK\r\n\r\nWARC-Target-URI: http://evil.example/\r\nbody"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://real.example/page\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n" + payload + "\r\n\r\n"
    )
    d = str(tmp_path / "mal")
    os.makedirs(d)
    with open(d + "/f.warc", "w", newline="") as f:
        f.write(rec)
    rows = read_warc(spark, d).collect()
    assert len(rows) == 1
    assert rows[0].http_status is None
    assert rows[0].url == "http://real.example/page"
