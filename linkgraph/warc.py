"""WARC (ISO 28500) pages source/sink — the webtext-native ingest format.

Public-knowledge anchors (REF⚠, no internal systems): the WARC 1.0/1.1
record grammar (``WARC/1.0`` magic, CRLF header block, ``Content-Length``
octet count, two-CRLF record terminator) is ISO 28500 / the IIPC WARC
specification; Common Crawl publishes its corpus in exactly this shape
(response records whose payload is an HTTP/1.1 message).

Two readers, two scale stories:

- :func:`read_warc` (fast path) — ``spark.read.text`` with the record
  magic as a multi-character ``lineSep``. The Hadoop line reader splits
  UNCOMPRESSED warc files at arbitrary byte offsets and scans to the next
  delimiter, so a single 100-GB warc parallelizes across executors with
  NO per-file ceiling; parsing is then pure expression work (regexps in
  whole-stage codegen). Caveats, documented not hidden: payloads that
  themselves contain the magic sequence split early (vanishingly rare in
  text corpora, impossible in our fixtures), and a trailing CR/LF run of
  the record terminator is stripped from the body rather than honoring
  ``Content-Length`` octet-exactly.
- :func:`read_warc_strict` — ``binaryFile`` source + Arrow-batched
  ``mapInPandas``; walks each file's bytes honoring ``Content-Length``
  exactly, so arbitrary binary payloads are safe. Parallelism is
  per-file (the right story for ``.warc.gz`` anyway, whose gzip members
  don't split); this is the documented slow-but-exact path.

:func:`write_warc` emits spec-shaped response records (minimal HTTP/1.1
envelope, octet-correct Content-Length) for round-trips and fixtures.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_warc", "read_warc_strict", "write_warc", "WARC_MAGIC"]

WARC_MAGIC = "WARC/1.0\r\n"


def _header(hdr, name: str):
    # (?i) case-insensitive field names per spec; (?m)^ anchors each line.
    # ``hdr`` must be the WARC header BLOCK only (text before the first
    # blank line) — running these regexps over the whole record would let
    # payload text that happens to contain "WARC-Target-URI: …" lines
    # masquerade as header values.
    return F.nullif(
        F.regexp_extract(hdr, rf"(?im)^{name}:\s*(\S+)", 1), F.lit("")
    )


def read_warc(spark: SparkSession, path: str, version: str = "1.0") -> DataFrame:
    """(url, warc_type, warc_date, http_status, html) — fast splittable
    reader (see module docstring for the fast-vs-strict contract).

    ``html`` is the HTTP message body for response records (HTTP header
    block stripped), the raw payload otherwise; the record-terminator
    CR/LF run is trimmed. Non-record preamble pieces are dropped.

    ``version`` selects the record magic ("1.0" or "1.1") — the Hadoop
    line reader takes exactly ONE delimiter, so a file mixing WARC
    versions needs :func:`read_warc_strict` (which matches both).
    ``http_status`` is null when the status line is malformed (the
    extract is guarded — an unguarded cast('' as int) aborts the scan
    under ANSI mode)."""
    magic = f"WARC/{version}\r\n"
    raw = spark.read.option("lineSep", magic).text(path)
    rec = F.col("value")
    hdr = F.substring_index(rec, "\r\n\r\n", 1)
    payload = F.regexp_replace(rec, r"(?s)^.*?\r\n\r\n", "")
    is_http = payload.startswith("HTTP/")
    body = F.when(
        is_http, F.regexp_replace(payload, r"(?s)^.*?\r\n\r\n", "")
    ).otherwise(payload)
    body = F.regexp_replace(body, r"(?s)(\r\n|\n)+$", "")
    status_txt = F.regexp_extract(payload, r"^HTTP/[0-9.]+\s+(\d+)", 1)
    return (
        raw.where(rec.contains("\r\n\r\n"))
        .select(
            _header(hdr, "WARC-Target-URI").alias("url"),
            _header(hdr, "WARC-Type").alias("warc_type"),
            _header(hdr, "WARC-Date").alias("warc_date"),
            F.when(is_http, F.nullif(status_txt, F.lit("")).cast("int")).alias(
                "http_status"
            ),
            body.alias("html"),
        )
    )


def read_warc_strict(spark: SparkSession, path: str) -> DataFrame:
    """Content-Length-exact WARC reader over the binaryFile source —
    per-file parallelism, arbitrary payload bytes safe. Same columns as
    :func:`read_warc`; ``html`` is utf-8-decoded with replacement.

    Handles ``.warc.gz`` transparently (gzip magic sniffed per file;
    GzipFile reads across the per-record gzip members Common Crawl
    writes) and matches BOTH WARC/1.0 and WARC/1.1 record magics."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches) -> Iterator:
        import gzip
        import io

        import pandas as pd

        magics = (b"WARC/1.0\r\n", b"WARC/1.1\r\n")

        def find_magic(data: bytes, start: int) -> int:
            hits = [j for j in (data.find(m, start) for m in magics) if j != -1]
            return min(hits) if hits else -1

        for pdf in batches:
            out = {k: [] for k in ("url", "warc_type", "warc_date", "http_status", "html")}
            for content in pdf["content"]:
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":  # gzip (possibly multi-member)
                    data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
                i = find_magic(data, 0)
                while i != -1:
                    h_end = data.find(b"\r\n\r\n", i)
                    if h_end == -1:
                        break
                    headers = data[i + 10: h_end].decode("utf-8", "replace")  # both magics are 10 bytes
                    fields = {}
                    for line in headers.split("\r\n"):
                        if ":" in line:
                            k, v = line.split(":", 1)
                            fields[k.strip().lower()] = v.strip()
                    n = int(fields.get("content-length", "0"))
                    payload = data[h_end + 4: h_end + 4 + n]
                    status = None
                    if payload.startswith(b"HTTP/"):
                        sp = payload.split(b"\r\n", 1)[0].split()
                        status = int(sp[1]) if len(sp) > 1 and sp[1].isdigit() else None
                        b_start = payload.find(b"\r\n\r\n")
                        payload = payload[b_start + 4:] if b_start != -1 else b""
                    out["url"].append(fields.get("warc-target-uri"))
                    out["warc_type"].append(fields.get("warc-type"))
                    out["warc_date"].append(fields.get("warc-date"))
                    out["http_status"].append(status)
                    out["html"].append(payload.decode("utf-8", "replace"))
                    i = find_magic(data, h_end + 4 + n)
            yield pd.DataFrame(out)

    return files.select("content").mapInPandas(
        parse,
        schema="url string, warc_type string, warc_date string, "
        "http_status int, html string",
    )


def write_warc(
    pages: DataFrame,
    path: str,
    url_col: str = "url",
    html_col: str = "html",
    date_col: str | None = "warc_ts",
) -> None:
    """Write spec-shaped WARC response records (HTTP/1.1 200 envelope,
    octet-correct Content-Length, two-CRLF terminator). ``html`` may be
    string or binary; ``date_col`` (timestamp) is optional. One text part
    file per partition — records never split across rows because the row
    separator is part of the record terminator the readers strip."""
    html = F.col(html_col)
    html_s = html.cast("string")
    date = (
        F.date_format(F.col(date_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if date_col and date_col in pages.columns
        else F.lit("2026-01-01T00:00:00Z")
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "),
        F.octet_length(html_s).cast("string"),
        F.lit("\r\n\r\n"),
        html_s,
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        date,
        F.lit("\r\nContent-Type: application/http;msgtype=response"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),  # spec record terminator (the text sink's own \n follows)
    )
    pages.select(record.alias("value")).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# CDX index surface (pywb CDXJ convention; the Common Crawl index shape)
# ---------------------------------------------------------------------------


def surt_key(url) -> "F.Column":
    """SURT (Sort-friendly URI Reordering Transform) key of a URL — the
    canonical index key of CDX files: host reversed comma-wise and
    lowercased, port/scheme/www dropped, path lowercased;
    ``http://www.Example.com:80/Path?q=1`` → ``com,example)/path?q=1``.
    Pure expressions (split/reverse/concat), no UDF; pair with
    linkgraph.crawl.canonicalize_url for full URL hygiene first."""
    u = F.lower(url.cast("string"))
    rest = F.regexp_replace(u, r"^https?://", "")
    hostport = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = rest.substr(F.length(hostport) + 1, F.lit(1 << 30))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev, F.lit(")"), F.when(path == "", F.lit("/")).otherwise(path)
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """Read CDXJ index lines — ``<surt key> <14-digit timestamp>
    <json fields>`` — into (surt, ts, url, status, mime, digest, length,
    offset, filename). Splittable text scan + one from_json; the json
    block is pywb's standard field set (missing fields null)."""
    lines = spark.read.text(path).where(F.col("value") != "")
    key = F.regexp_extract("value", r"^(\S+)", 1)
    ts = F.regexp_extract("value", r"^\S+ (\d{14})", 1)
    js = F.regexp_extract("value", r"^\S+ \d{14} (.*)$", 1)
    schema = (
        "url string, status string, mime string, digest string, "
        "length string, offset string, filename string"
    )
    parsed = lines.select(
        key.alias("surt"),
        ts.alias("ts"),
        F.from_json(js, schema).alias("j"),
    )
    return parsed.select(
        "surt",
        "ts",
        F.col("j.url").alias("url"),
        F.col("j.status").cast("int").alias("status"),
        F.col("j.mime").alias("mime"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("bigint").alias("length"),
        F.col("j.offset").cast("bigint").alias("offset"),
        F.col("j.filename").alias("filename"),
    )


def write_cdxj(index: DataFrame, path: str) -> None:
    """Write (surt, ts, url, status, mime, digest, length, offset,
    filename) as sorted CDXJ lines (single file: an index is consumed by
    binary search, so the fixture-scale writer emits one sorted shard; at
    scale write per-prefix shards by range-partitioning on surt first)."""
    js = F.to_json(
        F.struct(
            F.col("url"),
            F.col("status").cast("string").alias("status"),
            "mime",
            "digest",
            F.col("length").cast("string").alias("length"),
            F.col("offset").cast("string").alias("offset"),
            "filename",
        )
    )
    (
        index.select(
            F.concat_ws(" ", F.col("surt"), F.col("ts"), js).alias("value")
        )
        .orderBy("value")
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
