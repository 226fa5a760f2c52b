"""Extraction: byte-identical goldens, href normalization, pipeline edge cases."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.extract import (
    dictionary_encode,
    extract_hrefs_pd,
    extract_text_pd,
    normalize_url_pd,
    pages_to_edges,
    synth_pages,
)

# frozen goldens: sha256 of the pinned extraction for fixed inputs — the
# byte-identical invariant (BASELINE.json:15). If extraction logic changes,
# these MUST be consciously re-frozen.
GOLDEN = {
    b"<html><body><p>hello  world</p><a href=\"x\">y</a></body></html>": (
        "d667b67c00b9321e2eef39efa8b2fbe744ef30c7995ac515697e9a9ea930d323"
    ),
    b"": "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
}


def test_extraction_goldens():
    for raw, want in GOLDEN.items():
        out = extract_text_pd(pd.Series([raw]))[0]
        assert hashlib.sha256(out.encode()).hexdigest() == want, (raw, out)


def test_extract_text_strips_tags_and_ws():
    s = extract_text_pd(pd.Series([b"<p>a</p>\n\n<b> b </b>  c"]))
    assert s[0] == "a b c"


def test_extract_hrefs_order_and_dupes():
    html = b'<a href="u1">x</a><p>t</p><a href="u2">y</a><a href="u1">z</a>'
    assert list(extract_hrefs_pd(pd.Series([html]))[0]) == ["u1", "u2", "u1"]


def test_normalize_url_forms():
    base = pd.Series(["https://d1.example.org/a/b"] * 6)
    urls = pd.Series(
        [
            "https://x.org/p1",        # absolute
            "/root",                   # host-relative
            "rel",                     # path-relative
            "https://x.org/p#frag",    # fragment stripped
            "https://x.org/p?q=1",     # query stripped
            "",                        # empty → None
        ]
    )
    out = list(normalize_url_pd(urls, base))
    assert out == [
        "https://x.org/p1",
        "https://d1.example.org/root",
        "https://d1.example.org/a/rel",
        "https://x.org/p",
        "https://x.org/p",
        None,
    ]


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_pages=120, seed=42).persist()


def test_synth_pages_deterministic(spark, pages):
    again = synth_pages(spark, n_pages=120, seed=42)
    a = {r.url: r.text for r in pages.collect()}
    b = {r.url: r.text for r in again.collect()}
    assert a == b


def test_pages_to_edges_drops_offsite(spark, pages):
    edges, dic = pages_to_edges(pages)
    assert dic.count() == 120
    # every endpoint id resolves back to an in-crawl url
    ids = {r.id for r in dic.collect()}
    for r in edges.select("src", "dst").collect():
        assert r.src in ids and r.dst in ids


def test_duplicate_hrefs_become_weight(spark, pages):
    edges, dic = pages_to_edges(pages)
    assert edges.where(F.col("weight") > 1.0).count() > 0


def test_dense_vs_hash_ids(spark, pages):
    hashed = dictionary_encode(pages, dense=False)
    dense = dictionary_encode(pages, dense=True)
    assert hashed.count() == dense.count() == 120
    dvals = sorted(r.id for r in dense.collect())
    assert dvals == list(range(120))
    # hash ids are collision-free at this scale
    assert hashed.select("id").distinct().count() == 120
