import pandas as pd
import pytest

from linkgraph.extract import anchor_text_table, extract_anchor_pairs_pd


@pytest.fixture(scope="module")
def spark():
    from linkgraph.session import get_spark

    return get_spark(cores=4, shuffle_partitions=4, app_name="test-anchor")


def test_pandas_pair_extraction():
    html = pd.Series(
        [
            b'<p>x</p><a href="https://a.org/1">First Link</a>'
            b'<a href="/rel"><b>Bold</b>\n  text</a>',
            b"<p>no links here</p>",
            b'<a href="https://a.org/1"></a>',
            None,
        ]
    )
    got = extract_anchor_pairs_pd(html).tolist()
    assert got[0] == [
        "https://a.org/1\x1eFirst Link",
        "/rel\x1eBold text",  # inner tags stripped, whitespace collapsed
    ]
    assert got[1] == []
    assert got[2] == ["https://a.org/1\x1e"]  # empty anchor preserved
    assert got[3] == []


def test_anchor_table_counts_and_resolution(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://s.org/a",
                b'<a href="https://t.org/x">Target X</a>'
                b'<a href="https://t.org/x">Target X</a>'
                b'<a href="/local">Local</a>',
            ),
            ("https://s.org/b", b'<a href="https://t.org/x">Target X</a>'),
            ("https://s.org/c", b'<a href="https://t.org/x">Other Name</a>'),
        ],
        "url string, html binary",
    )
    rows = {
        (r.dst_url, r.anchor): (r.n_refs, r.n_src_pages)
        for r in anchor_text_table(pages).collect()
    }
    # 3 refs from 3 pages agree on "Target X"; page a repeats it (anti-spam
    # signal lives in n_refs > n_src_pages at the per-page level)
    assert rows[("https://t.org/x", "Target X")] == (3, 2)
    assert rows[("https://t.org/x", "Other Name")] == (1, 1)
    # relative href resolved against the source page's host
    assert rows[("https://s.org/local", "Local")] == (1, 1)
    # dangling target (t.org outside the 'crawl') is KEPT
    assert any(d.startswith("https://t.org") for d, _ in rows)


def test_multiline_and_case_insensitive(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://s.org/a",
                b'<A HREF="https://t.org/y">spread\nover\nlines</a>',
            )
        ],
        "url string, html binary",
    )
    rows = [(r.dst_url, r.anchor) for r in anchor_text_table(pages).collect()]
    assert rows == [("https://t.org/y", "spread over lines")]
