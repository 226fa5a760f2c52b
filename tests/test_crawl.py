"""Crawl hygiene: URL canonicalization, robots.txt admission, sitemaps.

Oracles: hand-computed expectations on crafted cases covering every rule
in the RFC 3986 §6 / RFC 9309 semantics the module documents (the DuckDB
gate replays the same semantics independently in SQL — see
``__spark_entry__.py`` url_canonical / robots_admission / sitemap_locs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from linkgraph.crawl import (
    canonical_duplicates,
    canonicalize_url,
    parse_robots,
    robots_allowed,
    sitemap_entries,
)

ROBOTS_TXT = """# crawl policy
User-agent: linkbot
User-agent: otherbot
Disallow: /private/
Allow: /private/ok*
Crawl-delay: 5

User-agent: *
Disallow: /tmp$
Disallow: /pct%dir/
Disallow:
Allow: /
"""


def _canon(spark, url, **kw):
    df = spark.createDataFrame([(url,)], ["url"])
    return df.select(canonicalize_url(F.col("url"), **kw).alias("c")).first().c


@pytest.mark.parametrize(
    "raw,expect",
    [
        # scheme+host lowercase, default port, fragment, utm strip, sort
        (
            "HTTPS://Example.COM:443/Path?b=2&utm_source=x&a=1#frag",
            "https://example.com/Path?a=1&b=2",
        ),
        ("http://example.com:80", "http://example.com/"),  # empty path → /
        ("http://example.com/a?gclid=1", "http://example.com/a"),
        ("http://u:p@Example.com/x", "http://u:p@example.com/x"),  # userinfo kept
        ("http://example.com:8080/a", "http://example.com:8080/a"),  # non-default port
        ("http://example.com/a?x=1&&x=1", "http://example.com/a?x=1&x=1"),
        ("https://example.com:80/a", "https://example.com:80/a"),  # :80 not https default
        ("ftp://example.com/x", None),
        ("not a url", None),
        ("", None),
    ],
)
def test_canonicalize_rules(spark, raw, expect):
    assert _canon(spark, raw) == expect


def test_canonicalize_options(spark):
    assert (
        _canon(spark, "http://e.com/a/?ref=home", strip_trailing_slash=True)
        == "http://e.com/a"
    )
    assert _canon(spark, "http://e.com/", strip_trailing_slash=True) == "http://e.com/"
    assert (
        _canon(spark, "http://e.com/a?b=2&a=1", sort_query=False)
        == "http://e.com/a?b=2&a=1"
    )


def test_canonical_duplicates_groups(spark):
    df = spark.createDataFrame(
        [
            ("http://a.com/x?utm_b=1",),
            ("HTTP://A.com/x",),
            ("http://a.com/y",),
            ("garbage",),  # non-canonicalizable → its own group
        ],
        ["url"],
    )
    rows = {r.url: r for r in canonical_duplicates(df).collect()}
    assert rows["HTTP://A.com/x"].keep == 1  # lexicographic min of the group
    assert rows["http://a.com/x?utm_b=1"].keep == 0
    assert rows["HTTP://A.com/x"].canonical_url == "http://a.com/x"
    assert rows["http://a.com/y"].keep == 1
    assert rows["garbage"].keep == 1 and rows["garbage"].canonical_url == "garbage"


@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [("example.com", ROBOTS_TXT), ("open.org", "User-agent: *\nAllow: /\n")],
        ["host", "robots_txt"],
    )
    return parse_robots(robots).cache()


def test_parse_robots_rows(rules):
    rows = {
        (r.host, r.agent, r.rule, r.pattern): r.pattern_len for r in rules.collect()
    }
    # both agents of the first group get both rules
    assert ("example.com", "linkbot", "disallow", "/private/") in rows
    assert ("example.com", "otherbot", "allow", "/private/ok*") in rows
    # wildcard group
    assert ("example.com", "*", "disallow", "/tmp$") in rows
    assert rows[("example.com", "*", "disallow", "/tmp$")] == 5
    # empty Disallow dropped; crawl-delay ignored
    assert not any(p == "" for (_, _, _, p) in rows)
    assert not any(r not in ("allow", "disallow") for (_, _, r, _) in rows)


def test_rule_before_any_group_dropped(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("h.com", "Disallow: /orphan\nUser-agent: *\nDisallow: /x\n")],
            ["host", "robots_txt"],
        )
    )
    pats = [r.pattern for r in rules.collect()]
    assert pats == ["/x"]


def _allowed(urls_rules_ua, spark):
    urls, rules, ua = urls_rules_ua
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return {r.url: r for r in robots_allowed(df, rules, ua).collect()}


def test_robots_specific_agent_group_wins(spark, rules):
    got = _allowed(
        (
            [
                "http://example.com/private/secret",
                "http://example.com/private/okay",
                "http://example.com/tmp",  # * group's rule must NOT apply
            ],
            rules,
            "LinkBot",  # case-insensitive product token
        ),
        spark,
    )
    assert got["http://example.com/private/secret"].allowed == 0
    # longest-match: Allow /private/ok* (12) beats Disallow /private/ (9)
    assert got["http://example.com/private/okay"].allowed == 1
    assert got["http://example.com/private/okay"].matched_pattern == "/private/ok*"
    assert got["http://example.com/tmp"].allowed == 1
    assert got["http://example.com/tmp"].matched_rule is None


def test_robots_star_group_and_anchors(spark, rules):
    got = _allowed(
        (
            [
                "http://example.com/tmp",  # $ anchor hits
                "http://example.com/tmpx",  # $ anchor must not hit
                "http://example.com/pct%dir/f",  # LIKE metachar escaped
                "http://example.com/pctXdir/f",  # % is literal, not wildcard
                "http://norobots.net/x",  # host with no rules → allowed
                "http://open.org/anything",
            ],
            rules,
            "unknownbot",
        ),
        spark,
    )
    assert got["http://example.com/tmp"].allowed == 0
    assert got["http://example.com/tmpx"].allowed == 1
    assert got["http://example.com/pct%dir/f"].allowed == 0
    assert got["http://example.com/pctXdir/f"].allowed == 1
    assert got["http://norobots.net/x"].allowed == 1
    assert got["http://norobots.net/x"].matched_rule is None
    assert got["http://open.org/anything"].allowed == 1


def test_robots_query_matched_and_tie_allow_wins(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [
                (
                    "h.com",
                    "User-agent: *\nDisallow: /*?sid=\nAllow: /a\nDisallow: /b\n"
                    "Allow: /same\nDisallow: /same\n",
                )
            ],
            ["host", "robots_txt"],
        )
    )
    got = _allowed(
        (
            [
                "http://h.com/page?sid=123",  # wildcard reaches into the query
                "http://h.com/page?x=1",
                "http://h.com/same",  # equal-length tie → allow wins
            ],
            rules,
            "anybot",
        ),
        spark,
    )
    assert got["http://h.com/page?sid=123"].allowed == 0
    assert got["http://h.com/page?x=1"].allowed == 1
    assert got["http://h.com/same"].allowed == 1


def test_sitemap_entries(spark):
    sm = spark.createDataFrame(
        [
            (
                "http://e.com/sitemap.xml",
                '<?xml version="1.0"?><urlset>\n'
                "<url><loc> http://e.com/a?x=1&amp;y=2 </loc>"
                "<lastmod>2026-01-01</lastmod></url>\n"
                "<url><loc>http://e.com/b</loc></url>\n"
                "<url><lastmod>2026-01-02</lastmod></url></urlset>",  # no loc: dropped
            ),
            (
                "http://e.com/index.xml",
                "<sitemapindex><sitemap><loc>http://e.com/sm1.xml</loc></sitemap>"
                "</sitemapindex>",
            ),
        ],
        ["url", "xml"],
    )
    rows = sitemap_entries(sm).orderBy("sitemap_url", "loc").collect()
    assert [(r.kind, r.loc, r.lastmod) for r in rows] == [
        ("index", "http://e.com/sm1.xml", None),
        ("urlset", "http://e.com/a?x=1&y=2", "2026-01-01"),
        ("urlset", "http://e.com/b", None),
    ]


def test_robots_uppercase_scheme_and_fragment_query(spark):
    """An uppercase scheme must not bypass the rules, and a '?' inside
    the fragment is not a query."""
    from linkgraph.crawl import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /private\nDisallow: /p$\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [("HTTP://Example.com/private",),
         ("http://example.com/p#sec?x=1",),
         ("http://example.com/open",)],
        "url string",
    )
    got = {
        r.url: r.allowed
        for r in robots_allowed(urls, rules, "linkgraphbot").collect()
    }
    assert got["HTTP://Example.com/private"] == 0  # scheme case ignored
    assert got["http://example.com/p#sec?x=1"] == 0  # '$' anchors on /p
    assert got["http://example.com/open"] == 1
