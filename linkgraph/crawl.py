"""Crawl hygiene: URL canonicalization, robots.txt admission, sitemaps.

Public-knowledge anchors (REF⚠, no internal systems): URL normalization
rules follow RFC 3986 §6 (syntax-based normalization: case of scheme and
host, default ports, empty path) plus the industry-standard stripping of
tracking query parameters (utm_* et al., as documented publicly by e.g.
the Common Crawl and Heritrix canonicalization rules). Robots exclusion
follows RFC 9309 (group selection by product token, longest-match rule
precedence, "allow wins ties"), with the widely implemented `*` wildcard
and `$` end-anchor pattern extensions. Sitemap parsing follows the
sitemaps.org 0.9 protocol (`<urlset>`/`<sitemapindex>` documents).

Spark shape — designed for a 100-TB crawl frontier:

- URL canonicalization is pure expression work (regexps + higher-order
  array functions), no shuffle and no UDF: it runs as a scan-time
  projection and Catalyst pushes any downstream `keep` filter into the
  page source. Canonical dedup is ONE hash aggregation on the canonical
  key.
- robots.txt parsing shuffles once on host (the per-host line windows
  are tiny — robots files are capped at 500 KiB by RFC 9309 §2.5, so a
  per-host window is bounded data by spec, not by hope). The parsed rule
  table is O(#hosts × rules/host) ≪ O(#urls) and is broadcast into the
  admission join; the URL side never shuffles.
- Sitemap extraction is expression-only (regexp_extract_all over the
  document + a list transform), one row per <url> entry.

Everything here offers ``portable=True``-free semantics: no hashing at
all, so the DuckDB gate replays are direct SQL re-implementations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "canonicalize_url",
    "canonical_duplicates",
    "parse_robots",
    "robots_allowed",
    "sitemap_entries",
]


# Tracking parameters stripped by canonicalize_url: the utm_* family by
# prefix plus the common click-id parameters (public knowledge — these are
# the parameters Google/Facebook/Microsoft document as click-tracking).
TRACKING_EXACT = (
    "gclid",
    "fbclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref",
    "ref_src",
)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonicalize_url(
    url: Column,
    sort_query: bool = True,
    strip_trailing_slash: bool = False,
) -> Column:
    """Canonical form of an absolute http(s) URL; NULL for non-absolute
    input. Rules, in order (RFC 3986 §6 + tracking-param stripping):

    1. drop the fragment (``#…``);
    2. lower-case scheme and host (userinfo, path, query untouched);
    3. strip default ports (``http…:80``, ``https…:443``);
    4. empty path → ``/``;
    5. drop tracking query params (``utm_*`` prefix + TRACKING_EXACT),
       and drop empty params (``a=1&&b=2`` → two params);
    6. ``sort_query``: byte-sort the surviving params so ``?b=2&a=1``
       and ``?a=1&b=2`` canonicalize identically (a *semantic* choice —
       standard for dedup keys, wrong for servers that care about order);
    7. ``strip_trailing_slash``: fold ``/path/`` → ``/path`` (off by
       default: it conflates distinct resources on some servers).

    Expression-only — regexps + array higher-order functions, no UDF, no
    shuffle; safe as a scan-time projection over a 100-TB page table.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # lower-case the host(:port) part; preserve any userinfo@ verbatim
    userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)
    hostport = F.lower(F.regexp_replace(authority, r"^[^@]*@", ""))
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    path_query = F.substr(rest, F.length(authority) + F.lit(1))
    path = F.regexp_extract(path_query, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    if strip_trailing_slash:
        path = F.when(
            (path != "/") & path.endswith("/"),
            F.regexp_replace(path, r"/$", ""),
        ).otherwise(path)
    query = F.when(
        path_query.contains("?"),
        F.regexp_replace(path_query, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    params = F.split(query, "&")
    name = lambda p: F.lower(F.regexp_extract(p, r"^([^=]*)", 1))  # noqa: E731
    kept = F.filter(
        params,
        lambda p: (p != "")
        & ~name(p).startswith("utm_")
        & ~name(p).isin(*TRACKING_EXACT),
    )
    if sort_query:
        kept = F.array_sort(kept)
    qstr = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        hostport,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & (hostport != "")
    return F.when(ok, canon)


def canonical_duplicates(
    df: DataFrame, url_col: str = "url", **canon_kwargs
) -> DataFrame:
    """(url, canonical_url, keep) — URL-level duplicate marking: rows whose
    URLs canonicalize identically form a group; ``keep = 1`` on the
    lexicographically smallest raw URL of each group (deterministic,
    cluster-size-invariant). Non-canonicalizable URLs keep themselves.

    ONE hash aggregation on the canonical key (min-URL representative
    broadcast back via a group join) — the same shape as exact text
    dedup in :mod:`linkgraph.text.dedup`."""
    canon = df.select(
        F.col(url_col).alias("url"),
        F.coalesce(
            canonicalize_url(F.col(url_col), **canon_kwargs), F.col(url_col)
        ).alias("canonical_url"),
    )
    reps = canon.groupBy("canonical_url").agg(F.min("url").alias("_rep"))
    return (
        canon.join(reps, "canonical_url")
        .select(
            "url",
            "canonical_url",
            (F.col("url") == F.col("_rep")).cast("int").alias("keep"),
        )
    )


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, rule, pattern, pattern_len) — RFC 9309 §2 parse of a
    robots.txt corpus, one input row per host.

    Grammar handled: ``#`` comments, blank lines, case-insensitive field
    names, groups = one-or-more consecutive ``User-agent`` lines followed
    by their ``Allow``/``Disallow`` rules (a rule before any user-agent
    line is invalid and dropped, RFC 9309 §2.2.1), empty-pattern rules
    dropped (they match nothing). Agents are lower-cased product tokens;
    other fields (crawl-delay, sitemap, …) are ignored here.

    Scale shape: ONE shuffle on host; the per-host ordered windows walk a
    ≤500 KiB document (the RFC 9309 §2.5 cap), so window state is bounded
    by spec. Output is O(#hosts × rules) ≪ O(#urls) — broadcast it into
    :func:`robots_allowed`.
    """
    w = Window.partitionBy("host").orderBy("pos")
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
        )
        .withColumn("line", F.trim(F.regexp_replace("raw", r"#.*$", "")))
        .where(F.col("line") != "")
        .withColumn(
            "field", F.lower(F.regexp_extract("line", r"^([A-Za-z\-]+)\s*:", 1))
        )
        .withColumn("value", F.trim(F.regexp_replace("line", r"^[A-Za-z\-]+\s*:", "")))
        .where(F.col("field").isin("user-agent", "allow", "disallow"))
    )
    grouped = (
        lines.withColumn("is_ua", (F.col("field") == "user-agent").cast("int"))
        .withColumn(
            "ua_start",
            (
                (F.col("is_ua") == 1)
                & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn("group_id", F.sum("ua_start").over(w))
        .where(F.col("group_id") > 0)
    )
    agents = (
        grouped.where(F.col("is_ua") == 1)
        .select("host", "group_id", F.lower("value").alias("agent"))
        .distinct()
    )
    rules = grouped.where(F.col("is_ua") == 0).select(
        "host",
        "group_id",
        F.col("field").alias("rule"),
        F.col("value").alias("pattern"),
    )
    return (
        rules.join(agents, ["host", "group_id"])
        .where(F.col("pattern") != "")
        .select(
            "host",
            "agent",
            "rule",
            "pattern",
            F.length("pattern").alias("pattern_len"),
        )
        .distinct()
    )


def _like_pattern(pattern: Column) -> Column:
    """robots path pattern → SQL LIKE pattern: escape LIKE metachars,
    ``*`` → ``%``, trailing ``$`` anchors the end (otherwise a prefix
    match, i.e. trailing ``%``)."""
    anchored = pattern.endswith("$")
    body = F.when(anchored, F.regexp_replace(pattern, r"\$$", "")).otherwise(pattern)
    esc = F.replace(
        F.replace(
            F.replace(body, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    like = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, like).otherwise(F.concat(like, F.lit("%")))


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    user_agent: str,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, matched_rule, matched_pattern, allowed) — RFC 9309 §2.2
    admission decision per URL for ``user_agent``.

    Group selection: if the host has any rule group whose agent token
    equals ``user_agent`` (case-insensitive), ONLY those rules apply;
    otherwise the ``*`` group; otherwise (no robots / no matching group)
    the URL is allowed. Rule precedence: longest pattern wins
    (octet-length of the pattern); on a tie, ``allow`` wins. Patterns
    support ``*`` wildcards and a ``$`` end anchor, matched against
    path + '?' + query.

    Scale shape: rules are broadcast (O(#hosts × rules) rows); the URL
    side is one projection + one broadcast join + one hash aggregation on
    url for the max-specificity rule — no URL-side shuffle beyond the
    final per-url max, which AQE coalesces. No UDFs.
    """
    ua = user_agent.lower()
    picked = (
        rules.where(F.lower(F.col("agent")).isin(ua, "*"))
        .withColumn("_is_ua", (F.lower(F.col("agent")) == ua).cast("int"))
        .withColumn("_has_ua", F.max("_is_ua").over(Window.partitionBy("host")))
        .where(F.col("_is_ua") == F.col("_has_ua"))
        .select(
            "host",
            "rule",
            "pattern",
            "pattern_len",
            _like_pattern(F.col("pattern")).alias("_like"),
        )
    )
    # (?i:https?): an uppercase scheme must not bypass the rules (host=''
    # matched nothing and ADMITTED the url). Query comes from the
    # fragment-stripped prefix: a '?' after '#' is part of the fragment,
    # not a query, and end-anchored rules mis-matched otherwise.
    pre = F.substring_index(F.col("url"), "#", 1)
    path = F.regexp_extract(pre, r"^(?i:https?)://[^/?#]+(/[^?#]*)", 1)
    u = (
        urls.select(F.col(url_col).alias("url"))
        .withColumn(
            "host",
            F.lower(F.regexp_extract("url", r"^(?i:https?)://([^/:?#]+)", 1)),
        )
        .withColumn(
            "_path",
            F.concat(
                F.when(path == "", F.lit("/")).otherwise(path),
                F.when(
                    pre.contains("?"),
                    F.concat(F.lit("?"), F.regexp_extract(pre, r"\?(.*)", 1)),
                ).otherwise(F.lit("")),
            ),
        )
    )
    # single deterministic precedence key, identical in the DuckDB replay:
    # zero-padded pattern length ‖ allow-bit ‖ pattern (string compare) —
    # longest wins, allow wins length ties, pattern text breaks exact ties.
    key = F.concat(
        F.lpad(F.col("pattern_len").cast("string"), 6, "0"),
        (F.col("rule") == "allow").cast("int").cast("string"),
        F.lit("|"),
        F.col("pattern"),
    )
    matched = (
        u.join(F.broadcast(picked), "host", "left")
        .withColumn(
            "_hit",
            F.col("_like").isNotNull()
            & F.like(F.col("_path"), F.col("_like"), F.lit("\\")),
        )
        .groupBy("url", "host")
        .agg(
            F.max_by(
                F.struct(
                    F.col("rule").alias("rule"), F.col("pattern").alias("pattern")
                ),
                F.when(F.col("_hit"), key),
            ).alias("_best"),
            F.max(F.col("_hit").cast("int")).alias("_any"),
        )
    )
    return matched.select(
        "url",
        "host",
        F.when(F.col("_any") == 1, F.col("_best.rule")).alias("matched_rule"),
        F.when(F.col("_any") == 1, F.col("_best.pattern")).alias("matched_pattern"),
        F.when(
            F.col("_any") == 1, (F.col("_best.rule") == "allow").cast("int")
        )
        .otherwise(F.lit(1))
        .alias("allowed"),
    )


def sitemap_entries(
    sitemaps: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod) — sitemaps.org 0.9 extraction.

    ``kind`` is ``index`` for ``<sitemapindex>`` documents (whose entries
    are child sitemap URLs) and ``urlset`` otherwise. One row per
    ``<url>``/``<sitemap>`` block; ``loc`` is trimmed and minimally
    entity-decoded (``&amp; &lt; &gt; &quot; &#39;`` — the five XML
    predefined entities); ``lastmod`` is NULL when absent. Expression-only
    (regexp_extract_all + a list transform), no shuffle."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), 1
    )
    decode = lambda c: F.replace(  # noqa: E731
        F.replace(
            F.replace(
                F.replace(
                    F.replace(c, F.lit("&lt;"), F.lit("<")),
                    F.lit("&gt;"),
                    F.lit(">"),
                ),
                F.lit("&quot;"),
                F.lit('"'),
            ),
            F.lit("&#39;"),
            F.lit("'"),
        ),
        F.lit("&amp;"),
        F.lit("&"),
    )
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)).alias(
                "loc_raw"
            ),
            F.trim(
                F.regexp_extract(b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1)
            ).alias("lastmod_raw"),
        ),
    )
    return (
        sitemaps.select(
            F.col(url_col).alias("sitemap_url"),
            F.when(F.col(xml_col).contains("<sitemapindex"), F.lit("index"))
            .otherwise(F.lit("urlset"))
            .alias("kind"),
            F.explode(entries).alias("e"),
        )
        .where(F.col("e.loc_raw") != "")
        .select(
            "sitemap_url",
            "kind",
            decode(F.col("e.loc_raw")).alias("loc"),
            F.when(F.col("e.lastmod_raw") != "", F.col("e.lastmod_raw")).alias(
                "lastmod"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot diff — crawl-to-crawl change detection
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, status, old_digest, new_digest) — classify every page across
    two crawl snapshots: ``added`` (key only in new), ``removed`` (only in
    old), ``changed`` (both, different content digest), ``unchanged``.
    The shape every incremental-crawl pipeline consumes (re-extract only
    added+changed, tombstone removed).

    One full outer join on the key after reducing each side to
    (key, sha256 digest) — no text leaves the scan, so the shuffle
    carries 2×(key+32B) per page regardless of page size. Duplicate keys
    within a snapshot are first collapsed to their min digest
    (deterministic, order-independent)."""

    def digests(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(
                F.col(key_col).alias("key"),
                F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("d"),
            )
            .groupBy("key")
            .agg(F.min("d").alias(alias))
        )

    o = digests(old, "old_digest")
    n = digests(new, "new_digest")
    return o.join(n, "key", "full_outer").select(
        "key",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_digest",
        "new_digest",
    )
