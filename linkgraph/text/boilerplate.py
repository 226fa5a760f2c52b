"""Main-content extraction (boilerplate removal) — jusText-lite.

The pipeline step between raw html and every text op: `extract_text`
keeps ALL visible text (nav bars, link lists, footers included); corpus
builds want the main content only. The classic block-level heuristics
(jusText, Pomikálek 2011; Kohlschütter et al. WSDM 2010 "boilerpipe")
segment the page into blocks at block-level tags and classify each block
by LENGTH and LINK DENSITY: short blocks and blocks whose text is mostly
anchor text are boilerplate.

This is the deterministic core of those classifiers — two thresholds,
no language model:

    keep(block) ⇔ words(block) ≥ min_words
                ∧ link_words(block) ≤ max_link_density · words(block)

Spark shape: ONE projection — decode → split on block tags → per-block
higher-order-function transforms (clean / word count / anchor-word
count) → filter + re-join. Everything is JVM whole-stage codegen over
array expressions; no UDF, no shuffle, no Python. At 100 TB this is a
scan-bound map, exactly like the extraction UDF it feeds.

The regexes live in the Java∩RE2 subset so the DuckDB gate oracle
(`page_content`) replays the block segmentation and both counters
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# block-LEVEL tags end/begin a text block (inline tags — a, b, i, span,
# em, strong, img … — stay inside their block and are stripped later)
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|ul|ol|li|h[1-6]|table|tr|td|th|section|article"
    r"|header|footer|nav|aside|blockquote|pre|form|body|html|br|hr)\b[^>]*>"
)
ANCHOR_TEXT_RE = r'(?i)<a[^>]*>(.*?)</a>'
_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"

DEFAULT_MIN_WORDS = 5
DEFAULT_MAX_LINK_DENSITY = 0.5


def _clean(x: Column) -> Column:
    """Strip remaining (inline) tags, collapse whitespace, trim — the
    same cleaning as the pinned extract_text."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(x, _TAG_RE, " "), _WS_RE, " ")
    )


def _wc(x: Column) -> Column:
    return F.size(F.filter(F.split(x, " "), lambda w: w != F.lit("")))


def boilerplate_strip(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_words: int = DEFAULT_MIN_WORDS,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """(url, content, n_blocks, n_kept, total_words, kept_words,
    boilerplate_frac) — ``content`` is the kept blocks' cleaned text
    joined with single spaces, in document order; ``boilerplate_frac``
    is the word-level fraction removed (0.0 for empty pages).

    ``html_col`` is the raw BINARY html (decoded utf-8 here); blocks
    with no visible text are structure, not content, and count nowhere.
    """
    h = F.decode(F.col(html_col), "UTF-8")
    blocks = F.split(h, BLOCK_SPLIT_RE, -1)
    stats = F.transform(
        blocks,
        lambda b: F.struct(
            _clean(b).alias("txt"),
            _wc(_clean(b)).alias("n"),
            _wc(
                _clean(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), F.lit(1)), " "
                    )
                )
            ).alias("nl"),
        ),
    )
    nonempty = F.filter(stats, lambda s: s["n"] > 0)
    kept = F.filter(
        nonempty,
        lambda s: (s["n"] >= F.lit(int(min_words)))
        & (
            s["nl"].cast("double")
            <= F.lit(float(max_link_density)) * s["n"].cast("double")
        ),
    )
    total_w = F.aggregate(
        nonempty, F.lit(0).cast("bigint"), lambda acc, s: acc + s["n"]
    )
    kept_w = F.aggregate(kept, F.lit(0).cast("bigint"), lambda acc, s: acc + s["n"])
    return pages.select(
        F.col(url_col).alias("url"),
        F.array_join(F.transform(kept, lambda s: s["txt"]), " ").alias("content"),
        F.size(nonempty).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
        total_w.alias("total_words"),
        kept_w.alias("kept_words"),
        F.when(
            total_w > 0, (total_w - kept_w).cast("double") / total_w.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("boilerplate_frac"),
    )
