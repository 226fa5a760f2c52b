"""Text analysis: tokenization, quality scoring, language-ID, fingerprints.

Everything here is pure JVM expression work (split/filter/aggregate/
xxhash64) — whole-stage-codegen friendly, no Python in the hot path, and
(deliberately) SQL-expressible so the DuckDB oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# small fixed stopword list — pinned, shared with the SQL oracle
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# tiny per-language marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization — THE pinned token definition."""
    return F.split(text, " ")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens)."""
    return docs.select("doc_id", F.size(tokens(F.col(text_col))).alias("n_tokens"))


def bpe_ish_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_subtokens) — a BPE-like proxy: split on whitespace AND
    transitions (letter/digit/punct boundaries), the usual pretraining
    budget estimator when no tokenizer model ships with the engine."""
    sub = F.split(
        F.regexp_replace(F.col(text_col), r"([0-9]+|[^\sA-Za-z0-9]+)", r" $1 "), r"\s+"
    )
    return docs.select(
        "doc_id", F.size(F.filter(sub, lambda x: x != F.lit(""))).alias("n_subtokens")
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, quality) — length/stopword/punctuation heuristics in the
    Gopher/C4-filter style, all as codegen expressions."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    avg_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    quality = (
        F.when((n_tok >= 5) & (avg_len >= 2) & (avg_len <= 12), 1.0).otherwise(0.0)
        * (1.0 - punct_ratio)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — marker-word voting heuristic.

    Deterministic tie-break by language name so results are partition-
    order independent. A real deployment swaps in fastText/cld3 behind the
    same signature; the Spark plan (per-doc score columns + greatest) is
    the production shape.
    """
    t = tokens(F.lower(F.col(text_col)))

    def contains(arr):
        # single-arg lambda factory: a default-arg lambda would be treated
        # by PySpark as the (element, index) two-arg filter form
        return lambda x: F.array_contains(arr, x)

    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        score_cols.append(F.size(F.filter(t, contains(arr))).alias(f"s_{lang}"))
    scored = docs.select("doc_id", F.size(t).alias("n"), *score_cols)
    langs = sorted(LANG_MARKERS)
    pairs = F.array(
        *[F.struct(F.col(f"s_{l}").alias("s"), F.lit(l).alias("l")) for l in langs]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang name
    return scored.select(
        "doc_id",
        best["l"].alias("lang_pred"),
        F.when(F.col("n") > 0, best["s"] / F.col("n")).otherwise(0.0).alias("lang_score"),
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array of strings; empty below k tokens.

    Guarded sequence: F.sequence(1, n-k+1) would DESCEND for n < k (Spark
    generates reversed ranges), hence the explicit when()."""
    t = tokens(text)
    n = F.size(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(t, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 5, window: int = 4
) -> DataFrame:
    """(doc_id, fingerprint) rows — winnowing document fingerprints
    (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every word k-gram
    (rolling window), keep the minimum hash of each consecutive
    ``window``-sized block. Near-identical documents share most
    fingerprints; used for copy detection at corpus scale.

    Plan: explode positioned shingles → per-doc sliding-window min (window
    frame, no shuffle beyond the doc_id partition) → distinct.
    """
    pos = docs.select(
        "doc_id", F.posexplode(shingles(F.col(text_col), k)).alias("pos", "sh")
    ).withColumn("h", F.xxhash64("sh"))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        pos.select("doc_id", F.min("h").over(w).alias("fingerprint"))
        .distinct()
    )


def unigram_logloss(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(doc_id, n_tokens, logloss) — per-document mean unigram
    cross-entropy under the corpus's OWN unigram LM: the CCNet
    perplexity-filter shape (Wenzek et al. 2020 score documents with a
    Wikipedia KenLM; with no external model in the engine, the LM is the
    corpus unigram distribution — low logloss still marks
    common-vocabulary text, high logloss marks gibberish/rare-token
    soup). logloss(d) = −(1/|d|) Σ_t ln p(t), p(t) = cnt(t)/N.

    Plan: ONE explode over the corpus → token-frequency hash-agg (the LM;
    partial+final combine) → join back on token → per-doc agg. The LM
    table is vocab-sized; no OOV smoothing is needed because the model is
    trained on the scored corpus itself. Deterministic, partitioning-
    invariant, and SQL-replayable (the gate's DuckDB oracle runs the
    identical two aggregations)."""
    base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    # persisted: the token table feeds three consumers (LM agg, the N
    # count, the scoring join) — one corpus explode, not three
    toks = (
        docs.select("doc_id", F.explode(tokens(base)).alias("token"))
        .where(F.col("token") != "")
        .persist()
    )
    lm = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    n_total = toks.count()
    scored = toks.join(lm, "token").select(
        "doc_id", (-(F.log(F.col("cnt") / F.lit(float(n_total))))).alias("nll")
    )
    # materialize the O(docs)-row result, then drop the corpus-sized token
    # cache — returning a lazy plan over a persisted df the caller cannot
    # reach would leak cached blocks across calls (the r2 ADVICE pattern)
    per_doc = (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.avg("nll").alias("logloss"))
        .localCheckpoint(eager=True)
    )
    toks.unpersist()
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("logloss", F.lit(0.0)).alias("logloss"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    thresholds: tuple[float, float],
    text_col: str = "text",
    lowercase: bool = True,
    round_logloss: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, logloss, bucket) — the CCNet head/middle/tail
    split (Wenzek et al. 2020 §4.4: documents are binned by LM perplexity
    at the 33rd/66th percentiles; head trains the cleanest models, tail
    is usually dropped or down-weighted).

    ``thresholds=(t1, t2)``: bucket = head if logloss < t1, middle if
    < t2, else tail. Thresholds are EXPLICIT constants by design — at
    100 TB you estimate the percentiles once on a sample, pin them, and
    the split becomes a pure projection over :func:`unigram_logloss`,
    reproducible across runs and partitionings (a global percentile
    inside the operator would be a driver-side sort per invocation).
    Empty documents (n_tokens=0, logloss 0) are junk, not fluent text —
    they go to ``tail`` explicitly rather than riding their 0.0 score
    into ``head``. ``round_logloss`` buckets on the rounded score (the
    portable gate path: both engines round identically, so thresholds
    can never straddle a sub-ulp disagreement)."""
    t1, t2 = float(thresholds[0]), float(thresholds[1])
    ll = unigram_logloss(docs, text_col, lowercase)
    s = (
        F.round(F.col("logloss"), round_logloss)
        if round_logloss is not None
        else F.col("logloss")
    )
    return ll.select(
        "doc_id",
        "n_tokens",
        s.alias("logloss"),
        F.when(F.col("n_tokens") == 0, F.lit("tail"))
        .when(s < t1, F.lit("head"))
        .when(s < t2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Unicode script profiling + encoding-damage detection (pre-langid signal)
# ---------------------------------------------------------------------------

#: character-class ranges per script -- the coarse Unicode blocks a crawl
#: pipeline routes on (fine-grained langid runs after this gate)
SCRIPT_RANGES = {
    "arabic": "\u0600-\u06FF",
    "cjk": "\u4E00-\u9FFF",
    "cyrillic": "\u0400-\u04FF",
    "devanagari": "\u0900-\u097F",
    "greek": "\u0370-\u03FF",
    "hangul": "\uAC00-\uD7AF",
    "hebrew": "\u0590-\u05FF",
    "kana": "\u3040-\u30FF",
    "latin": "A-Za-z\u00C0-\u024F",
}


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dominant, <script>_frac...) -- per-document character
    fraction of each major Unicode script plus the dominant script
    (highest count; ties break to the lexicographically LARGER name --
    the struct-max rule, pinned for the oracle). One expression-only
    scan: a regexp_count per script, no explode, no UDF. Docs with no
    script characters at all get dominant='none'."""
    n = F.greatest(F.length(text_col), F.lit(1))
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(f"[{rng}]"))
        for name, rng in SCRIPT_RANGES.items()
    }
    best = F.array_max(
        F.array(
            *[
                F.struct(c.alias("c"), F.lit(name).alias("s"))
                for name, c in counts.items()
            ]
        )
    )
    return docs.select(
        "doc_id",
        F.when(best["c"] > 0, best["s"]).otherwise(F.lit("none")).alias(
            "dominant"
        ),
        *[
            F.round(c / n, 6).alias(f"{name}_frac")
            for name, c in sorted(counts.items())
        ],
    )


def mojibake_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_replacement, control_frac, clean) -- encoding-damage
    screen: U+FFFD replacement characters (the decode-failure marker)
    and C0 control characters other than tab/newline/CR. ``clean`` is
    the admission flag (no replacement chars, control fraction < 1e-3).
    Expression-only."""
    n = F.greatest(F.length(text_col), F.lit(1))
    repl = F.regexp_count(F.col(text_col), F.lit("\uFFFD"))
    ctrl = F.regexp_count(
        F.col(text_col),
        F.lit("[\x00-\x08\x0B\x0C\x0E-\x1F]"),
    )
    return docs.select(
        "doc_id",
        repl.alias("n_replacement"),
        F.round(ctrl / n, 6).alias("control_frac"),
        ((repl == 0) & (ctrl / n < 1e-3)).cast("int").alias("clean"),
    )
