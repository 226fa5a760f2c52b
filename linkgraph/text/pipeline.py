"""Training-data pipeline operators: normalization, PII redaction,
train/eval contamination, sequence packing, deterministic sampling.

Like quality.py, everything is JVM expression work (regexp/split/window/
hash) — whole-stage-codegen friendly, no Python in the hot path, and
deliberately SQL-expressible so the DuckDB oracle can replay each op.
These have no NetworKit analogue; they are the webtext-pipeline half of
the engine (BASELINE.json input_hint: Common-Crawl-style pages), the ops
a pretraining corpus build runs between extraction and tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# PII patterns pinned to the Java-regex ∩ RE2 common subset so the DuckDB
# oracle replays them verbatim: no backrefs, no lookarounds.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

# Redaction order matters and is pinned: emails first (their local parts
# can contain digit runs), then IPv4 (dotted quads would otherwise feed
# the phone pattern), then phones.
PII_PATTERNS = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _seeded_hash(col: str, seed: int, portable: bool) -> Column:
    """The pinned seeded-hash contract shared by every deterministic
    sampling/splitting op: xxhash64(col, seed) at speed, the portable md5
    hash when a DuckDB oracle must replay the decision."""
    if portable:
        from linkgraph.portable import phash

        return phash(F.col(col), F.lit(seed))
    return F.xxhash64(col, F.lit(seed))


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_norm) — pinned normalization applied before hashing /
    shingling in a dedup pass: lowercase, collapse all whitespace runs to
    one space, trim. One regexp_replace chain, pure codegen."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select("doc_id", norm.alias("text_norm"))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_redacted, n_email, n_ipv4, n_phone) — replace
    emails / IPv4 addresses / NANP-style phone numbers with typed
    placeholder tokens and count each category.

    Counts are measured on the PREVIOUS stage's text (email count on raw,
    ipv4 count on email-redacted, …) so they equal the number of
    replacements actually performed — the auditable quantity a corpus
    card reports. Scale shape: one projection, no shuffle; the regexes are
    in the RE2 ∩ Java subset so predicate pushdown and the SQL oracle both
    see identical semantics."""
    stage = F.col(text_col)
    counts = {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = F.regexp_count(stage, F.lit(pat))
        stage = F.regexp_replace(stage, pat, token)
    return docs.select(
        "doc_id",
        stage.alias("text_redacted"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


def ngram_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(doc_id, n_shingles, n_contaminated, contamination) per EVAL doc —
    the benchmark-leakage check run before any training job: fraction of
    an eval document's distinct word k-grams that appear anywhere in the
    training corpus (Brown et al. GPT-3 appendix C style n-gram overlap).

    Plan shape at corpus scale: the train side reduces to ONE distinct
    shingle-hash column (massive map-side combine — duplicate shingles
    collapse before the shuffle), the eval side is tiny by definition;
    the join is a left join on the hash, so each eval shingle matches at
    most one train row — no fan-out, no skew amplification. Eval docs
    with fewer than k tokens have zero shingles and report 0.0."""
    from linkgraph.text.quality import shingles

    if portable:
        from linkgraph.portable import phash

        def h(c):
            return phash(c)
    else:
        def h(c):
            return F.xxhash64(c)

    train_sh = (
        train_docs.select(F.explode(shingles(F.col(text_col), k)).alias("sh"))
        .select(h(F.col("sh")).alias("sh_h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_sh = eval_docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("sh")
    ).select("doc_id", h(F.col("sh")).alias("sh_h")).distinct()
    per_doc = (
        eval_sh.join(train_sh, "sh_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    base = eval_docs.select("doc_id")
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.when(
            F.col("n_shingles") > 0, F.col("n_contaminated") / F.col("n_shingles")
        )
        .otherwise(0.0)
        .alias("contamination"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_buckets: int = 64,
    text_col: str = "text",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, bucket, n_tokens, start_offset, start_seq, end_seq) —
    GPT-style sequence packing: concatenate documents into a token stream
    and slice it every ``budget`` tokens; each doc reports which training
    sequences it lands in (start_seq..end_seq within its bucket) and its
    offset in the stream.

    The global concat order is inherently sequential, so the distributed
    formulation packs ``n_buckets`` independent streams: docs are hashed
    to a bucket, ordered within it by doc_id (deterministic, replayable),
    and the offset is a window cumulative sum partitioned by bucket. At
    corpus scale choose n_buckets ≈ total_tokens / (10⁸) so each window
    partition holds ~100M tokens of (doc_id, n_tokens) rows — the window
    state is two longs per doc, not the text. Padding waste is confined
    to each bucket's final sequence (≤ n_buckets·budget tokens total).
    Token definition = the pinned whitespace tokenizer (quality.tokens)."""
    from linkgraph.text.quality import tokens

    if portable:
        from linkgraph.portable import phash

        b = F.pmod(phash(F.col("doc_id"), F.lit(seed)), F.lit(n_buckets))
    else:
        b = F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(n_buckets))
    sized = docs.select(
        "doc_id",
        b.alias("bucket"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        "doc_id",
        "bucket",
        "n_tokens",
        off.alias("start_offset"),
        F.floor(off / budget).cast("bigint").alias("start_seq"),
        F.floor((off + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / budget)
        .cast("bigint")
        .alias("end_seq"),
    )


def build_corpus(
    docs: DataFrame,
    fractions: dict[str, float],
    budget: int = 2048,
    n_buckets: int = 64,
    seed: int = 42,
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """The end-to-end corpus build a pretraining run actually executes,
    as ONE composed DataFrame plan: normalize → redact PII → Gopher
    quality filter → exact dedup (keep the min-doc_id representative of
    each normalized+redacted text) → deterministic stratified sample by
    ``lang`` → pack survivors into ``budget``-token sequences.

    Input needs (doc_id, text, lang). Output = the packing assignment
    (doc_id, bucket, n_tokens, start_offset, start_seq, end_seq) for
    every surviving document.

    Every stage is JVM expressions plus at most one shuffle (the dedup
    groupBy, the packing window); nothing materializes between stages, so
    Catalyst fuses the projections and a 100-TB build is scan + two
    shuffles of (hash, id)-sized rows — never the text itself beyond the
    dedup key exchange."""
    norm = normalize_text(docs, text_col)
    red = redact_pii(norm, "text_norm")
    kept = red.where(gopher_passes(F.col("text_redacted")))
    reps = kept.groupBy("text_redacted").agg(F.min("doc_id").alias("doc_id"))
    strat = reps.join(docs.select("doc_id", "lang"), "doc_id")
    sampled = stratified_sample(strat, "lang", fractions, seed=seed, portable=portable)
    return pack_sequences(
        sampled.select("doc_id", F.col("text_redacted").alias("text")),
        budget=budget,
        n_buckets=n_buckets,
        seed=seed,
        portable=portable,
    )


def corpus_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(lang, source, n_docs, n_tokens, avg_chars) over the full grouping
    lattice CUBE(lang, source) — the corpus-card summary a dataset release
    publishes: per-language, per-source, per-(language,source) and grand
    totals in ONE pass (Spark expands the cube map-side; one shuffle).

    NULL group keys from the rollup are folded to '<all>' so downstream
    consumers (and the SQL oracle) never confuse "subtotal" with a null
    data value. Token definition = the pinned whitespace tokenizer."""
    from linkgraph.text.quality import tokens

    base = docs.select(
        "lang",
        "source",
        F.size(tokens(F.col(text_col))).alias("n_tok"),
        F.length(text_col).alias("n_chars"),
    )
    return (
        base.cube("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "n_tokens",
            "avg_chars",
        )
    )


# Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1) —
# pinned so the flags are reproducible corpus-card facts, not knobs.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_LEN = 3.0
GOPHER_MAX_AVG_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_passes(text: Column) -> Column:
    """The Gopher keep decision as ONE boolean expression — usable as a
    bare ``where`` predicate (single scan pass, no join) when the
    per-rule diagnostics of :func:`gopher_quality_flags` aren't needed."""
    from linkgraph.text.quality import STOPWORDS, tokens

    t = tokens(text)
    n = F.size(t)
    n_chars = F.length(text)
    mean_len = F.when(n > 0, (n_chars - (n - 1)) / n).otherwise(0.0)
    n_symbols = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    symbol_ratio = F.when(n > 0, n_symbols / n).otherwise(0.0)
    alpha_frac = F.when(
        n > 0, F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / n
    ).otherwise(0.0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop_arr))
    return (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_AVG_LEN)
        & (mean_len <= GOPHER_MAX_AVG_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (n_stop >= GOPHER_MIN_DISTINCT_STOPWORDS)
    )


def gopher_quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    n_stop_distinct, passes) — the Gopher document-level quality rules as
    one codegen projection: word-count band, mean-word-length band,
    symbol-to-word ratio (# and ellipsis), fraction of words containing
    an alphabetic character, and distinct-stopword presence.

    ``passes`` is the AND of all rules — the keep decision a corpus build
    filters on. Scale shape: a single projection over the scan, no
    shuffle; every term is a Spark SQL expression (split/filter/
    regexp_count), so the DuckDB oracle replays it verbatim and a 100-TB
    pass is bounded by scan throughput."""
    from linkgraph.text.quality import STOPWORDS, tokens

    t = tokens(F.col(text_col))
    n = F.size(t)
    n_chars = F.length(F.col(text_col))
    # pinned whitespace tokenizer ⇒ sum of word lengths = n_chars - (n-1)
    mean_len = F.when(n > 0, (n_chars - (n - 1)) / n).otherwise(0.0)
    n_symbols = F.regexp_count(F.col(text_col), F.lit("#")) + F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    )
    symbol_ratio = F.when(n > 0, n_symbols / n).otherwise(0.0)
    alpha_frac = F.when(
        n > 0, F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / n
    ).otherwise(0.0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), stop_arr))
    passes = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_AVG_LEN)
        & (mean_len <= GOPHER_MAX_AVG_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (n_stop >= GOPHER_MIN_DISTINCT_STOPWORDS)
    )
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stop_distinct"),
        passes.alias("passes"),
    )


def repetition_ratios(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dup_line_frac, dup_2gram_frac, dup_3gram_frac) — Gopher's
    within-document repetition rules: fraction of duplicate lines and of
    duplicate word n-grams (1 - distinct/total). High values mark
    boilerplate/spam (navigation chrome, keyword stuffing) that survives
    corpus-level dedup because each doc is unique as a whole.

    All three are per-row array expressions (split/array_distinct/size):
    no shuffle, no window — the repetition state never leaves the row."""
    from linkgraph.text.quality import shingles

    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(0.0)

    def dup_frac(k: int) -> Column:
        sh = shingles(F.col(text_col), k)
        n = F.size(sh)
        return F.when(n > 0, 1.0 - F.size(F.array_distinct(sh)) / n).otherwise(0.0)

    return docs.select(
        "doc_id",
        dup_line.alias("dup_line_frac"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )


# Gopher repetition thresholds (Rae et al. 2021, Table A1): a document is
# dropped when ANY fraction exceeds its cap.
GOPHER_REP_MAX_DUP_LINE_FRAC = 0.30
GOPHER_REP_MAX_DUP_PARA_FRAC = 0.30
GOPHER_REP_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_REP_MAX_DUP_PARA_CHAR_FRAC = 0.20
GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}


def gopher_repetition_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac, top2_char_frac, top3_char_frac, top4_char_frac,
    passes) — the Gopher repetition-removal rules (Rae et al. 2021) with
    the paper's char-fraction semantics, unlike the cheap distinct-ratio
    screen of :func:`repetition_ratios`:

    - duplicate line/paragraph fraction: occurrences BEYOND THE FIRST of
      each exact line (split ``\\n``) / paragraph (split ``\\n\\n``),
      over the total count; empty segments are structure, not content,
      and are excluded.
    - duplicate line/paragraph CHAR fraction: the characters of those
      beyond-first occurrences over ``length(text)``.
    - top-{2,3,4}-gram char fraction: occurrences × chars of the most
      frequent word n-gram over ``length(text)``; 0 when no n-gram
      repeats. Ties on count break to the LONGEST gram (deterministic,
      unlike first-seen order — documented divergence).

    ``passes`` ANDs the paper's caps (0.30/0.30/0.20/0.20 and
    0.20/0.18/0.16). The duplicated-5..10-gram band lives in
    :func:`gopher_dup_ngram_fractions` (interval-union char marking);
    AND the two ``passes`` columns for the full Table A1 screen.

    Plan shape: one explode + one (doc_id, segment) hash-agg per segment
    kind and per n — partial-combine aggregations keyed by doc, no
    window, no self-join; state never exceeds O(segments). At 100 TB
    every branch is scan → explode → two-level agg on the doc key."""
    base = docs.select(
        "doc_id", F.col(text_col).alias("_t"), F.length(text_col).alias("_nc")
    )

    def seg_metrics(sep: str, out: str) -> DataFrame:
        segs = base.select(
            "doc_id",
            "_nc",
            F.explode(
                F.filter(F.split(F.col("_t"), sep), lambda x: x != F.lit(""))
            ).alias("seg"),
        )
        per = segs.groupBy("doc_id", "_nc", "seg").agg(F.count("*").alias("c"))
        return per.groupBy("doc_id").agg(
            (F.sum(F.col("c") - 1) / F.sum("c")).alias(f"dup_{out}_frac"),
            F.when(
                F.first("_nc") > 0,
                F.sum((F.col("c") - 1) * F.length("seg")) / F.first("_nc"),
            )
            .otherwise(0.0)
            .alias(f"dup_{out}_char_frac"),
        )

    def top_gram(n: int) -> DataFrame:
        toks = F.filter(F.split(F.col("_t"), " "), lambda x: x != F.lit(""))
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = base.select("doc_id", "_nc", F.explode(grams).alias("gram"))
        per = g.groupBy("doc_id", "_nc", "gram").agg(F.count("*").alias("c"))
        # struct max = max count, then longest gram among the tied counts
        return (
            per.where(F.col("c") > 1)
            .groupBy("doc_id")
            .agg(
                F.max(F.struct(F.col("c"), F.length("gram").alias("gl"))).alias("m"),
                F.first("_nc").alias("_nc"),
            )
            .select(
                "doc_id",
                F.when(
                    F.col("_nc") > 0, F.col("m.c") * F.col("m.gl") / F.col("_nc")
                )
                .otherwise(0.0)
                .alias(f"top{n}_char_frac"),
            )
        )

    out = (
        base.select("doc_id")
        .join(seg_metrics(r"\n\n", "para"), "doc_id", "left")
        .join(seg_metrics(r"\n", "line"), "doc_id", "left")
        .join(top_gram(2), "doc_id", "left")
        .join(top_gram(3), "doc_id", "left")
        .join(top_gram(4), "doc_id", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0.0)).alias(c)  # noqa: E731
    cols = [
        "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
        "top2_char_frac", "top3_char_frac", "top4_char_frac",
    ]
    out = out.select("doc_id", *[z(c) for c in cols])
    passes = (
        (F.col("dup_line_frac") <= GOPHER_REP_MAX_DUP_LINE_FRAC)
        & (F.col("dup_para_frac") <= GOPHER_REP_MAX_DUP_PARA_FRAC)
        & (F.col("dup_line_char_frac") <= GOPHER_REP_MAX_DUP_LINE_CHAR_FRAC)
        & (F.col("dup_para_char_frac") <= GOPHER_REP_MAX_DUP_PARA_CHAR_FRAC)
        & (F.col("top2_char_frac") <= GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC[2])
        & (F.col("top3_char_frac") <= GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC[3])
        & (F.col("top4_char_frac") <= GOPHER_REP_MAX_TOP_NGRAM_CHAR_FRAC[4])
    )
    return out.withColumn("passes", passes)


# Rae et al. 2021 Table A1, duplicated-n-gram band: a document is dropped
# when the fraction of characters covered by n-grams occurring ≥2 times
# exceeds the cap for any n.
GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC = {
    5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10
}


def gopher_dup_ngram_fractions(
    docs: DataFrame, text_col: str = "text", ns: tuple = (5, 6, 7, 8, 9, 10)
) -> DataFrame:
    """(doc_id, dup5_char_frac, …, dup10_char_frac, passes) — the
    duplicated-5..10-gram half of Gopher's repetition rules (Rae et al.
    2021 Table A1), completing :func:`gopher_repetition_flags`:

    For each n, the fraction of CHARACTERS covered by at least one
    occurrence of an n-gram that appears ≥2 times in the document —
    characters under overlapping duplicate grams count ONCE (interval
    union). Semantics note: greedy sequential reimplementations (skip n
    tokens after a hit) undercount overlaps and are order-dependent; the
    interval union is the deterministic, declarative reading of the
    paper's "taking care not to count characters twice", and it is what
    the DuckDB oracle replays. ``passes`` ANDs the paper's per-n caps
    (0.15/0.14/0.13/0.12/0.11/0.10).

    Plan shape (window-free on the engine side): per-row token char
    offsets via one O(L) array fold → ONE explode of all (n, gram,
    start, end) occurrences → (doc, n, gram) hash-agg keeps grams with
    count ≥ 2 → (doc, n) agg collects the surviving intervals (bounded
    by the doc's own size) → per-row sort + fold computes the union.
    Two shuffles on the doc key, partial-combine aggs, state never
    exceeds O(occurrences); nothing is corpus-quadratic.
    """
    t = F.split(F.col(text_col), " ")
    # starts[i] (0-based) = chars before token i = Σ_{j<i}(len+1)
    starts = F.aggregate(
        t,
        F.struct(
            F.array().cast("array<bigint>").alias("arr"),
            F.lit(0).cast("bigint").alias("cum"),
        ),
        lambda acc, x: F.struct(
            F.concat(acc["arr"], F.array(acc["cum"])).alias("arr"),
            (acc["cum"] + F.length(x) + 1).alias("cum"),
        ),
    )["arr"]
    base = docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        t.alias("t"),
        starts.alias("st"),
    )

    def grams_of(n: int):
        # gram i (1-based slice): s = st[i-1]; e = s + len(gram) — exact
        # because grams re-join with the same single-space separator
        return F.when(
            F.size("t") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice("t", i, n), " ").alias("gram"),
                    F.element_at("st", i).alias("s"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string,s:bigint>>"))

    occ = base.select(
        "doc_id",
        "n_chars",
        F.explode(F.flatten(F.array(*[grams_of(n) for n in ns]))).alias("g"),
    ).select(
        "doc_id",
        "n_chars",
        F.col("g.n").alias("n"),
        F.col("g.s").alias("s"),
        (F.col("g.s") + F.length("g.gram")).alias("e"),
        F.col("g.gram").alias("gram"),
    )
    dup = (
        occ.groupBy("doc_id", "n_chars", "n", "gram")
        .agg(F.collect_list(F.struct("s", "e")).alias("ivs"), F.count("*").alias("c"))
        .where(F.col("c") >= 2)
    )
    # interval union: sort by (s, e), fold a (covered, frontier) pair
    union_len = F.aggregate(
        F.array_sort(F.flatten(F.col("all_ivs"))),
        F.struct(F.lit(0).cast("bigint").alias("cov"), F.lit(0).cast("bigint").alias("cur")),
        lambda acc, iv: F.struct(
            (
                acc["cov"]
                + F.greatest(iv["e"] - F.greatest(iv["s"], acc["cur"]), F.lit(0).cast("bigint"))
            ).alias("cov"),
            F.greatest(acc["cur"], iv["e"]).alias("cur"),
        ),
    )["cov"]
    per_n = (
        dup.groupBy("doc_id", "n_chars", "n")
        .agg(F.collect_list("ivs").alias("all_ivs"))
        .select(
            "doc_id",
            "n",
            F.when(
                F.col("n_chars") > 0,
                union_len.cast("double") / F.col("n_chars").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("frac"),
        )
    )
    wide = per_n.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("frac"))).alias(f"dup{n}_char_frac")
            for n in ns
        ]
    )
    out = docs.select("doc_id").join(wide, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(f"dup{n}_char_frac", F.lit(0.0)).alias(f"dup{n}_char_frac")
            for n in ns
        ],
    )
    passes = None
    for n in ns:
        cond = F.col(f"dup{n}_char_frac") <= F.lit(
            GOPHER_REP_MAX_DUP_NGRAM_CHAR_FRAC[n]
        )
        passes = cond if passes is None else (passes & cond)
    return out.withColumn("passes", passes)


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default_fraction: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic stratified sample: keep a doc iff
    hash(doc_id, seed) mod 1e6 < fraction(stratum) · 1e6 — the
    reproducible corpus-mixing primitive (per-language / per-source
    sampling rates). Same doc_id + seed ⇒ same decision on any cluster
    size, any partitioning, any run — unlike df.sample, which is
    partition-order dependent.

    One broadcast join against the tiny fractions map + one filter; rows
    whose stratum is absent from ``fractions`` get ``default_fraction``."""
    spark = docs.sparkSession
    fr = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(fractions.items())],
        f"{strata_col} string, _frac double",
    )
    h = _seeded_hash("doc_id", seed, portable)
    return (
        docs.join(F.broadcast(fr), strata_col, "left")
        .withColumn("_frac", F.coalesce("_frac", F.lit(float(default_fraction))))
        .where(F.pmod(h, F.lit(1_000_000)) < F.col("_frac") * 1_000_000)
        .drop("_frac")
    )


# URL filtering patterns — pinned to the Java-regex ∩ RE2 common subset
# (same discipline as the PII patterns) so the DuckDB oracle replays them
# verbatim. Extension list follows the public CC-pipeline convention
# (RefinedWeb/CCNet-style media/binary suffixes).
URL_SCHEME_RE = r"^https?://"
URL_HOST_RE = r"^https?://([^/:?#]+)"
URL_IP_HOST_RE = r"^[0-9.]+$"
URL_BINARY_EXT_RE = (
    r"\.(jpe?g|png|gif|bmp|webp|tiff?|css|js|ico|svg|woff2?|ttf|eot"
    r"|mp[34]|m4[av]|avi|mov|mkv|webm|wav|flac|ogg"
    r"|exe|msi|dmg|apk|iso|zip|rar|7z|gz|bz2|xz|tar|pdf)([?#]|$)"
)


def url_filter(
    pages: DataFrame,
    blocked_hosts: list[str] | None = None,
    url_col: str = "url",
    max_len: int = 2048,
    max_query_params: int = 8,
) -> DataFrame:
    """(…, host, reason, keep) — URL-level corpus admission filter, the
    step a Common-Crawl-style build runs BEFORE fetching/extracting a
    page's text (north-rule input: pages keyed by url). Rules are applied
    in a pinned order and ``reason`` names the FIRST failing rule
    (NULL ⇒ admitted, keep = 1):

    scheme (http/https only) → too_long (> max_len chars) → no_host →
    ip_host (dotted-quad literal) → blocked_host (exact host ∈ blocklist,
    lowercased) → binary_ext (media/binary suffix on the path) →
    query_spam (> max_query_params '&'-separated params).

    Scale shape: pure whole-stage-codegen expression work — one regexp
    host extraction plus CASE/length/rlike predicates, no join and no
    shuffle; the blocklist is inlined as an isin literal (an explicit
    broadcast-join variant is the right call only when the blocklist
    outgrows the plan, ~10⁵ entries). Runs as a scan-time predicate, so
    Catalyst pushes `filter(keep = 1)` into the page source.
    """
    blocked = [h.lower() for h in (blocked_hosts or [])]
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, URL_HOST_RE, 1))
    n_params = F.length(url) - F.length(F.regexp_replace(url, r"&", ""))
    reason = (
        F.when(~url.rlike(URL_SCHEME_RE), F.lit("scheme"))
        .when(F.length(url) > max_len, F.lit("too_long"))
        .when(F.col("host") == "", F.lit("no_host"))
        .when(F.col("host").rlike(URL_IP_HOST_RE), F.lit("ip_host"))
        .when(
            F.col("host").isin(blocked) if blocked else F.lit(False),
            F.lit("blocked_host"),
        )
        .when(F.lower(url).rlike(URL_BINARY_EXT_RE), F.lit("binary_ext"))
        .when(n_params > max_query_params, F.lit("query_spam"))
    )
    return (
        pages.withColumn("host", host)
        .withColumn("reason", reason)
        .withColumn("keep", F.col("reason").isNull().cast("int"))
    )


def split_by_group(
    docs: DataFrame,
    groups: DataFrame,
    eval_frac: float = 0.01,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(doc_id, group_id, split) — duplicate-aware train/eval split: the
    split decision is hashed from the doc's dedup GROUP id, so every
    member of a near-duplicate group lands on the same side — the
    standard guard against train→eval leakage through near-copies that a
    plain per-doc split cannot give. ``groups`` is any (doc_id,
    group_id[, …]) dedup-groups table (exact_duplicate_groups,
    near_duplicate_groups, minhash/simhash/embedding closures,
    semantic_dedup); docs absent from it form singleton groups.

    Scale shape: one left join on doc_id (co-partitioned with every other
    doc_id-keyed pipeline stage) + one hash expression; deterministic for
    any partitioning/cluster size, unlike df.randomSplit."""
    h = _seeded_hash("group_id", seed, portable)
    g = groups.select("doc_id", "group_id")
    return (
        docs.select("doc_id")
        .join(g, "doc_id", "left")
        .withColumn("group_id", F.coalesce("group_id", F.col("doc_id")))
        .withColumn(
            "split",
            F.when(
                F.pmod(h, F.lit(1_000_000)) < int(eval_frac * 1_000_000),
                F.lit("eval"),
            ).otherwise(F.lit("train")),
        )
    )


def weighted_sample(
    docs: DataFrame,
    prob_col: str,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Deterministic per-doc weighted (importance) sampling: keep a doc
    iff hash(doc_id, seed) mod 1e6 < p·1e6, where p is the row's value in
    ``prob_col`` (clamped to [0, 1]) — quality-weighted corpus mixing
    (upsample high-quality strata, downsample boilerplate) with the same
    reproducibility contract as stratified_sample: same doc_id + seed ⇒
    same decision at any parallelism. Pure filter, no shuffle."""
    h = _seeded_hash("doc_id", seed, portable)
    p = F.least(F.greatest(F.col(prob_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return docs.where(F.pmod(h, F.lit(1_000_000)) < (p * 1_000_000))


def build_vocab(
    docs: DataFrame,
    max_size: int = 50_000,
    min_count: int = 1,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(token, count, rank) — frequency vocabulary over the pinned
    whitespace tokenization (text.quality.tokens), the corpus-prep step
    before training a subword tokenizer: rank 1 = most frequent, ties
    broken lexicographically.

    Scale shape: explode + one map-side-combinable count aggregation over
    the corpus; the rank window runs only over the TakeOrdered top
    ``max_size`` rows (orderBy().limit() compiles to a distributed
    TakeOrdered, never a single-partition global sort of the full token
    space), so the single-partition stage is bounded by max_size by
    construction."""
    from linkgraph.text.quality import tokens

    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .withColumn("token", F.lower("token") if lowercase else F.col("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= min_count)
    )
    top = counts.orderBy(F.desc("count"), F.asc("token")).limit(max_size)
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))


def c4_filters(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(…, c4_text, n_lines_kept, n_sentences, has_lorem, has_brace,
    c4_passes) — the C4 cleaning rules (Raffel et al. 2020, "Exploring
    the Limits of Transfer Learning", §2.2), the second public rule
    family next to Gopher:

    - keep only lines ending in terminal punctuation (. ! ? ");
    - drop lines with fewer than 5 words (the paper's threshold) or
      containing "javascript";
    - flag (reject) docs containing "lorem ipsum" or the opening curly
      bracket "{" (the paper's code-page marker);
    - require ≥ 3 retained sentences (terminal-punctuation-separated).

    Everything is array/regexp expression work over split lines — one
    codegen projection, no shuffle, no Python; composable with
    gopher_passes as a scan-time predicate."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?"]\s*$')
        & (F.size(F.split(F.trim(ln), r"\s+")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    c4_text = F.array_join(kept, "\n")
    low = F.lower(F.col(text_col))
    n_sent = F.size(
        F.filter(F.split(c4_text, r"[.!?]"), lambda s: F.trim(s) != F.lit(""))
    )
    return (
        docs.withColumn("c4_text", c4_text)
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("n_sentences", n_sent)
        .withColumn("has_lorem", low.contains("lorem ipsum").cast("int"))
        .withColumn("has_brace", F.col(text_col).contains("{").cast("int"))
        .withColumn(
            "c4_passes",
            (
                (F.col("n_sentences") >= 3)
                & (F.col("has_lorem") == 0)
                & (F.col("has_brace") == 0)
            ).cast("int"),
        )
    )


def source_quota_sample(
    docs: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Cap every group at ``max_per_group`` documents — the per-domain
    quota pass that stops hub sites from dominating a crawl-derived
    corpus. Kept rows are the ``max_per_group`` smallest by seeded
    (hash, doc_id) order inside each group: deterministic and
    partitioning-invariant (unlike limit/sample), and a FIXED subset —
    re-running on a superset keeps previously-kept docs only as far as
    the hash order allows, so quotas stay stable under re-crawls.

    Plan: one window rank partitioned BY THE GROUP KEY (each group sorts
    independently — no global sort, no single-partition exchange; skewed
    mega-groups bound the task, and they are exactly the groups the quota
    is for). For heavy-hitter protection beyond the window, pre-filter
    with ``stratified_sample`` at fraction quota/|group|."""
    h = _seeded_hash("doc_id", seed, portable)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(max_per_group))
        .drop("_rn")
    )


def normalize_unicode(
    docs: DataFrame, form: str = "NFC", text_col: str = "text"
) -> DataFrame:
    """Input columns + ``text_norm`` — Unicode-normalize the text
    (``form`` ∈ NFC/NFKC/NFD/NFKD via the stdlib unicodedata tables,
    Arrow-batched; composed/decomposed byte variants of the same string
    otherwise defeat exact dedup and digest diffing). NFC is replayed
    bit-exactly by DuckDB's nfc_normalize in the gate; the K forms have
    no DuckDB twin and are pytest-covered."""
    import unicodedata
    from collections.abc import Iterator as _It

    import pandas as pd

    f = str(form)
    cols = docs.columns

    def run(batches: _It) -> _It:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text_norm"] = [
                unicodedata.normalize(f, t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pdf

    schema = ", ".join(f"{c} {docs.schema[c].dataType.simpleString()}" for c in cols)
    return docs.mapInPandas(run, schema + ", text_norm string")


def split_sentences(
    docs: DataFrame, text_col: str = "text", min_chars: int = 1
) -> DataFrame:
    """(doc_id, sent_id, sentence) — regex sentence segmentation: split
    after runs of terminal punctuation (.!?…) followed by whitespace.
    Deliberately rule-light (no abbreviation model — this feeds
    sentence-level dedup/quality stats, not linguistics); expression-only
    (one split + posexplode), replayed verbatim in SQL."""
    parts = F.split(F.col(text_col), r"(?<=[.!?…])\s+")
    return (
        docs.select("doc_id", F.posexplode(parts).alias("sent_id", "sentence"))
        .where(F.length(F.trim("sentence")) >= int(min_chars))
        .select("doc_id", "sent_id", F.col("sentence"))
    )
