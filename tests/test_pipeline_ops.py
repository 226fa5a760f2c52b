"""Training-data pipeline ops: PII redaction, contamination, packing,
stratified sampling, normalization — brute-force Python oracles."""

import re

import pytest
from pyspark.sql import functions as F

from linkgraph.text.pipeline import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    gopher_quality_flags,
    ngram_contamination,
    normalize_text,
    pack_sequences,
    redact_pii,
    repetition_ratios,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "Contact me at john.doe@example.com or call 555-123-4567 today"),
        (1, "server at 192.168.1.100 and backup at 10.0.0.1 are UP"),
        (2, "  Mixed\tWHITESPACE   and\n\nCASE  "),
        (3, "plain text with no pii at all just words"),
        (4, "two mails a@b.co c@d.org one phone 800 555 1212"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_redact_pii_counts_and_text(docs):
    got = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1 and got[0].n_ipv4 == 0
    assert "<EMAIL>" in got[0].text_redacted and "<PHONE>" in got[0].text_redacted
    assert "john.doe" not in got[0].text_redacted
    assert got[1].n_ipv4 == 2 and "<IP>" in got[1].text_redacted
    assert "192.168" not in got[1].text_redacted
    assert got[3].n_email == got[3].n_ipv4 == got[3].n_phone == 0
    assert got[3].text_redacted == "plain text with no pii at all just words"
    assert got[4].n_email == 2 and got[4].n_phone == 1
    # python-re parity on every row (same pattern subset)
    for r in docs.collect():
        t = r.text
        assert got[r.doc_id].n_email == len(re.findall(EMAIL_RE, t))
        t = re.sub(EMAIL_RE, "<EMAIL>", t)
        assert got[r.doc_id].n_ipv4 == len(re.findall(IPV4_RE, t))
        t = re.sub(IPV4_RE, "<IP>", t)
        assert got[r.doc_id].n_phone == len(re.findall(PHONE_RE, t))
        t = re.sub(PHONE_RE, "<PHONE>", t)
        assert got[r.doc_id].text_redacted == t


def test_normalize_text(docs):
    got = {r.doc_id: r.text_norm for r in normalize_text(docs).collect()}
    assert got[2] == "mixed whitespace and case"
    assert got[5] == ""


def test_ngram_contamination_exact(spark):
    train = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"), (101, "one two three four")],
        "doc_id bigint, text string",
    )
    evals = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),  # 2 of its 2 3-shingles in train
            (1, "beta gamma delta nine ten"),  # shingles: 3, hits: 1
            (2, "nothing shared here at all"),
            (3, "tiny"),  # < k tokens → 0 shingles
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in ngram_contamination(train, evals, k=3).collect()}
    assert got[0].n_shingles == 2 and got[0].n_contaminated == 2
    assert got[0].contamination == 1.0
    assert got[1].n_shingles == 3 and got[1].n_contaminated == 1
    assert got[2].n_contaminated == 0 and got[2].contamination == 0.0
    assert got[3].n_shingles == 0 and got[3].contamination == 0.0


def test_pack_sequences_offsets_and_chunks(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([10, 20, 5, 100, 3])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # one bucket → a single deterministic stream ordered by doc_id
    got = {r.doc_id: r for r in pack_sequences(df, budget=16, n_buckets=1).collect()}
    assert all(r.bucket == 0 for r in got.values())
    # offsets are the prefix sums of token counts in doc_id order
    offs = [0, 10, 30, 35, 135]
    toks = [10, 20, 5, 100, 3]
    for i in range(5):
        assert got[i].start_offset == offs[i]
        assert got[i].n_tokens == toks[i]
        assert got[i].start_seq == offs[i] // 16
        assert got[i].end_seq == (offs[i] + toks[i] - 1) // 16
    # doc 3 (100 tokens) straddles several 16-token chunks
    assert got[3].end_seq - got[3].start_seq == (35 + 99) // 16 - 35 // 16


def test_pack_sequences_bucket_determinism(spark):
    rows = [(i, " ".join(["tok"] * (1 + i % 7))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, pack_sequences(df, budget=8, n_buckets=4).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13), budget=8, n_buckets=4).collect()))
    assert a == b  # partitioning-independent
    # every bucket's stream is gap-free: offsets + n_tokens tile the stream
    from collections import defaultdict

    by_bucket = defaultdict(list)
    for doc_id, bucket, n, off, s0, s1 in a:
        by_bucket[bucket].append((off, n))
    for rows_ in by_bucket.values():
        rows_.sort()
        pos = 0
        for off, n in rows_:
            assert off == pos
            pos += n


def test_build_corpus_end_to_end(spark):
    from linkgraph.text.pipeline import build_corpus, gopher_quality_flags

    good = ("the quick brown fox jumps over a lazy dog and then it runs " * 5).strip()
    rows = [
        (0, good, "en"),
        (1, good, "en"),  # exact dup of 0 after normalize+redact → dropped
        (2, good + " extra tail words", "en"),
        (3, "too short to pass the gopher word count", "en"),
        (4, good.upper(), "de"),  # normalizes to == doc 0 text but... kept:
        #    dedup keys on normalized text, so 4 collapses into group {0,1,4}
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = build_corpus(df, {"en": 1.0, "de": 1.0}, budget=32, n_buckets=2)
    got = {r.doc_id: r for r in out.collect()}
    # doc 3 filtered (word count); dups 1 and 4 collapse into representative 0
    assert set(got) == {0, 2}
    assert all(r.n_tokens == 65 or r.n_tokens == 68 for r in got.values())
    # deterministic across partitionings
    again = {r.doc_id for r in build_corpus(
        df.repartition(7), {"en": 1.0, "de": 1.0}, budget=32, n_buckets=2
    ).collect()}
    assert set(got) == again
    # sanity: the survivors really do pass the quality gate
    flags = {r.doc_id: r.passes for r in gopher_quality_flags(df).collect()}
    assert flags[0] and not flags[3]


def test_corpus_card_lattice(spark):
    from linkgraph.text.pipeline import corpus_card

    rows = [
        (0, "one two three", "en", "web"),
        (1, "four five", "en", "book"),
        (2, "sechs sieben acht neun", "de", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string")
    got = {(r.lang, r.source): r for r in corpus_card(df).collect()}
    # 4 grouping sets: (lang,source) x3 distinct, (lang) x2, (source) x2, () x1
    assert len(got) == 3 + 2 + 2 + 1
    assert got[("<all>", "<all>")].n_docs == 3
    assert got[("<all>", "<all>")].n_tokens == 3 + 2 + 4
    assert got[("en", "<all>")].n_docs == 2 and got[("en", "<all>")].n_tokens == 5
    assert got[("<all>", "web")].n_docs == 2 and got[("<all>", "web")].n_tokens == 7
    assert got[("de", "web")].n_tokens == 4
    assert abs(got[("en", "<all>")].avg_chars - (13 + 9) / 2) < 1e-9


def test_gopher_quality_flags(spark):
    good = "the quick brown fox jumps over a lazy dog and then it runs " * 5
    rows = [
        (0, good.strip()),  # passes everything
        (1, "short doc under fifty words fails the word count rule"),
        (2, ("x " * 60).strip()),  # no stopwords, mean len 1 < 3
        (3, ("####### " + "the of and " * 20 + "### " * 30).strip()),  # symbols
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    # python oracle, rule by rule
    for doc_id, text in rows:
        words = text.split(" ") if text != "" else [""]
        n = len(words)
        n_chars = len(text)
        mean_len = (n_chars - (n - 1)) / n if n > 0 else 0.0
        n_sym = text.count("#") + len(re.findall(r"\.\.\.", text))
        alpha = sum(1 for w in words if re.search("[A-Za-z]", w)) / n
        stops = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
        n_stop = len(set(words) & stops)
        r = got[doc_id]
        assert r.n_words == n
        assert abs(r.mean_word_len - mean_len) < 1e-9
        assert abs(r.symbol_ratio - n_sym / n) < 1e-9
        assert abs(r.alpha_word_frac - alpha) < 1e-9
        assert r.n_stop_distinct == n_stop
        expected = (
            50 <= n <= 100_000
            and 3.0 <= mean_len <= 10.0
            and n_sym / n <= 0.1
            and alpha >= 0.8
            and n_stop >= 2
        )
        assert r.passes == expected, doc_id
    assert got[0].passes and not any(got[i].passes for i in (1, 2, 3, 4))


def test_repetition_ratios(spark):
    rows = [
        (0, "a b c d e f g h"),  # all 2/3-grams distinct
        (1, "spam spam spam spam spam"),  # 1 distinct 2-gram of 4
        (2, "nav\nnav\nnav\nbody text here"),  # dup lines
        (3, "xy"),  # below k → 0 shingles → 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in repetition_ratios(df).collect()}
    assert got[0].dup_2gram_frac == 0.0 and got[0].dup_3gram_frac == 0.0
    assert abs(got[1].dup_2gram_frac - 3 / 4) < 1e-9
    assert abs(got[1].dup_3gram_frac - 2 / 3) < 1e-9
    assert abs(got[2].dup_line_frac - 2 / 4) < 1e-9
    assert got[3].dup_2gram_frac == 0.0 and got[3].dup_line_frac == 0.0
    # python oracle for every row
    for doc_id, text in rows:
        for k, col in ((2, "dup_2gram_frac"), (3, "dup_3gram_frac")):
            toks = text.split(" ")
            sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            want = 1 - len(set(sh)) / len(sh) if sh else 0.0
            assert abs(got[doc_id][col] - want) < 1e-9, (doc_id, k)


def test_stratified_sample_deterministic_and_bounded(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    frac = {"en": 0.5, "de": 0.1}
    got = stratified_sample(df, "lang", frac, seed=7)
    rows_got = got.collect()
    by_lang = {}
    for r in rows_got:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # fr absent from fractions → default 0.0 → dropped entirely
    assert "fr" not in by_lang
    assert abs(len(by_lang["en"]) / 1000 - 0.5) < 0.06
    assert abs(len(by_lang["de"]) / 1000 - 0.1) < 0.04
    # deterministic across runs and partitionings
    again = {r.doc_id for r in stratified_sample(df.repartition(17), "lang", frac, seed=7).collect()}
    assert {r.doc_id for r in rows_got} == again
    # different seed → different sample
    other = {r.doc_id for r in stratified_sample(df, "lang", frac, seed=8).collect()}
    assert {r.doc_id for r in rows_got} != other


# --- split_by_group / weighted_sample / build_vocab --------------------------


def test_split_by_group_members_stay_together(spark):
    from linkgraph.text.pipeline import split_by_group

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id bigint")
    groups = spark.createDataFrame(
        [(i, i % 7) for i in range(30)], "doc_id bigint, group_id bigint"
    )
    out = split_by_group(docs, groups, eval_frac=0.3, seed=1).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_id, set()).add(r.split)
    # every dedup group lands wholly on one side
    assert all(len(s) == 1 for s in by_group.values())
    # ungrouped docs are singletons keyed by their own id
    singles = {r.doc_id: r.group_id for r in out if r.doc_id >= 30}
    assert singles == {i: i for i in range(30, 50)}
    # both sides populated at eval_frac=0.3 over 27 groups
    sides = {r.split for r in out}
    assert sides == {"train", "eval"}


def test_split_by_group_deterministic_across_partitioning(spark):
    from linkgraph.text.pipeline import split_by_group

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    groups = spark.createDataFrame(
        [(i, i // 4) for i in range(40)], "doc_id bigint, group_id bigint"
    )
    a = sorted(map(tuple, split_by_group(docs, groups, 0.25, seed=9).collect()))
    b = sorted(
        map(
            tuple,
            split_by_group(docs.repartition(13), groups.repartition(3), 0.25, seed=9)
            .collect(),
        )
    )
    assert a == b


def test_weighted_sample_extremes_and_monotone(spark):
    from linkgraph.text.pipeline import weighted_sample

    docs = spark.createDataFrame(
        [(i, 0.0, 1.0, 0.4) for i in range(200)],
        "doc_id bigint, p0 double, p1 double, pm double",
    )
    assert weighted_sample(docs, "p0", seed=3).count() == 0
    assert weighted_sample(docs, "p1", seed=3).count() == 200
    kept_40 = {r.doc_id for r in weighted_sample(docs, "pm", seed=3).collect()}
    # acceptance threshold is monotone in p: docs kept at 0.4 stay at 0.8
    docs8 = docs.withColumn("pm", F.lit(0.8))
    kept_80 = {r.doc_id for r in weighted_sample(docs8, "pm", seed=3).collect()}
    assert kept_40 <= kept_80
    assert 40 <= len(kept_40) <= 120  # ~80 expected, loose band


def test_weighted_sample_clamps_out_of_range(spark):
    from linkgraph.text.pipeline import weighted_sample

    docs = spark.createDataFrame(
        [(1, -0.5), (2, 3.0)], "doc_id bigint, p double"
    )
    kept = {r.doc_id for r in weighted_sample(docs, "p", seed=3).collect()}
    assert kept == {2}  # p<0 clamps to 0 (never), p>1 clamps to 1 (always)


def test_build_vocab_counts_ranks_and_caps(spark):
    from linkgraph.text.pipeline import build_vocab

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "The cat ran"),
            (3, "a dog ran  fast"),
        ],
        "doc_id bigint, text string",
    )
    rows = build_vocab(docs, max_size=3, min_count=2).collect()
    got = [(r.token, r["count"], r.rank) for r in sorted(rows, key=lambda r: r.rank)]
    # 'the' (2, case-folded), 'cat' (2), 'ran' (2) — ties lexicographic
    assert got == [("cat", 2, 1), ("ran", 2, 2), ("the", 2, 3)]
    # min_count filters singletons; max_size caps
    all_rows = build_vocab(docs, max_size=100, min_count=1).collect()
    toks = {r.token for r in all_rows}
    assert {"a", "dog", "fast", "sat"} <= toks and "" not in toks


def test_c4_filters_rules(spark):
    from linkgraph.text.pipeline import c4_filters

    text = (
        "A proper sentence right here.\n"
        "no terminal punctuation\n"
        "Tiny.\n"
        'He said "stop".\n'
        "Please enable javascript to continue.\n"
        "Second proper sentence here. Third proper sentence here."
    )
    df = spark.createDataFrame([(1, text), (2, "lorem ipsum filler."),
                                (3, "code { brace }.")],
                               "doc_id bigint, text string")
    out = {r.doc_id: r for r in c4_filters(df).collect()}
    r = out[1]
    # kept: the 5-word line and the two-sentence 8-word line; dropped:
    # no-punct, <5-word ("Tiny.", the 3-word quoted line), javascript
    assert r.n_lines_kept == 2
    assert r.c4_text.splitlines() == [
        "A proper sentence right here.",
        "Second proper sentence here. Third proper sentence here.",
    ]
    assert r.n_sentences == 3 and r.c4_passes == 1
    assert out[2].has_lorem == 1 and out[2].c4_passes == 0
    assert out[3].has_brace == 1 and out[3].c4_passes == 0


def test_c4_counts_exclamatory_sentences(spark):
    from linkgraph.text.pipeline import c4_filters

    text = (
        "What a great day this is!\n"
        "Can you believe how nice it is?\n"
        "Everyone should come outside right now!"
    )
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = c4_filters(df).collect()[0]
    assert r.n_lines_kept == 3 and r.n_sentences == 3 and r.c4_passes == 1


# ---------------------------------------------------------------------------
# snapshot_diff + source_quota_sample (round-3 session-3 additions)
# ---------------------------------------------------------------------------


def test_snapshot_diff_all_statuses(spark):
    from linkgraph.crawl import snapshot_diff

    old = spark.createDataFrame(
        [("a", "one"), ("b", "two"), ("c", "three")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("b", "two"), ("c", "THREE"), ("d", "four")], "url string, text string"
    )
    got = {r.key: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "removed", "b": "unchanged", "c": "changed", "d": "added",
    }


def test_snapshot_diff_duplicate_keys_collapse(spark):
    from linkgraph.crawl import snapshot_diff

    old = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "url string, text string"
    )
    new = spark.createDataFrame([("a", "x")], "url string, text string")
    rows = snapshot_diff(old, new).collect()
    assert len(rows) == 1
    # min-digest collapse is deterministic: whichever of sha(x)/sha(y) is
    # smaller decides changed-vs-unchanged, identically on every run
    again = snapshot_diff(old, new).collect()
    assert rows[0].status == again[0].status


def test_source_quota_cap_and_determinism(spark):
    from linkgraph.text.pipeline import source_quota_sample

    docs = spark.createDataFrame(
        [(i, "big" if i < 40 else "small", f"t{i}") for i in range(43)],
        "doc_id bigint, source string, text string",
    )
    kept = source_quota_sample(docs, 5, seed=1)
    counts = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["big"] == 5 and counts["small"] == 3  # small under quota
    a = {r.doc_id for r in kept.collect()}
    b = {r.doc_id for r in source_quota_sample(docs, 5, seed=1).collect()}
    assert a == b
    # different seed re-draws the big group's winners
    c = {r.doc_id for r in source_quota_sample(docs, 5, seed=2).collect()}
    assert {d for d in c if d < 40} != {d for d in a if d < 40}


def test_source_quota_stable_under_growth(spark):
    from linkgraph.text.pipeline import source_quota_sample

    small = spark.createDataFrame(
        [(i, "s", "t") for i in range(30)], "doc_id bigint, source string, text string"
    )
    big = spark.createDataFrame(
        [(i, "s", "t") for i in range(60)], "doc_id bigint, source string, text string"
    )
    ks = {r.doc_id for r in source_quota_sample(small, 8, seed=3).collect()}
    kb = {r.doc_id for r in source_quota_sample(big, 8, seed=3).collect()}
    # hash order is global: the superset's winners are a prefix of the
    # same order, so overlap equals the old winners that stay in the top 8
    assert kb & set(range(30)) <= ks


def test_keep_representative_quality_rule(spark):
    from linkgraph.text.dedup import keep_representative

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)], "doc_id bigint, group_id bigint"
    )
    prefer = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.9), (9, 0.5)], "doc_id bigint, score double"
    )
    got = {r.doc_id: r.keep for r in keep_representative(groups, prefer).collect()}
    # group 1: max score 0.9 tied between 2 and 3 → min doc_id 2 kept
    # group 7: doc 7 has NO score → sorts last; 9 kept
    assert got == {1: 0, 2: 1, 3: 0, 7: 0, 9: 1}


def test_normalize_unicode_forms(spark):
    import unicodedata

    from linkgraph.text.pipeline import normalize_unicode

    decomposed = "café ﬁne"  # e + combining acute, fi ligature
    docs = spark.createDataFrame(
        [(0, decomposed), (1, None)], "doc_id bigint, text string"
    )
    nfc = {r.doc_id: r.text_norm for r in normalize_unicode(docs, "NFC").collect()}
    assert nfc[0] == unicodedata.normalize("NFC", decomposed)
    assert "é" in nfc[0] and "ﬁ" in nfc[0]  # NFC keeps ligature
    assert nfc[1] is None
    nfkc = {r.doc_id: r.text_norm for r in normalize_unicode(docs, "NFKC").collect()}
    assert "fi" in nfkc[0] and "ﬁ" not in nfkc[0]  # NFKC folds it


def test_split_sentences_boundaries(spark):
    from linkgraph.text.pipeline import split_sentences

    docs = spark.createDataFrame(
        [(0, "First one. Second!  Third?! and trailing tail"),
         (1, "no terminal punct at all")],
        "doc_id bigint, text string",
    )
    got = {}
    for r in split_sentences(docs).collect():
        got.setdefault(r.doc_id, []).append((r.sent_id, r.sentence))
    assert [s for _, s in sorted(got[0])] == [
        "First one.", "Second!", "Third?!", "and trailing tail",
    ]
    assert [s for _, s in sorted(got[1])] == ["no terminal punct at all"]
