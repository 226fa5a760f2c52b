"""Bloom-filter dedup screen: no false negatives, bounded false
positives, incremental snapshot flags, and DuckDB portable-hash parity
(the gate entry's bit-level replay, exercised here at fixture scale)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from linkgraph.portable import phash_sql
from linkgraph.text.bloom import (
    bloom_build,
    bloom_dedup_flags,
    bloom_fpp,
    bloom_probe,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


PARA_DOCS = [
    (1, "alpha beta gamma\n\ndelta epsilon zeta\n\neta theta iota"),
    (2, "kappa lambda mu\n\nnu xi omicron"),
    (3, "pi rho sigma"),
]


def test_no_false_negatives_probe_self(spark):
    docs = _docs(spark, PARA_DOCS)
    flt = bloom_build(docs, unit="paragraph")
    out = bloom_probe(docs, flt, unit="paragraph").collect()
    assert all(r["dup_frac"] == 1.0 for r in out)
    assert {r["doc_id"]: r["n_units"] for r in out} == {1: 3, 2: 2, 3: 1}


def test_disjoint_probe_clean(spark):
    built = _docs(spark, PARA_DOCS)
    fresh = _docs(spark, [(9, "omega psi chi\n\nupsilon tau")])
    flt = bloom_build(built, unit="paragraph")
    row = bloom_probe(fresh, flt, unit="paragraph").collect()[0]
    # default sizing: 2^23 bits, 6 inserted units — fp prob ~ 0
    assert row["n_units"] == 2 and row["n_dup_units"] == 0
    assert row["dup_frac"] == 0.0


def test_empty_and_unitless_docs(spark):
    docs = _docs(spark, [(1, ""), (2, "\n\n\n\n")])
    flt = bloom_build(_docs(spark, PARA_DOCS), unit="paragraph")
    out = {r["doc_id"]: r for r in bloom_probe(docs, flt, unit="paragraph").collect()}
    for d in (1, 2):
        assert out[d]["n_units"] == 0
        assert out[d]["dup_frac"] == 0.0


def test_ngram_partial_overlap(spark):
    prior = _docs(spark, [(1, "a b c d e f")])
    # shares the 3-grams "a b c" "b c d" "c d e" "d e f"; adds 2 fresh ones
    probe = _docs(spark, [(2, "a b c d e f x y")])
    flags = bloom_dedup_flags(probe, prior, threshold=0.9, unit="ngram", ngram_n=3)
    row = flags.collect()[0]
    assert row["n_units"] == 6 and row["n_dup_units"] == 4
    assert row["keep"]  # 4/6 < 0.9
    strict = bloom_dedup_flags(probe, prior, threshold=0.5, unit="ngram", ngram_n=3)
    assert not strict.collect()[0]["keep"]


def test_duplicate_occurrences_counted_separately(spark):
    prior = _docs(spark, [(1, "same para")])
    probe = _docs(spark, [(2, "same para\n\nsame para\n\nfresh one")])
    row = bloom_probe(probe, bloom_build(prior, unit="paragraph"), unit="paragraph").collect()[0]
    assert row["n_units"] == 3 and row["n_dup_units"] == 2


def test_tiny_filter_shows_false_positives(spark):
    """Honesty check: with m_bits=64 and hundreds of inserted units the
    filter saturates, so fresh units collide — the approximation is real
    and one-sided (extra dups, never missed ones)."""
    built = _docs(spark, [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(20)])
    fresh = _docs(spark, [(99, " ".join(f"q{j}" for j in range(30)))])
    flt = bloom_build(built, unit="ngram", ngram_n=3, m_bits=64, k=2)
    row = bloom_probe(fresh, flt, unit="ngram", ngram_n=3, m_bits=64, k=2).collect()[0]
    assert row["n_dup_units"] > 0  # saturated filter flags fresh units
    assert bloom_fpp(64, 2, 360) > 0.9


def test_fpp_sizing_monotone():
    assert bloom_fpp(1 << 23, 4, 1000) < 1e-9
    assert bloom_fpp(1 << 10, 4, 1000) > bloom_fpp(1 << 20, 4, 1000)
    assert bloom_fpp(1 << 20, 4, 0) == 0.0


def test_portable_bits_match_duckdb(spark):
    """Bit-level replay: DuckDB recomputes the filter words AND the
    per-doc probe from the same md5 phash — the gate entry's oracle at
    fixture scale."""
    m, k, n = 1 << 16, 3, 3
    build_rows = [(0, "a b c d e"), (2, "f g h i")]
    probe_rows = [(1, "a b c d x"), (3, "zz yy xx ww"), (5, "a")]
    built = _docs(spark, build_rows)
    probed = _docs(spark, probe_rows)
    flt = bloom_build(built, unit="ngram", ngram_n=n, m_bits=m, k=k, portable=True)
    out = bloom_probe(
        probed, flt, unit="ngram", ngram_n=n, m_bits=m, k=k, portable=True
    )
    got = {
        r["doc_id"]: (r["n_units"], r["n_dup_units"], round(r["dup_frac"], 6))
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE bdocs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in build_rows)
        + ") AS v(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE pdocs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in probe_rows)
        + ") AS v(doc_id, text)"
    )
    span = n - 1
    sql = f"""
WITH bu AS (
  SELECT array_to_string(toks[i:i+{span}], ' ') AS u
  FROM (SELECT string_split(text, ' ') AS toks FROM bdocs) t,
       UNNEST(generate_series(1, greatest(len(toks) - {span}, 0))) AS g(i)
),
bpos AS (SELECT {phash_sql("u", "s.i")} % {m} AS pos
         FROM bu, UNNEST([{",".join(str(i) for i in range(k))}]) AS s(i)),
bloom AS (SELECT pos // 62 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 62 AS INT)) AS bits
          FROM bpos GROUP BY 1),
pu AS (
  SELECT doc_id, g.i AS uidx, array_to_string(toks[g.i:g.i+{span}], ' ') AS u
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM pdocs) t,
       UNNEST(generate_series(1, greatest(len(toks) - {span}, 0))) AS g(i)
),
ppos AS (SELECT doc_id, uidx, {phash_sql("u", "s.i")} % {m} AS pos
         FROM pu, UNNEST([{",".join(str(i) for i in range(k))}]) AS s(i)),
ph AS (SELECT doc_id, uidx,
              bool_and((COALESCE(b.bits, 0)
                        & (CAST(1 AS BIGINT) << CAST(pos % 62 AS INT))) <> 0)
              AS present
       FROM ppos LEFT JOIN bloom b ON b.word_idx = pos // 62
       GROUP BY doc_id, uidx),
pd AS (SELECT doc_id, count(*) AS n_units,
              SUM(CAST(present AS BIGINT)) AS n_dup_units
       FROM ph GROUP BY doc_id)
SELECT d.doc_id, COALESCE(n_units, 0) AS n_units,
       COALESCE(n_dup_units, 0) AS n_dup_units,
       ROUND(CASE WHEN COALESCE(n_units, 0) > 0
             THEN CAST(n_dup_units AS DOUBLE) / n_units ELSE 0.0 END, 6)
       AS dup_frac
FROM pdocs d LEFT JOIN pd USING (doc_id)
"""
    want = {
        int(r[0]): (int(r[1]), int(r[2]), round(float(r[3]), 6))
        for r in con.execute(sql).fetchall()
    }
    assert got == want
    # semantic spot-checks on top of the replay
    assert got[1] == (3, 2, round(2 / 3, 6))  # "a b c" + "b c d" seen, "c d x" fresh
    assert got[3][1] == 0
    assert got[5] == (0, 0, 0.0)


def test_bloom_dedup_flags_without_broadcast(spark):
    """The documented at-scale path (broadcast_filter=False) must run —
    probe-only kwargs previously leaked into bloom_build and crashed."""
    from linkgraph.text.bloom import bloom_dedup_flags

    prior = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words entirely here now ok yes")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.keep for r in
           bloom_dedup_flags(docs, prior, unit="ngram", ngram_n=3,
                             broadcast_filter=False).collect()}
    assert got[1] is False and got[2] is True
