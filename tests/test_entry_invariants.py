"""Driver-gate surface invariants (CLAUDE.md): every claimed operator has
BOTH a queries() entry and an oracle_sql() replay, names line up, and
the SQL is non-trivial."""

import importlib
import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


def test_every_query_has_an_oracle():
    e = _entry()
    qs, os_ = set(e.queries()), e.oracle_sql()
    assert qs == set(os_), (
        f"unpaired: queries-only={sorted(qs - set(os_))}, "
        f"oracle-only={sorted(set(os_) - qs)}"
    )
    assert len(qs) >= 185  # ratchet: the surface must not shrink


def test_oracles_are_real_sql():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        assert len(sql.strip()) > 20, name


def test_no_gate_query_emits_raw_rounded_double():
    """Round-3 driver red (doc_rich_club): F.round on a double is 1-ulp
    hash-fragile vs DuckDB ROUND. Gate queries must emit rounded values
    through _dec (round + DECIMAL cast, oracle-mirrored); F.round is
    allowed only in entry() (driver smoke-check keeps its double schema)
    and inside _dec itself."""
    import ast
    import inspect

    e = _entry()
    src = inspect.getsource(e.queries)
    assert "F.round(" not in src, (
        "gate queries must use _dec(...), not F.round(...) — "
        "raw rounded doubles are hash-fragile vs the DuckDB oracle"
    )
    # Every _dec emission resolves to a literal alias (the scanner raises
    # otherwise) and lands in the oracle cast map.
    dec_cols = e._dec_columns()
    assert dec_cols, "scanner found no _dec emissions — scan broken?"
    oracles = e.oracle_sql()
    for name, cols in dec_cols.items():
        assert name in oracles, name
        for col, scale in cols.items():
            want = (
                f'CAST(CAST("{col}" AS DECIMAL(28,{scale})) AS DOUBLE)'
                f' AS "{col}"'
            )
            assert want in oracles[name], (name, col, scale)
    # Every _dec result must be either .alias()-ed immediately (an
    # emission, mirrored into the oracle cast map) or .cast()-ed
    # immediately (a deliberate intermediate, e.g. the unigram nll cost
    # table) — a bare _dec would silently miss the oracle mirror.
    tree = ast.parse(src)
    n_calls = sum(
        isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "_dec"
        for n in ast.walk(tree)
    )
    n_consumed = sum(
        isinstance(n, ast.Attribute)
        and n.attr in ("alias", "cast")
        and isinstance(n.value, ast.Call)
        and isinstance(n.value.func, ast.Name)
        and n.value.func.id == "_dec"
        for n in ast.walk(tree)
    )
    n_scanned = sum(len(c) for c in dec_cols.values())
    assert n_calls == n_consumed, (
        f"{n_calls} _dec calls vs {n_consumed} alias/cast-consumed — "
        "a _dec result is emitted bare (unmirrored in the oracle)"
    )
    assert n_scanned >= n_calls - 2, (
        f"{n_calls} _dec calls but only {n_scanned} scanned emissions — "
        "too many escaped the registry scan"
    )


def test_dec_lands_as_double():
    """Round-4 driver regression: emitting DECIMAL output types turned 12
    gate queries hash-red (Spark toPandas → object-dtype Decimal, DuckDB
    .df() → float64 — value-equal, representation-distinct). _dec must
    round THROUGH decimal but LAND as double, and the oracle wrap must
    mirror the same decimal→double round-trip."""
    import inspect

    e = _entry()
    src = inspect.getsource(e._dec)
    assert '.cast("double")' in src, (
        "_dec must end with .cast('double') — DECIMAL output types are "
        "hash-red at the driver (round-4 regression)"
    )
    for name, sql in e.oracle_sql().items():
        if "_decfin" in sql:
            assert "AS DOUBLE)" in sql, (name, "oracle _decfin wrap must "
                                         "land as DOUBLE")


# ROUND(...) AS col pairs where the rounded double is an INTERMEDIATE of
# the oracle replay (consumed by later CTEs / ordering, never an output
# column) — the only places a raw rounded double may appear.
_ROUND_INTERMEDIATES = {
    "doc_nibble": {"rank"},            # sweep ordering key, output is ids
    "doc_unigram_pieces": {"nll"},     # Viterbi cost table
    "embed_ivf_top5": {"mv"},          # 12-dp Lloyd centroid pin
    "embed_pq_top5": {"mv"},
    "embed_semantic_dedup": {"mv"},
}


def test_every_oracle_round_emission_is_decimal_mapped():
    """Ratchet for the doc_rich_club class of flake: any ROUND(x, n) AS
    col in an oracle must either be a decimal-mapped emission (the
    _decfin CAST collapses the ulp) or a known replay intermediate —
    a new rounded-double output column is a future driver hash-red."""
    import re

    e = _entry()
    dec = e._dec_columns()
    offenders = {}
    for name, sql in e.oracle_sql().items():
        ok = set(dec.get(name, {})) | _ROUND_INTERMEDIATES.get(name, set())
        for m in re.finditer(
            r'ROUND\([^;]*?,\s*\d+\)\s+AS\s+"?([A-Za-z_][A-Za-z0-9_]*)"?',
            sql,
        ):
            col = m.group(1)
            if col not in ok and col != "DOUBLE":  # CAST(.. AS DOUBLE) hits
                offenders.setdefault(name, set()).add(col)
    assert not offenders, (
        f"rounded-double oracle emissions without a decimal cast: "
        f"{ {k: sorted(v) for k, v in offenders.items()} } — emit them "
        "through _dec in the Spark query (the oracle cast follows "
        "automatically) or record them in _ROUND_INTERMEDIATES"
    )
