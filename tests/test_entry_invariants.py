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
    assert len(qs) >= 184  # ratchet: the surface must not shrink


def test_oracles_are_real_sql():
    e = _entry()
    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        assert len(sql.strip()) > 20, name
