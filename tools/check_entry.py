"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compare row count + sorted-column schema + order-insensitive
values.

STRICT by design (round-4 lesson): the driver's hasher is
representation-sensitive, not value-sensitive — r4 shipped 12 driver reds
on queries whose values were repr-identical Decimals locally, because
Spark ``toPandas`` renders DecimalType as object-dtype ``decimal.Decimal``
while DuckDB ``.df()`` renders DECIMAL as float64. So this checker now
compares the PANDAS frames the way a dtype-sensitive hasher would see
them: per-column dtype KIND (f/i/O/b/M) must match, and every canonical
value must match on (type, repr) — no rounding, no cross-type ==. A 1-ulp
float difference or an int-vs-float drift is a local FAILURE here, as it
would be a driver hash-red. Pass --loose for the old value-equality
compare when debugging whether a red is values or representation."""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

def _query_sources(entry_src: str) -> dict[str, str]:
    """Per-query source text: registry key -> ast.get_source_segment of its
    function def inside queries()."""
    import ast

    tree = ast.parse(entry_src)
    qdef = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    func_src = {
        n.name: ast.get_source_segment(entry_src, n)
        for n in ast.walk(qdef)
        if isinstance(n, ast.FunctionDef) and n is not qdef
    }
    out = {}
    for stmt in qdef.body:
        if isinstance(stmt, ast.Return) and isinstance(stmt.value, ast.Dict):
            for k, v in zip(stmt.value.keys, stmt.value.values):
                if isinstance(k, ast.Constant) and isinstance(v, ast.Name):
                    out[k.value] = func_src.get(v.id, "")
    return out


def _old_oracles(ref: str) -> tuple[dict[str, str], dict[str, str]] | None:
    """oracle_sql() of the entry module as of git REF, executed from the
    old source (pure string building — no Spark work)."""
    import subprocess
    import types

    def show(path):
        r = subprocess.run(
            ["git", "-C", "/root/repo", "show", f"{ref}:{path}"],
            capture_output=True, text=True,
        )
        return r.stdout if r.returncode == 0 else None

    entry_src = show("__spark_entry__.py")
    gate_src = show("gate_sql.py")
    if entry_src is None:
        return None
    saved = sys.modules.get("gate_sql")
    try:
        if gate_src is not None:
            gmod = types.ModuleType("gate_sql")
            exec(compile(gate_src, "gate_sql.py(old)", "exec"), gmod.__dict__)
            sys.modules["gate_sql"] = gmod
        import tempfile

        emod = types.ModuleType("__spark_entry_old__")
        # _dec_columns() scans __file__ — point it at the OLD source so the
        # oracle decimal wrap reflects that revision, not the working tree.
        tf = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
        try:
            tf.write(entry_src)
            tf.close()
            emod.__file__ = tf.name
            exec(
                compile(entry_src, "__spark_entry__.py(old)", "exec"),
                emod.__dict__,
            )
            return emod.oracle_sql(), _query_sources(entry_src)
        finally:
            import os

            os.unlink(tf.name)
    finally:
        if saved is not None:
            sys.modules["gate_sql"] = saved
        else:
            sys.modules.pop("gate_sql", None)


def changed_queries(ref: str = "HEAD") -> list[str]:
    """Queries whose Spark-side function source OR oracle SQL differs from
    git REF (new queries included). Keeps the inner loop to seconds; full
    runs stay for session ends."""
    cur_src = open("/root/repo/__spark_entry__.py").read()
    old = _old_oracles(ref)
    cur_q = _query_sources(cur_src)
    cur_o = entrymod.oracle_sql()
    if old is None:
        return sorted(cur_q)
    old_o, old_q = old
    out = [
        k for k in cur_q
        if old_q.get(k) != cur_q[k] or old_o.get(k) != cur_o.get(k)
    ]
    return sorted(out)


_args = [a for a in sys.argv[1:] if not a.startswith("--")]
_flags = [a for a in sys.argv[1:] if a.startswith("--")]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = _args[1].split(",") if len(_args) > 1 else None
for _f in _flags:
    if _f == "--changed" or _f.startswith("--changed="):
        _ref = _f.split("=", 1)[1] if "=" in _f else "HEAD"
        ONLY = changed_queries(_ref)
        print(f"--changed vs {_ref}: {len(ONLY)} queries: {','.join(ONLY)}")
        if not ONLY:
            print("\nFAILURES: none")
            sys.exit(0)


STRICT = "--loose" not in _flags


def _norm(v, strict: bool = True):
    """Canonicalize one pandas-frame value.

    Strict (default): (type-name, repr) token — a 1-ulp float drift, a
    Decimal-vs-float emission, or an int-vs-float drift all FAIL, exactly
    as a representation-sensitive hasher would see them. Loose: the old
    value-equality canon (floats rounded to 9 dp, cross-type == allowed)
    for diagnosing whether a strict red is values or representation.
    """
    import numpy as np
    import pandas as pd

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        tok = tuple(_norm(x, strict) for x in v)
        return ("seq", tok) if strict else tok
    if isinstance(v, dict):
        items = tuple(sorted((k, _norm(x, strict)) for k, x in v.items()))
        return ("map", items) if strict else items
    if isinstance(v, float) and math.isnan(v):
        return ("float", "nan") if strict else "NaN"
    if v is None or v is pd.NaT or v is pd.NA:
        return ("null",) if strict else None
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if not strict:
        return round(v, 9) if isinstance(v, float) else v
    return (type(v).__name__, repr(v))


def canon_frame(pdf, strict: bool = True):
    """Sorted-column canonical view of a pandas frame: (columns, dtype
    kinds, order-insensitive normalized rows). Dtype KIND (f/i/O/b/M) is
    compared because that is the representation a pandas-hashing driver
    sees — r4's DECIMAL reds were object-vs-float64 kind mismatches."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    kinds = [pdf[c].dtype.kind for c in cols]
    rows = [
        tuple(_norm(v, strict) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return cols, kinds, rows


def main():
    spark = get_spark(cores=8, shuffle_partitions=8, app_name="check-entry")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        sc, sk, sr = canon_frame(spdf, STRICT)
        dc, dk, dr = canon_frame(dpdf, STRICT)
        status = "ok   "
        msgs = []
        if sc != dc:
            status = "FAIL "
            msgs.append(f"cols spark={sc} duck={dc}")
        if STRICT and sk != dk:
            status = "FAIL "
            msgs.append(f"dtype kinds spark={sk} duck={dk} (cols {sc})")
        if len(sr) != len(dr):
            status = "FAIL "
            msgs.append(f"rowcount spark={len(sr)} duck={len(dr)}")
        elif sr != dr:
            status = "FAIL "
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diff}")
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status}{name}: {len(sr)} rows [{time.time()-t0:.1f}s] {' | '.join(msgs)}")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
