"""Portable 60-bit hash — identical in Spark SQL and DuckDB.

The driver's correctness gate (``__spark_entry__.oracle_sql``) compares
engine DataFrames against DuckDB SQL. Iterative operators whose tie-breaks
or signatures use ``xxhash64`` cannot be oracle-checked (DuckDB has no
xxhash64); this module defines the hash both engines CAN compute
identically:

    phash(x1, …, xn) = int64( first 15 hex digits of
                              md5(str(x1) || ':' || … || ':' || str(xn)) )

- 60 bits → always non-negative, no BIGINT overflow on either side;
- inputs are stringified, so only pass ints/strings (float formatting is
  NOT portable across engines);
- verified Spark ≡ DuckDB in tests/test_portable.py.

xxhash64 remains the default everywhere (it is JVM-codegen'd and ~10×
cheaper than md5); operators take a ``portable=True`` switch used by the
gate queries only.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def phash(*cols: Column | str) -> Column:
    """Spark Column: portable 60-bit hash of the ':'-joined stringified
    inputs. Pass only integer/string columns."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    joined = F.concat_ws(":", *parts)
    return F.conv(F.substring(F.md5(F.encode(joined, "utf-8")), 1, 15), 16, 10).cast(
        "bigint"
    )


def phash_sql(*exprs: str) -> str:
    """DuckDB SQL fragment computing the same value; ``exprs`` are SQL
    expressions of integer/string type."""
    joined = " || ':' || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return f"CAST('0x' || substr(md5({joined}), 1, 15) AS BIGINT)"
