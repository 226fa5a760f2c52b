"""The local gate checker must be at least as strict as the driver's
representation-sensitive hasher (VERDICT r4 #2): value-equal rows that
differ in dtype/representation are local FAILURES, so local green
predicts driver green.

Reproduces the round-4 regression class directly: a Spark-side
object-dtype Decimal column vs a DuckDB-side float64 column — repr-equal
values under the old canon (Decimal equality ignores scale, round(v, 9)
floats) — must now compare unequal.
"""

import importlib.util
import math
import sys
from decimal import Decimal

import pandas as pd


def _checker():
    spec = importlib.util.spec_from_file_location(
        "check_entry", "/root/repo/tools/check_entry.py"
    )
    mod = importlib.util.module_from_spec(spec)
    # Importing executes module-level flag parsing only; main() is guarded.
    saved = sys.argv
    sys.argv = ["check_entry"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = saved
    return mod


CE = _checker()


def test_decimal_vs_float_is_a_strict_failure():
    """The exact r4 red: Spark toPandas DecimalType -> object Decimal,
    DuckDB .df() DECIMAL -> float64. Values equal, representation not."""
    spark_side = pd.DataFrame({"id": [1, 2], "w": [Decimal("1.500000"), Decimal("2.250000")]})
    duck_side = pd.DataFrame({"id": [1, 2], "w": [1.5, 2.25]})
    sc, sk, sr = CE.canon_frame(spark_side, strict=True)
    dc, dk, dr = CE.canon_frame(duck_side, strict=True)
    assert sc == dc
    assert sk != dk, "object-vs-float64 dtype kind must differ"
    assert sr != dr, "Decimal vs float repr must differ"
    # ... while the loose canon (the r4 harness behavior) sees them equal:
    _, _, lr = CE.canon_frame(spark_side, strict=False)
    _, _, ld = CE.canon_frame(duck_side, strict=False)
    assert lr == ld, "loose mode documents why r4's harness missed this"


def test_int_vs_float_is_a_strict_failure():
    """DuckDB SUM(int) -> HUGEINT -> float64 vs Spark bigint (the
    doc_rich_club n_nodes/n_edges drift found by this checker)."""
    a = pd.DataFrame({"n": [2, 6]})
    b = pd.DataFrame({"n": [2.0, 6.0]})
    _, ak, ar = CE.canon_frame(a, strict=True)
    _, bk, br = CE.canon_frame(b, strict=True)
    assert ak != bk and ar != br
    _, _, la = CE.canon_frame(a, strict=False)
    _, _, lb = CE.canon_frame(b, strict=False)
    assert la == lb  # python 2 == 2.0 — invisible to the old canon


def test_one_ulp_float_is_a_strict_failure():
    """The round-3 doc_rich_club ulp case: round(v, 9)-equal doubles with
    distinct bits must FAIL strict (the driver hashes raw bits)."""
    x = 0.133333
    y = math.nextafter(x, 1.0)  # same value to 9 dp, distinct bits
    a = pd.DataFrame({"phi": [x]})
    b = pd.DataFrame({"phi": [y]})
    _, _, ar = CE.canon_frame(a, strict=True)
    _, _, br = CE.canon_frame(b, strict=True)
    assert ar != br


def test_identical_doubles_and_nulls_pass_strict():
    a = pd.DataFrame({"x": [1.25, float("nan"), None], "s": ["a", None, "b"]})
    b = pd.DataFrame({"x": [1.25, float("nan"), None], "s": ["a", None, "b"]})
    assert CE.canon_frame(a, strict=True) == CE.canon_frame(b, strict=True)


def test_norm_handles_arrays_and_maps():
    import numpy as np

    v = CE._norm(np.array([1, 2, 3]), strict=True)
    assert v == ("seq", (("int", "1"), ("int", "2"), ("int", "3")))
    assert CE._norm({"k": np.float64(1.5)}, strict=True) == (
        "map", (("k", ("float", "1.5")),)
    )
