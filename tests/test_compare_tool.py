"""Unit tests for the local correctness-gate emulator (tools/compare.py)
value/dtype canonicalization — no Spark session needed.

Round-4 addition (VERDICT r3 task 10): DECIMAL columns get their own
dtype kind so a money-typed oracle drifting between DECIMAL and DOUBLE
fails locally before values are compared, while decimal-vs-decimal
scale artifacts (1.50 vs 1.5) normalize away.
"""

from __future__ import annotations

import decimal
import importlib.util
import pathlib

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "compare_tool",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "compare.py",
)
compare_tool = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(compare_tool)

canon = compare_tool.canon
dtype_kind = compare_tool.dtype_kind
dtype_mismatches = compare_tool.dtype_mismatches
norm_cell = compare_tool.norm_cell

D = decimal.Decimal


def test_decimal_column_has_own_kind():
    s = pd.Series([D("1.50"), D("2")], dtype=object)
    assert dtype_kind(s) == "decimal"


def test_decimal_vs_double_is_flagged():
    dec = pd.DataFrame({"amt": pd.Series([D("1.50"), D("2")], dtype=object)})
    dbl = pd.DataFrame({"amt": [1.5, 2.0]})
    assert dtype_mismatches(dec, dbl) == ["amt: spark=decimal oracle=float"]
    assert dtype_mismatches(dbl, dec) == ["amt: spark=float oracle=decimal"]


def test_decimal_vs_int_is_flagged():
    dec = pd.DataFrame({"amt": pd.Series([D("2")], dtype=object)})
    ints = pd.DataFrame({"amt": [2]})
    assert dtype_mismatches(dec, ints) == ["amt: spark=decimal oracle=int"]


def test_decimal_scale_artifacts_normalize():
    # 1.50 vs 1.5 and 2 vs 2.00: same logical value, different scale —
    # must hash identically once both sides are decimal
    a = pd.DataFrame({"amt": pd.Series([D("1.50"), D("2")], dtype=object)})
    b = pd.DataFrame({"amt": pd.Series([D("1.5"), D("2.00")], dtype=object)})
    assert not dtype_mismatches(a, b)
    assert canon(a) == canon(b)


def test_norm_cell_decimal_matches_float_format():
    assert norm_cell(D("1.50")) == norm_cell(1.5)
    assert norm_cell(D("2")) == norm_cell(2.0) == "2"
    assert norm_cell(D("0.123456789")) == norm_cell(0.123456789)


def test_existing_kind_rules_untouched():
    ints = pd.DataFrame({"x": [1, 2]})
    floats = pd.DataFrame({"x": [1.0, 2.0]})
    assert dtype_mismatches(ints, floats) == ["x: spark=int oracle=float"]
    assert not dtype_mismatches(ints, pd.DataFrame({"x": [5, 6]}))
