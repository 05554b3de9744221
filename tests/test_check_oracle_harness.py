"""Negative controls for the local gate emulation (tools/check_oracle.py):
a verification harness that cannot FAIL is vacuous, so pin that compare()
actually detects each mismatch class the driver's hash would catch — and
that it stays order-insensitive for genuinely equal results."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare  # noqa: E402


class FakeSparkDF:
    """Just enough surface for compare(): .columns and .toPandas(), plus an
    optional .schema (compare() reads it to find float-TYPED columns; when
    absent it falls back to treating every object-column NaN as NULL)."""

    def __init__(self, pdf: pd.DataFrame, schema=None):
        self._pdf = pdf
        if schema is not None:
            self.schema = schema

    @property
    def columns(self):
        return list(self._pdf.columns)

    def toPandas(self) -> pd.DataFrame:
        return self._pdf.copy()


def _spark(**cols):
    return FakeSparkDF(pd.DataFrame(cols))


def test_equal_results_pass_regardless_of_row_and_column_order():
    s = _spark(k=[1, 2, 3], v=[10.0, 20.0, 30.0])
    d = pd.DataFrame({"v": [30.0, 10.0, 20.0], "k": [3, 1, 2]})
    assert compare("q", s, d) == []


def test_column_rename_detected():
    s = _spark(k=[1], total=[2])
    d = pd.DataFrame({"k": [1], "sum_v": [2]})
    assert any("columns differ" in p for p in compare("q", s, d))


def test_row_count_mismatch_detected():
    s = _spark(k=[1, 2])
    d = pd.DataFrame({"k": [1]})
    assert any("row count differs" in p for p in compare("q", s, d))


def test_value_mismatch_detected():
    s = _spark(k=[1, 2], v=["a", "b"])
    d = pd.DataFrame({"k": [1, 2], "v": ["a", "c"]})
    assert any("mismatches" in p for p in compare("q", s, d))


def test_int_vs_float_dtype_kind_is_a_hard_fail():
    # the driver's exact value-hash sees 376 vs 376.0 as different (the
    # DuckDB HUGEINT-sum artifact) — compare() must refuse, not coerce
    s = _spark(k=[1], v=pd.array([376], dtype="int64"))
    d = pd.DataFrame({"k": [1], "v": [376.0]})
    assert any("dtype kind mismatch" in p for p in compare("q", s, d))


def test_float_drift_beyond_tolerance_detected():
    s = _spark(k=[1], v=[1.0])
    d = pd.DataFrame({"k": [1], "v": [1.0 + 1e-6]})
    assert any("float mismatches" in p for p in compare("q", s, d))
    # and within the 1e-9 band it passes (summation-order noise)
    d_ok = pd.DataFrame({"k": [1], "v": [1.0 + 1e-12]})
    assert compare("q", s, d_ok) == []


def test_sql_null_renderings_canonicalize_but_null_vs_value_still_fails():
    """Spark's toPandas hands SQL NULL over as None; DuckDB's df() hands
    it over as float NaN inside object columns (seen on
    q_text_normalize's nullable-BOOLEAN `changed` during the round-9
    NULL-corpus audit). Both are the same SQL NULL, so compare() must
    treat them as equal — while a NULL on one side versus a real value
    on the other must stay a mismatch (the canon must not swallow
    genuine divergence)."""
    s = _spark(k=[1, 2], flag=[None, True])
    d = pd.DataFrame({"k": [1, 2], "flag": [float("nan"), True]})
    assert compare("q", s, d) == []

    d_bad = pd.DataFrame({"k": [1, 2], "flag": [False, True]})
    assert any("mismatches" in p for p in compare("q", s, d_bad))
    # and the string 'None'/'nan' must not collide with the sentinel
    s2 = _spark(k=[1], v=["None"])
    d2 = pd.DataFrame({"k": [1], "v": [None]})
    assert any("mismatches" in p for p in compare("q", s2, d2))


def test_null_sentinel_is_not_a_string():
    """ADVICE r9: the old canon used the literal string '<NULL>' as the
    NULL sentinel, so a query actually RETURNING that string compared
    equal to SQL NULL. The tuple encoding cannot collide: a real
    '<NULL>' value on one side vs NULL on the other must mismatch."""
    s = _spark(k=[1], v=["<NULL>"])
    d = pd.DataFrame({"k": [1], "v": [None]})
    assert any("mismatches" in p for p in compare("q", s, d))


def test_nan_in_float_typed_column_is_a_value_not_null():
    """ADVICE r9's second half: NaN→NULL canonicalization is restricted
    to columns whose SPARK type is non-float. In a float-TYPED column a
    genuine NaN value versus SQL NULL on the other side must stay a
    mismatch (the schema-less fallback above cannot make this
    distinction; real driver runs always have the schema)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    # object dtype on both sides forces the canon path compare() guards
    s = FakeSparkDF(
        pd.DataFrame({"k": [1], "v": pd.array([float("nan")], dtype=object)}),
        schema=schema,
    )
    d = pd.DataFrame({"k": [1], "v": pd.array([None], dtype=object)})
    assert any("mismatches" in p for p in compare("q", s, d))


def test_float64_null_vs_genuine_nan_detected_via_arrow_masks():
    """ADVICE r10: in a float64 pandas column BOTH SQL NULL and genuine
    NaN render as NaN, so the numeric path's equal_nan compare silently
    equated a Spark NaN with a DuckDB NULL — the exact propagated-NaN
    divergence class the non-finite audit targets. compare() now takes
    Arrow on both sides (Spark toArrow / DuckDB fetch_arrow_table),
    whose validity bitmaps survive the handoff, and checks per-float-
    column null masks: NULL-vs-NaN must FAIL while matching placements
    (and genuine NaN on both sides) still pass."""
    import pyarrow as pa
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )

    class ArrowFake(FakeSparkDF):
        def __init__(self, tbl, schema):
            super().__init__(tbl.to_pandas(), schema=schema)
            self._tbl = tbl

        def toArrow(self):
            return self._tbl

    nan_tbl = pa.table(
        {"k": pa.array([1, 2], pa.int64()),
         "v": pa.array([float("nan"), 1.0], pa.float64())}
    )
    null_tbl = pa.table(
        {"k": pa.array([1, 2], pa.int64()),
         "v": pa.array([None, 1.0], pa.float64())}
    )
    # Spark NaN value vs DuckDB SQL NULL: previously a silent pass
    assert any(
        "NULL-vs-NaN" in p for p in compare("q", ArrowFake(nan_tbl, schema), null_tbl)
    )
    # identical NULL placement on both sides: pass
    assert compare("q", ArrowFake(null_tbl, schema), null_tbl) == []
    # genuine NaN as a VALUE on both sides: pass (equal_nan value compare)
    assert compare("q", ArrowFake(nan_tbl, schema), nan_tbl) == []
