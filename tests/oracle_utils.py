"""Spark-vs-DuckDB comparison harness — mirrors the driver's correctness gate.

The driver runs each `queries()` entry and its `oracle_sql()` twin at sf0.01,
sorts columns by name, and hash-compares values. This module reproduces that
check locally so `pytest tests/` fails exactly when CORRECTNESS_r{N}.json
would go red.
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive comparison: columns sorted by name,
    doubles rounded to 6 (libm last-ulp tolerance), rows sorted by all cols."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6).astype("float64")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
    except TypeError:
        pass
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    # pandas NaN != NaN; compare via fillna sentinel + elementwise fallback
    mism = []
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or not _cell_eq(x, y):
                mism.append((col, i, x, y))
                if len(mism) >= 5:
                    break
        if len(mism) >= 5:
            break
    assert not mism, f"{name}: value mismatches (col, row, spark, duck): {mism}"
