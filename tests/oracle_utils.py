"""Spark-vs-DuckDB comparison harness — mirrors the driver's correctness gate.

The driver runs each `queries()` entry and its `oracle_sql()` twin at sf0.01,
sorts columns by name, and hash-compares values EXACTLY. This module
reproduces that check bit-faithfully: floats are keyed by their IEEE bits
(so -0.0 != 0.0 — the class of bug that passed a tolerance-based compare in
round 2 and failed the driver's hash), NaN == NaN is the only equivalence,
and rows are compared order-insensitively. `pytest tests/` therefore fails
exactly when CORRECTNESS_r{N}.json would go red.
"""

from __future__ import annotations

import math
import struct

import pandas as pd


def canon_cell(v):
    """Bit-faithful canonical form: floats keyed by their IEEE-754 bits so
    that -0.0 != 0.0 and NaN == NaN, matching a byte-level value hash."""
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", struct.pack("<d", v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, bytes):
        return ("y", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon_cell(x) for x in v))
    return ("s", str(v))


def _canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(canon_cell(_from_pandas(v)) for v in row))
    out.sort()
    return out


def _from_pandas(v):
    """Undo pandas' numpy boxing so canon_cell sees plain Python types."""
    if v is pd.NA or v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return v
    if hasattr(v, "item"):  # numpy scalar
        try:
            return v.item()
        except (ValueError, AttributeError):
            return v
    return v


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _canon_rows(spark_pdf), _canon_rows(duck_pdf)
    if a == b:
        return
    diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    raise AssertionError(
        f"{name}: bit-exact value mismatch — the driver's hash would fail. "
        f"First sorted-row diffs (index, spark, duck): {diffs}"
    )
