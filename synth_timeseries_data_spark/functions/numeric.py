"""Numeric-hygiene helpers for cross-engine (Spark vs DuckDB) determinism.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation order
differs from DuckDB's, so a naive ``sum(double)`` over 60k rows will not hash-
match. The fix: aggregate in *scaled integer* space — ``SUM(CAST(FLOOR(x·10⁶)
AS BIGINT))`` — which is exact, associative, and order-independent, then
divide back to double at the end.

Why this form and not DECIMAL: Spark's decimal sum widens the accumulator
past 18 digits, dropping aggregation onto the BigDecimal slow path (measured
4× slower than double sums on a 600k-row groupBy); bigint sums stay in
whole-stage codegen. Why FLOOR and not ROUND/CAST: FLOOR of a bit-identical
double is bit-identical in both engines, while CAST(double AS BIGINT)
truncates in Spark but rounds in DuckDB, and ROUND half-way ties resolve
differently (Spark rounds the exact binary value via BigDecimal HALF_UP,
DuckDB rounds the scaled double). The summed quantity is therefore "sum of
micro-floored values" — deterministic and within n·10⁻⁶ of the true sum.

Headroom: exact up to |Σ x·10⁶| < 2⁶³ ≈ 9.2·10¹⁸ (≈9.2·10¹² in value units);
beyond that — e.g. petabyte-scale sums of large magnitudes — shard the sum
(two-level: per-partition bigint, combine as decimal) before raising SCALE.

Time is canonicalized to *microseconds since epoch* as BIGINT
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``) — exact integer arithmetic, no
sub-second truncation mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1000000.0  # micro-units


def dsum(col: str | Column, alias: str | None = None) -> Column:
    """Order-independent sum of a double column (exact micro-bigint sum)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(F.floor(c * _SCALE).cast("bigint")).cast("double") / F.lit(_SCALE)
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None) -> Column:
    """Order-independent mean: exact micro-bigint sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = (
        F.sum(F.floor(c * _SCALE).cast("bigint")).cast("double")
        / F.lit(_SCALE)
        / F.count(c)
    )
    return out.alias(alias) if alias else out


def ts_us(col: str | Column) -> Column:
    """Timestamp → microseconds-since-epoch BIGINT (≡ DuckDB epoch_us)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def sql_dsum(expr: str) -> str:
    """Engine-shared SQL twin of :func:`dsum`."""
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0)"


def sql_davg(expr: str) -> str:
    """Engine-shared SQL twin of :func:`davg`."""
    return f"({sql_dsum(expr)} / COUNT({expr}))"
