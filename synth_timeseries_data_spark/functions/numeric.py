"""Numeric-hygiene helpers for cross-engine (Spark vs DuckDB) determinism.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation order
differs from DuckDB's, so a naive ``sum(double)`` over 60k rows will not hash-
match. The fix: aggregate in fixed-point DECIMAL (exact, associative,
order-independent) and cast the result back to double. Both engines round the
double→decimal conversion identically (half-up at scale 6), and the final
decimal→double cast is a deterministic function of the exact decimal value.

Time is canonicalized to *microseconds since epoch* as BIGINT
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``) — exact integer arithmetic, no
sub-second truncation mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(26,6)"


def dsum(col: str | Column, alias: str | None = None) -> Column:
    """Order-independent sum of a double column (exact decimal accumulate)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: str | Column, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def ts_us(col: str | Column) -> Column:
    """Timestamp → microseconds-since-epoch BIGINT (≡ DuckDB epoch_us)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE) / COUNT({expr}))"
