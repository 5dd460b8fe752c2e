"""Irregular-time operators: timestamp generation (G7), the nearest-abs
as-of lag lookup (G8, quirk Q5), and rolling-frame stats (W4).

The as-of op is the reference's hardest relational semantic: for lag k at
irregular time t it takes the argmin of |past_ts − (ts_t − k·mean_gap)| over
ALL past rows (Codes/a2.py:162-167) with mean_gap computed over the WHOLE
series (a2.py:220-223 — deliberate look-ahead, quirk Q5). A plain last-before
ASOF JOIN is not equivalent: a later-but-closer past row wins.

Two scale notes baked into the plan:
- mean(diff(ts)) telescopes to (max−min)/(n−1), so the look-ahead is one
  grouped aggregate, not a window over sorted diffs.
- the argmin over an ever-growing prefix is O(n²) in the reference; here the
  candidate set is bounded to the last 100 past rows. For targets k·mean_gap
  back (k ≤ 4) the true argmin lives a handful of rows back — the bound is
  semantics-preserving on real data (asserted against an unbounded DuckDB
  rerun in tests) and turns the op into a banded self-join that scales
  linearly with series length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.detrand import exponential_sql
from ..sources import load
from . import register

# ---------------------------------------------------------------------------
# G7 — irregular timestamps: cumulative exponential gaps with a min-gap floor.
# The reference's generator (a2.py:146-160) adapts the gap scale to the
# remaining budget and rescales on overflow — inherently sequential state, so
# that exact variant lives in the tier-(b) kernel. The engine's declarative
# form uses the fixed scale total_time/n_points (same marginal gap family)
# and a prefix-sum window — one shuffle on the series key.
# ---------------------------------------------------------------------------

_N_SERIES = 8
_N_POINTS = 500
_TOTAL_TIME = 100.0
_MIN_GAP = 0.1
_SCALE = _TOTAL_TIME / _N_POINTS

_GAP_U = exponential_sql("cellkey", salt=41, scale=_SCALE)


def _irr_cte(expand) -> str:
    return f"""
    WITH s AS (SELECT {expand('0', str(_N_SERIES - 1))} AS series_id),
    pts AS (SELECT series_id, {expand('1', str(_N_POINTS))} AS i FROM s),
    keyed AS (
      SELECT series_id, i,
             CAST(series_id * 100000 + i AS BIGINT) AS cellkey
      FROM pts
    ),
    gaps AS (
      SELECT series_id, i,
             CASE WHEN {_GAP_U} > {_MIN_GAP} THEN {_GAP_U}
                  ELSE {_MIN_GAP} END AS gap
      FROM keyed
    )
    SELECT series_id, i,
           ROUND(gap, 6) AS gap,
           ROUND(SUM(gap) OVER (PARTITION BY series_id ORDER BY i
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS ts
    FROM gaps
    """


def _spark_expand(lo: str, hi: str) -> str:
    return f"explode(sequence({lo}, {hi}))"


def _duck_expand(lo: str, hi: str) -> str:
    return f"unnest(generate_series({lo}, {hi}))"


@register("irregular_ts", _irr_cte(_duck_expand))
def irregular_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular timestamps as a prefix-sum of floored exponential gaps
    (G7, a2.py:146-160 family) — LCG-uniform → inverse-CDF exponential →
    running-sum window; bit-built from the same SQL text in both engines
    (ln() rounded to 6)."""
    return spark.sql(_irr_cte(_spark_expand))


# ---------------------------------------------------------------------------
# G8 / Q5 — nearest-abs as-of lag over the events fixture.
# ---------------------------------------------------------------------------

_ASOF_WINDOW = 100  # past-row candidate band; exactness asserted in tests


def _asof_sql(tus: str) -> str:
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, value, {tus} AS tus,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    stats AS (
      SELECT user_id,
             (MAX(tus) - MIN(tus)) / CAST(COUNT(*) - 1 AS DOUBLE) AS mean_gap
      FROM ev GROUP BY user_id HAVING COUNT(*) > 1
    ),
    lags AS (SELECT 1 AS k UNION ALL SELECT 2),
    cur AS (
      SELECT e.user_id, e.event_id, e.rn, l.k,
             e.tus - l.k * s.mean_gap AS target_t
      FROM ev e
      JOIN stats s ON s.user_id = e.user_id
      CROSS JOIN lags l
      WHERE e.rn >= 2
    ),
    cand AS (
      SELECT c.user_id, c.event_id, c.k,
             p.value AS lag_value, p.event_id AS lag_event_id,
             ABS(p.tus - c.target_t) AS delta,
             ROW_NUMBER() OVER (PARTITION BY c.user_id, c.event_id, c.k
                                ORDER BY ABS(p.tus - c.target_t), p.rn) AS pick
      FROM cur c
      JOIN ev p ON p.user_id = c.user_id
               AND p.rn >= c.rn - {_ASOF_WINDOW} AND p.rn <= c.rn - 1
    )
    SELECT user_id, event_id, k, lag_value, lag_event_id,
           ROUND(delta / 1000000.0, 6) AS delta_sec
    FROM cand WHERE pick = 1
    """


_ASOF_DUCK = _asof_sql("epoch_us(ts)")
_ASOF_SPARK = _asof_sql("(ts div 1000)")


@register("asof_lag", _ASOF_DUCK)
def asof_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-abs as-of lag (G8): argmin |past_ts − (ts − k·mean_gap)| over
    past rows, k ∈ {1,2}, mean_gap = whole-series mean(diff) computed as
    (max−min)/(n−1) (a2.py:162-167, 220-223; quirk Q5 — nearest wins even if
    farther below, and the mean gap look-ahead is deliberate). Banded
    self-join on (series, row-rank band) + rank-1 pick; ties break to the
    earlier row exactly like np.argmin."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ASOF_SPARK)


# ---------------------------------------------------------------------------
# W4 — rolling-frame statistics over the event stream.
# ---------------------------------------------------------------------------

_ROLL_ORACLE = """
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER w, 6) AS roll_mean,
           MIN(value) OVER w AS roll_min,
           MAX(value) OVER w AS roll_max,
           COUNT(*) OVER w AS roll_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """


@register("rolling_stats", _ROLL_ORACLE)
def rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling last-10 mean/min/max per series (W4) — one window shuffle on
    the series key, frame evaluated incrementally by both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("roll_mean"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
        F.count("*").over(w).alias("roll_n"),
    )
