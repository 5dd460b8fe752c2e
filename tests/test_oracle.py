"""Driver-gate mirror: every oracle-checkable query, Spark vs DuckDB at the
oracle scale factor (sf0.01 — same as the driver's CORRECTNESS run)."""

from __future__ import annotations

import pytest

from synth_timeseries_data_spark.queries import all_queries
from tests.oracle_utils import assert_frames_match

_QUERIES = all_queries()
_ORACLE_IDS = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY_IDS = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _ORACLE_IDS)
def test_oracle_match(spark, duck, oracle_sf_dir, name):
    q = _QUERIES[name]
    spark_pdf = q.build(spark, oracle_sf_dir).toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", _ROWS_ONLY_IDS)
def test_rows_only_runs(spark, oracle_sf_dir, name):
    """Non-SQL-expressible ops: the driver records a rows-only check — assert
    the query builds, runs, and has a stable non-empty schema."""
    df = _QUERIES[name].build(spark, oracle_sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_sliding_rollup_equals_naive_expansion(spark, oracle_sf_dir):
    """Independent semantic check for the two-level sliding-window rollup:
    the bucket-partial + combine form must equal the naive
    explode-each-event-into-its-4-windows form (the definitionally obvious
    one). The DuckDB oracle shares the rollup SQL, so a bug common to both
    engines' rollup text would pass the gate — this check would not."""
    from synth_timeseries_data_spark.queries.streaming_analog import (
        _HOUR_US,
        _QTR_US,
    )
    from synth_timeseries_data_spark.sources import load

    load(spark, oracle_sf_dir, "events").createOrReplaceTempView("events")
    naive = spark.sql(f"""
        WITH e AS (SELECT (ts div 1000) AS tus, event_type, value FROM events),
        assigned AS (
          SELECT (CAST(FLOOR(tus / {_QTR_US}.0) AS BIGINT) - k) * {_QTR_US} AS win_start,
                 event_type, value, tus
          FROM e LATERAL VIEW explode(sequence(0, 3)) ks AS k
        )
        SELECT win_start / {_QTR_US} AS win_start_qtr, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS sum_value
        FROM assigned
        WHERE tus >= win_start AND tus < win_start + {_HOUR_US}
        GROUP BY win_start / {_QTR_US}, event_type
    """).toPandas()
    rollup = _QUERIES["sliding_agg"].build(spark, oracle_sf_dir).toPandas()
    assert_frames_match(rollup, naive, "sliding_rollup_vs_naive")
