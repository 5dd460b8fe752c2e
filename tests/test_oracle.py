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
