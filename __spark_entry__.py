"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``synth_timeseries_data_spark.queries`` — the engine's query
registry pairs each Spark DataFrame builder with its DuckDB oracle SQL so the
column-name contract can't drift (the driver sorts columns by name before
value-hashing).
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synth_timeseries_data_spark.queries import all_queries  # noqa: E402

FLAGSHIP = "lag_features"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-series lagged features over the events table — scan → window →
    projection, the spine of the reference's lagged-term reads
    (/root/reference/Codes/a1.py:185-188).
    """
    return all_queries()[FLAGSHIP].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; non-SQL-
    expressible ops (seeded-numpy generation kernels, streaming state) are
    omitted → driver records a rows-only check."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
