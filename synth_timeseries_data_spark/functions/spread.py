"""Width-conditional repartition for compute-bound pipelines.

The driver fixture is one parquet row group per table, so a scan is ONE
task and any explode/hash/math-heavy pipeline downstream runs
single-threaded regardless of core count. ``spread`` repartitions up to the
session's default parallelism — but ONLY when the input is narrower than
that: at cluster scale the same scan already arrives in thousands of
partitions and the extra exchange would be pure waste. ``getNumPartitions``
reads the planned partitioning driver-side (no job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to defaultParallelism on ``cols`` (hash) or
    round-robin, unless it is already at least that wide."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
