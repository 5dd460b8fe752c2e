"""Sinks (G16 CSV, G17 edge-list parquet, G18 structure sidecar) and the
partitioned dataset layout.

The reference persists one CSV + npy tensors + a structure txt per config
into a `family/noise/vars/lag` directory tree (Codes/a1.py:237-306). The
engine's equivalents: CSV with header and empty-string nulls (pandas
to_csv compatible), edge lists as parquet (the relational tensor form), a
JSON-lines structure sidecar via df.write.json, and
`partitionBy(family, noise, n_vars, max_lag)` for the tree — which at
100 TB doubles as partition pruning for any per-config read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dsl.registry import equations
from .queries.dsl import _parsed_edges


def write_series_csv(df: DataFrame, path: str) -> None:
    """G16: wide series table → CSV, header on, NULL → empty string (the
    pandas NaN→'' convention the reference's CSVs use, a1.py:242-243)."""
    df.write.mode("overwrite").option("header", True).option("nullValue", "").csv(path)


def read_series_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.option("header", True)
        .option("nullValue", "")
        .schema(schema)
        .csv(path)
    )


def write_edge_list(spark: SparkSession, path: str) -> None:
    """G17: ground-truth edge lists for every registry config as parquet —
    the engine's answer to the reference's .npy tensors (a1.py:269-270)."""
    _parsed_edges(spark).write.mode("overwrite").parquet(path)


def write_structure_json(spark: SparkSession, path: str) -> None:
    """G18: structure sidecar as JSON lines (df.write.json) — one record per
    edge with the equation text attached, replacing the reference's
    free-text `(source, lag, target) => coef` files (a1.py:296-306)."""
    edges = _parsed_edges(spark)
    edges.select(
        "family",
        "n_vars",
        "max_lag",
        "source",
        "target",
        "lag",
        "func",
        "coef",
        F.concat(
            F.lit("("), "source", F.lit(", "), F.col("lag").cast("string"),
            F.lit(", "), "target", F.lit(") => "), F.col("coef").cast("string"),
        ).alias("link_str"),
    ).write.mode("overwrite").json(path)


def write_structure_txt(family: str, n_vars: int, max_lag: int, path: str) -> None:
    """Driver-side text twin of the reference's structure file format
    (a1.py:298-306) for single-config interop."""
    eqs = equations(family, n_vars, max_lag)
    with open(path, "w") as f:
        f.write(f"True Causal Structure ({family}):\n")
        f.write("Format: (source, lag, target) => coefficient\n")
        f.write("\nEquations:\n")
        for eq in eqs:
            f.write(f"{eq}\n")


def write_partitioned_dataset(df: DataFrame, path: str, *cols: str) -> None:
    """Partitioned layout (default family/noise/n_vars/max_lag — the
    Datasets/ tree, SURVEY.md §0) with partition pruning for free."""
    keys = list(cols) or ["family", "noise", "n_vars", "max_lag"]
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def _decomposition_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point series + fitted trend — the data behind the reference's
    decomposition panels (c1.py:391-411: plot series, overlay the degree-1
    np.polyfit line). The fit comes from trend_fit's exact-bigint-sum OLS;
    joining it back is a series-keyed equi join (per-series fit rows are
    tiny relative to points at any scale, and the join key matches the
    series partitioning every window op already uses)."""
    from .queries.relational import _T0_US, _TS_US, _trend_fit_sql

    from .sources import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    td = f"(CAST({_TS_US} - {_T0_US} AS DOUBLE) / 86400000000.0)"
    return spark.sql(
        f"""
        WITH fit AS ({_trend_fit_sql(_TS_US)}),
        pts AS (SELECT user_id, event_id, {td} AS x_day, value FROM events)
        SELECT p.user_id, p.event_id, p.x_day, p.value,
               f.intercept + f.slope * p.x_day AS trend
        FROM pts p JOIN fit f ON f.user_id = p.user_id
        """
    )


def write_plot_bundle(spark: SparkSession, sf_dir: str, out: str) -> DataFrame:
    """G19 end-to-end: ONE invocation materializes the three plot-data
    frames the reference renders per run — decomposition series+trend
    (c1.py:391-411), sampling-interval histogram (c2.py:332-341), and
    missing-pattern heatmap cells (d1.py:327-337) — as one hive-partitioned
    dataset: ``out/frame=<name>/``. A plotting client reads exactly the
    frame it needs via partition pruning. Returns a (frame, n_rows)
    summary built from the written files' parquet footers (driver-side
    metadata read — verifies the write landed without a re-scan)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    from .queries.events_ext import missing_pattern
    from .queries.relational import sampling_hist
    from .session import fast_commit

    fast_commit(spark)
    frames = {
        "decomposition": _decomposition_frame(spark, sf_dir),
        "sampling_hist": sampling_hist(spark, sf_dir),
        "missing_pattern": missing_pattern(spark, sf_dir),
    }

    def _write(item):
        # Spark job submission is thread-safe; the three writes are
        # independent jobs, so submitting them concurrently lets the
        # scheduler interleave their stages instead of serializing three
        # write-job latencies (bundle wall time ≈ the slowest frame).
        name, df = item
        path = os.path.join(out, f"frame={name}")
        df.write.mode("overwrite").parquet(path)
        n = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return name, n

    with ThreadPoolExecutor(max_workers=len(frames)) as pool:
        counts = list(pool.map(_write, frames.items()))
    return spark.createDataFrame(counts, "frame string, n_rows long")
