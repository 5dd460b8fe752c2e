"""Generation queries — the scale-out face of the recurrence kernel (G6/G20).

The reference's sweep driver (Codes/a1.py:308-344) loops configs serially in
one process; the engine expresses the same sweep as a config DataFrame
grouped into `applyInPandas`, so a 1000-executor cluster generates millions
of configs with zero coordination — the sequential recurrence stays inside
each group exactly where it belongs (SURVEY.md §4.3.1).

Seeded-numpy streams are not expressible in SQL, so this query has no DuckDB
oracle (driver records a rows-only check); numeric fidelity is pinned by
tests/test_generation.py against the reference's seed-42 CSVs instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..generation.kernel import generate_linear_config
from . import register

_GRID = [
    (n, v, lag, noise)
    for n in (500, 1000, 3000, 5000)
    for v in (4, 6, 8)
    for lag in (2, 3, 4)
    for noise in ("gaussian", "student_t")
]

_OUT_SCHEMA = (
    "config_id string, n int, n_vars int, max_lag int, noise string, "
    "t int, var string, value double"
)


def _generate_group(pdf: pd.DataFrame) -> pd.DataFrame:
    cfg = pdf.iloc[0]
    wide = generate_linear_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    for col in ("n", "n_vars", "max_lag"):
        long[col] = int(cfg[col])
    long["noise"] = cfg["noise"]
    return long[
        ["config_id", "n", "n_vars", "max_lag", "noise", "t", "var", "value"]
    ]


@register("scm_generate", None)
def scm_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full linear-family factorial sweep (72 configs, seed 42 each —
    a1.py:326-333) through groupBy(config).applyInPandas. Long-form output
    (config, t, var, value) keeps the schema fixed across widths; one
    partition per config, no shuffle after generation."""
    grid = spark.createDataFrame(
        [
            (f"n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n, v, lag, noise in _GRID
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(_generate_group, _OUT_SCHEMA)


def _melt(cfg, wide: pd.DataFrame) -> pd.DataFrame:
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    for col in ("n", "n_vars", "max_lag"):
        long[col] = int(cfg[col])
    long["noise"] = cfg["noise"]
    return long[["config_id", "n", "n_vars", "max_lag", "noise", "t", "var", "value"]]


_IRR_SCHEMA = (
    "config_id string, n int, n_vars int, max_lag int, noise string, "
    "t double, var string, value double"
)


def _generate_irregular_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_irregular_config

    cfg = pdf.iloc[0]
    wide = generate_irregular_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    return _melt(cfg, wide)


@register("scm_generate_irregular", None)
def scm_generate_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular-sampling sweep (A2 family, a2.py:306-325): adaptive
    exponential timestamps + nearest-abs lag recurrence per config through
    applyInPandas. Sub-grid (n ≤ 1000) keeps the O(n²) per-series reference
    semantics cheap; the config axis is still the scale-out dimension."""
    grid = spark.createDataFrame(
        [
            (f"irr_n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n in (500, 1000)
            for v in (4, 6, 8)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_irregular_group, _IRR_SCHEMA
    )


def _generate_confounded_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_confounded_config

    cfg = pdf.iloc[0]
    wide = generate_confounded_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    return _melt(cfg, wide)


@register("scm_generate_confounded", None)
def scm_generate_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confounded sweep (A1C family, a1c.py:116-277): hidden U column +
    retry-queue contemporaneous scheduling. U rides along as an ordinary
    long-form var (quirk Q8); hiding it for discovery benchmarks is an
    explicit downstream filter."""
    grid = spark.createDataFrame(
        [
            (f"conf_n{n}_v4_l{lag}_{noise}", n, 4, lag, noise)
            for n in (500, 1000, 3000)
            for lag in (2, 3, 4)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_confounded_group, _OUT_SCHEMA
    )
