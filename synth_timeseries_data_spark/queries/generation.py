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
