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


def _generate_poly_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_poly_mixture_config

    cfg = pdf.iloc[0]
    wide = generate_poly_mixture_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["mix_ratio"]), seed=42,
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    long["mix_ratio"] = float(cfg["mix_ratio"])
    return long[["config_id", "mix_ratio", "t", "var", "value"]]


@register("scm_generate_poly", None)
def scm_generate_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial/mixture-noise sweep (B2 family, b2.py:328-365) over the
    mix-ratio grid — quadratic-only effective dynamics (quirk Q1), adaptive
    irregular timestamps, per-config applyInPandas."""
    grid = spark.createDataFrame(
        [
            (f"poly_n{n}_v{v}_l{lag}_r{int(r * 100)}", n, v, lag, r)
            for n in (500, 1000)
            for v in (4, 6)
            for lag in (2, 3)
            for r in (0.3, 0.5, 0.7)
        ],
        "config_id string, n int, n_vars int, max_lag int, mix_ratio double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_poly_group,
        "config_id string, mix_ratio double, t double, var string, value double",
    )


def _generate_trendseason_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_trend_season_config

    cfg = pdf.iloc[0]
    wide = generate_trend_season_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["trend_strength"]), float(cfg["seasonal_strength"]), seed=42,
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_trend", None)
def scm_generate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend+seasonality sweep (C1 family, c1.py:423-454) over the
    (trend, seasonal) strength grid."""
    grid = spark.createDataFrame(
        [
            (f"c1_n{n}_v4_l{lag}_t{int(ts * 100)}_s{int(ss * 10)}", n, 4, lag, ts, ss)
            for n in (500, 1000)
            for lag in (2, 3, 4)
            for ts in (0.01, 0.02)
            for ss in (0.3, 0.5)
        ],
        "config_id string, n int, n_vars int, max_lag int, "
        "trend_strength double, seasonal_strength double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_trendseason_group,
        "config_id string, t long, var string, value double",
    )


def _generate_mcar_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_mcar_config

    cfg = pdf.iloc[0]
    missing, complete = generate_mcar_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        cfg["noise"], float(cfg["rate"]), seed=42,
    )
    value_cols = [c for c in complete.columns if c != "time"]
    out_rows = []
    for var in value_cols:
        out_rows.append(
            pd.DataFrame(
                {
                    "config_id": cfg["config_id"],
                    "rate": float(cfg["rate"]),
                    "t": complete["time"],
                    "var": var,
                    "value_complete": complete[var],
                    "value_observed": missing[var],
                }
            )
        )
    return pd.concat(out_rows, ignore_index=True)


@register("scm_generate_mcar", None)
def scm_generate_mcar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCAR sweep (D1 family, d1.py:380-419): missing and complete versions
    of every cell side by side (the reference persists both files). The
    kernel replicates the reference's two-pass memo-shadowing bug, which the
    shipped corpus confirms (X1/X3 identically zero in 4-var datasets)."""
    grid = spark.createDataFrame(
        [
            (f"mcar_n{n}_v4_l{lag}_{noise}_r{int(r * 100)}", n, 4, lag, noise, r)
            for n in (500, 1000)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
            for r in (0.1, 0.2, 0.3)
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string, rate double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_mcar_group,
        "config_id string, rate double, t long, var string, "
        "value_complete double, value_observed double",
    )


_PAIR_SCHEMA = (
    "config_id string, t double, var string, "
    "value_complete double, value_observed double"
)


def _pair_long(cfg, missing: pd.DataFrame, complete: pd.DataFrame) -> pd.DataFrame:
    value_cols = [c for c in complete.columns if c != "time"]
    rows = []
    for var in value_cols:
        rows.append(
            pd.DataFrame(
                {
                    "config_id": cfg["config_id"],
                    "t": complete["time"],
                    "var": var,
                    "value_complete": complete[var],
                    "value_observed": missing[var],
                }
            )
        )
    return pd.concat(rows, ignore_index=True)


def _generate_block_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_block_missing_config

    cfg = pdf.iloc[0]
    missing, complete = generate_block_missing_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        cfg["noise"], float(cfg["block_prob"]), seed=42,
    )
    return _pair_long(cfg, missing, complete)


@register("scm_generate_block", None)
def scm_generate_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-missingness sweep (D2 family, d2.py:453-470): polynomial
    dynamics over irregular time with the Markov burst mask, both missing
    and complete outputs."""
    grid = spark.createDataFrame(
        [
            (f"blk_n{n}_v4_l{lag}_{noise}_b{int(p * 100)}", n, 4, lag, noise, p)
            for n in (500, 1000)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
            for p in (0.1, 0.2, 0.3)
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string, block_prob double",
    )
    return grid.groupBy("config_id").applyInPandas(_generate_block_group, _PAIR_SCHEMA)


def _generate_mixed_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_mixed_missing_config

    cfg = pdf.iloc[0]
    missing, complete = generate_mixed_missing_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["mix_ratio"]), float(cfg["mcar_prob"]), float(cfg["block_prob"]),
        seed=42,
    )
    return _pair_long(cfg, missing, complete)


@register("scm_generate_mixed", None)
def scm_generate_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-missingness sweep (D3 family, d3.py:389-436): trig dynamics +
    mixture noise + MCAR ∪ block masks over the reference's grid corners."""
    grid = spark.createDataFrame(
        [
            (
                f"mix_n{n}_v4_l{lag}_r{int(r * 100)}_m{int(m * 100)}_b{int(b * 100)}",
                n, 4, lag, r, m, b,
            )
            for n in (500, 1000)
            for lag in (2, 3)
            for r in (0.3, 0.5, 0.7)
            for m in (0.05, 0.1)
            for b in (0.05, 0.1)
        ],
        "config_id string, n int, n_vars int, max_lag int, "
        "mix_ratio double, mcar_prob double, block_prob double",
    )
    return grid.groupBy("config_id").applyInPandas(_generate_mixed_group, _PAIR_SCHEMA)


# ---------------------------------------------------------------------------
# Confounded twins (kernel_confounded.py): every family with hidden U.
# U rides along as an ordinary long-form var (quirk Q8 — the reference
# persists it); hiding it for discovery benchmarks is a downstream filter.
# ---------------------------------------------------------------------------


def _generate_conf_poly_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import generate_confounded_poly_config

    cfg = pdf.iloc[0]
    wide = generate_confounded_poly_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    return _melt(cfg, wide)


@register("scm_generate_poly_confounded", None)
def scm_generate_poly_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1C sweep (b1c.py:355-390): polynomial + U^2, regular sampling —
    quadratic-only effective dynamics (quirk Q1) with the confounder's
    square honored."""
    grid = spark.createDataFrame(
        [
            (f"b1c_n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n in (500, 1000)
            for v in (4, 6)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(_generate_conf_poly_group, _OUT_SCHEMA)


_IRR_NOCFG_SCHEMA = "config_id string, t double, var string, value double"


def _generate_conf_mixture_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import generate_confounded_poly_mixture_config

    cfg = pdf.iloc[0]
    wide = generate_confounded_poly_mixture_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["mix_ratio"]), seed=42,
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_mixture_confounded", None)
def scm_generate_mixture_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2C sweep (b2c.py:241-280): polynomial + U^2 over irregular time with
    Gaussian(+)Laplace mixture noise across the mix-ratio grid."""
    grid = spark.createDataFrame(
        [
            (f"b2c_n{n}_v4_l{lag}_r{int(r * 100)}", n, 4, lag, r)
            for n in (500, 1000)
            for lag in (2, 3)
            for r in (0.3, 0.5, 0.7)
        ],
        "config_id string, n int, n_vars int, max_lag int, mix_ratio double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_mixture_group, _IRR_NOCFG_SCHEMA
    )


def _generate_conf_irr_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import generate_confounded_irregular_config

    cfg = pdf.iloc[0]
    wide = generate_confounded_irregular_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_irregular_confounded", None)
def scm_generate_irregular_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2C sweep (a2c.py:330-370): linear + U over irregular time. The
    reference's link extractor skips every RHS containing the letter 'e'
    (a2c.py:227-231) — all registry equations carry noise terms, so the
    shipped A2C corpus is pure noise; replicated for fidelity (kernel
    docstring)."""
    grid = spark.createDataFrame(
        [
            (f"a2c_n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n in (500, 1000)
            for v in (4, 6)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_irr_group, _IRR_NOCFG_SCHEMA
    )


def _generate_conf_trend_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import generate_confounded_trend_season_config

    cfg = pdf.iloc[0]
    wide = generate_confounded_trend_season_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["trend_strength"]), float(cfg["seasonal_strength"]), seed=42,
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_trend_confounded", None)
def scm_generate_trend_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1C sweep (c1c.py:generate_all_combinations): trig + trend/season +
    linear U over the (trend, seasonal) strength grid."""
    grid = spark.createDataFrame(
        [
            (f"c1c_n{n}_v4_l{lag}_t{int(ts * 100)}_s{int(ss * 10)}", n, 4, lag, ts, ss)
            for n in (500, 1000)
            for lag in (2, 3)
            for ts in (0.01, 0.02)
            for ss in (0.3, 0.5)
        ],
        "config_id string, n int, n_vars int, max_lag int, "
        "trend_strength double, seasonal_strength double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_trend_group, "config_id string, t long, var string, value double"
    )


def _generate_conf_trig_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import (
        generate_confounded_trig_irregular_config,
    )

    cfg = pdf.iloc[0]
    wide = generate_confounded_trig_irregular_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_trig_confounded", None)
def scm_generate_trig_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2C sweep (c2c.py:330-370): trig + continuous-time seasonality over
    irregular time with U — linear-U quirk replicated (kernel docstring)."""
    grid = spark.createDataFrame(
        [
            (f"c2c_n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n in (500, 1000)
            for v in (4, 6)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_trig_group, _IRR_NOCFG_SCHEMA
    )


def _generate_conf_mcar_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import generate_confounded_mcar_config

    cfg = pdf.iloc[0]
    missing, complete = generate_confounded_mcar_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        cfg["noise"], float(cfg["rate"]), seed=42,
    )
    out = _pair_long(cfg, missing, complete)
    out["t"] = out["t"].astype("int64")
    return out


@register("scm_generate_mcar_confounded", None)
def scm_generate_mcar_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1C sweep (d1c.py:418-460): linear + U + MCAR on X only (U fully
    observed, d1c.py:246-251); missing and complete versions side by side.
    Replicates the reference's two-pass memo-shadowing bug (kernel
    docstring)."""
    grid = spark.createDataFrame(
        [
            (f"d1c_n{n}_v4_l{lag}_{noise}_r{int(r * 100)}", n, 4, lag, noise, r)
            for n in (500, 1000)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
            for r in (0.1, 0.2, 0.3)
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string, rate double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_mcar_group,
        "config_id string, t long, var string, "
        "value_complete double, value_observed double",
    )


def _generate_conf_block_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import (
        generate_confounded_block_missing_config,
    )

    cfg = pdf.iloc[0]
    missing, complete = generate_confounded_block_missing_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        cfg["noise"], float(cfg["block_prob"]), seed=42,
    )
    return _pair_long(cfg, missing, complete)


@register("scm_generate_block_confounded", None)
def scm_generate_block_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2C sweep (d2c.py:505-560): polynomial + U^2 irregular dynamics with
    the Markov burst mask on X only; U always observed (d2c.py:257)."""
    grid = spark.createDataFrame(
        [
            (f"d2c_n{n}_v4_l{lag}_{noise}_b{int(p * 100)}", n, 4, lag, noise, p)
            for n in (500, 1000)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
            for p in (0.1, 0.2, 0.3)
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string, block_prob double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_block_group, _PAIR_SCHEMA
    )


def _generate_conf_mixed_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel_confounded import (
        generate_confounded_mixed_missing_config,
    )

    cfg = pdf.iloc[0]
    missing, complete = generate_confounded_mixed_missing_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]),
        float(cfg["mix_ratio"]), float(cfg["mcar_prob"]), float(cfg["block_prob"]),
        seed=42,
    )
    return _pair_long(cfg, missing, complete)


@register("scm_generate_mixed_confounded", None)
def scm_generate_mixed_confounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3C sweep (d3c.py:440-500): trig + mixture noise + MCAR ∪ block
    masks + U with the warmup double-draw (kernel docstring)."""
    grid = spark.createDataFrame(
        [
            (
                f"d3c_n{n}_v4_l{lag}_r{int(r * 100)}_m{int(m * 100)}_b{int(b * 100)}",
                n, 4, lag, r, m, b,
            )
            for n in (500, 1000)
            for lag in (2, 3)
            for r in (0.3, 0.5, 0.7)
            for m in (0.05, 0.1)
            for b in (0.05, 0.1)
        ],
        "config_id string, n int, n_vars int, max_lag int, "
        "mix_ratio double, mcar_prob double, block_prob double",
    )
    return grid.groupBy("config_id").applyInPandas(
        _generate_conf_mixed_group, _PAIR_SCHEMA
    )


def _generate_trig_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from ..generation.kernel import generate_trig_irregular_config

    cfg = pdf.iloc[0]
    wide = generate_trig_irregular_config(
        int(cfg["n"]), int(cfg["n_vars"]), int(cfg["max_lag"]), cfg["noise"], seed=42
    )
    long = wide.melt(id_vars=["time"], var_name="var", value_name="value")
    long = long.rename(columns={"time": "t"})
    long["config_id"] = cfg["config_id"]
    return long[["config_id", "t", "var", "value"]]


@register("scm_generate_trig_irregular", None)
def scm_generate_trig_irregular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular trig sweep (C2 family, c2.py:354-392): continuous-time
    seasonality over adaptive timestamps."""
    grid = spark.createDataFrame(
        [
            (f"c2_n{n}_v{v}_l{lag}_{noise}", n, v, lag, noise)
            for n in (500, 1000)
            for v in (4, 6)
            for lag in (2, 3)
            for noise in ("gaussian", "student_t")
        ],
        "config_id string, n int, n_vars int, max_lag int, noise string",
    )
    return grid.groupBy("config_id").applyInPandas(_generate_trig_group, _PAIR_SCHEMA.replace(
        ", value_complete double, value_observed double", ", value double"))
