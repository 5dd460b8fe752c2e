"""Segment-stitched long-series generation: the time-axis scale-out path.

Pins the three guarantees longseries.py documents: bit-exact first segment,
exact time coverage, and stationary-moment agreement with a single-shot run.
"""

from __future__ import annotations

import numpy as np
import pytest

from synth_timeseries_data_spark.generation.kernel import generate_linear_config
from synth_timeseries_data_spark.generation.longseries import (
    generate_long_linear_series,
    segment_spans,
)

N, VARS, LAG, SEGS = 8000, 4, 2, 8


def test_segment_spans_cover_exactly():
    for n, k in [(100, 7), (8000, 8), (5, 8), (32, 32)]:
        spans = segment_spans(n, k)
        covered = [t for a, b in spans for t in range(a, b)]
        assert covered == list(range(n))


@pytest.fixture(scope="module")
def stitched(spark):
    df = generate_long_linear_series(
        spark, n_points=N, n_vars=VARS, max_lag=LAG, n_segments=SEGS
    )
    assert df.rdd.getNumPartitions() == SEGS  # one task per segment
    pdf = df.toPandas().sort_values("time").reset_index(drop=True)
    return pdf


def test_stitched_covers_time_axis_once(stitched):
    assert list(stitched["time"]) == list(range(N))


def test_first_segment_bitexact_vs_single_shot(stitched):
    """Segment 0 has no burn-in and the base seed: its rows must equal the
    single-shot kernel prefix bit-for-bit."""
    span0 = segment_spans(N, SEGS)[0]
    single = generate_linear_config(n_points=span0[1], n_vars=VARS, max_lag=LAG)
    cols = [f"X{i + 1}" for i in range(VARS)]
    got = stitched.iloc[: span0[1]][cols].to_numpy()
    want = single[cols].to_numpy()
    assert np.array_equal(got, want)


def _acf(x: np.ndarray, max_lag: int) -> np.ndarray:
    x = x - x.mean()
    denom = float(x @ x)
    return np.array(
        [float(x[lag:] @ x[:-lag]) / denom for lag in range(1, max_lag + 1)]
    )


def test_stitched_acf_matches_single_shot(stitched):
    """Second-order structure, not just marginals: the stitch must preserve
    the VAR's autocorrelation function. Lags 1..2·max_lag cover every direct
    recurrence coefficient plus their first-order interactions. Tolerance:
    ACF sampling error at N=8000 is ~1/√N ≈ 0.011 per series; segment
    boundaries contribute SEGS·max_lag/N ≈ 0.2 % of adjacent products, so
    |Δacf| < 0.05 is ~4σ — loose enough never to flake, tight enough that a
    burn-in regression (e.g. segments restarting cold) trips it immediately
    (a cold restart decorrelates ~an entire segment prefix, shifting lag-1
    ACF by >0.1)."""
    single = generate_linear_config(n_points=N, n_vars=VARS, max_lag=LAG)
    for i in range(VARS):
        c = f"X{i + 1}"
        a_single = _acf(single[c].to_numpy(), 2 * LAG)
        a_stitch = _acf(stitched[c].to_numpy(), 2 * LAG)
        worst = float(np.max(np.abs(a_single - a_stitch)))
        assert worst < 0.05, f"{c}: max |Δacf| over lags 1..{2 * LAG} = {worst:.4f}"


def test_stitched_moments_match_single_shot(stitched):
    """The SCM is a stable VAR: after burn-in every segment samples the same
    stationary law, so stitched mean/std must match a single-shot run of the
    full length within sampling error."""
    single = generate_linear_config(n_points=N, n_vars=VARS, max_lag=LAG)
    for i in range(VARS):
        c = f"X{i + 1}"
        s_single = float(single[c].std())
        s_stitch = float(stitched[c].std())
        assert abs(s_stitch - s_single) / s_single < 0.15, c
        # means are ~0 for the zero-mean SCM; compare on the std scale
        assert abs(float(stitched[c].mean()) - float(single[c].mean())) < 0.1 * s_single, c
