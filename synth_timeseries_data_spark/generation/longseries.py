"""Segment-stitched generation of ONE very long series.

The sweep kernels scale out across configs (millions of independent series
at 100 TB), but a SINGLE series is a sequential recurrence — X[t] needs
X[t-1..t-L] — so stock operators cannot parallelize it across time. The
scale path SURVEY.md §4.3.1 prescribes is segment stitching: split the time
axis into contiguous spans, generate each span in parallel with a burn-in
prefix seeded per segment, discard the burn-in, and concatenate.

This is an APPROXIMATION, deliberately opt-in (the corpus sweeps never use
it): the reference's linear SCMs are stable VARs (spectral radius < 1 —
coefficients ≤ 0.4 with ≤ 4 lags), so the influence of initial conditions
decays geometrically and a burn-in of a few hundred steps makes each
segment's marginal distribution indistinguishable from the steady state.
Guarantees, pinned by tests/test_long_series.py:

- segment 0 carries NO burn-in and uses the base seed, so its rows are
  BIT-EXACT equal to the single-shot kernel's prefix;
- the stitched output covers time 0..n_points-1 exactly once;
- stitched moments match a single-shot run of the same length within
  sampling error (stationarity check).

Per-segment seeds are ``seed + 1000003 * seg_id`` — distinct numpy MT19937
streams, deterministic for any segment count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .kernel import generate_linear_config

_SEED_STRIDE = 1000003  # prime stride keeps per-segment seeds distinct


def segment_spans(n_points: int, n_segments: int) -> list[tuple[int, int]]:
    """Contiguous [start, stop) spans covering 0..n_points-1 exactly."""
    base = n_points // n_segments
    rem = n_points % n_segments
    spans, start = [], 0
    for s in range(n_segments):
        length = base + (1 if s < rem else 0)
        spans.append((start, start + length))
        start += length
    return [sp for sp in spans if sp[1] > sp[0]]


def generate_segment(
    seg_id: int,
    start: int,
    stop: int,
    n_vars: int,
    max_lag: int,
    noise_type: str = "gaussian",
    seed: int = 42,
    burn_in: int = 200,
) -> pd.DataFrame:
    """One stitched segment: kernel run of burn_in + span length, burn-in
    rows dropped, time relabeled to the global axis. Segment 0 runs with no
    burn-in and the base seed — bit-exact to the single-shot prefix."""
    span = stop - start
    warm = 0 if seg_id == 0 else burn_in
    wide = generate_linear_config(
        n_points=warm + span,
        n_vars=n_vars,
        max_lag=max_lag,
        noise_type=noise_type,
        seed=seed + _SEED_STRIDE * seg_id,
    )
    out = wide.iloc[warm:].copy()
    out["time"] = np.arange(start, stop)
    return out.reset_index(drop=True)


def generate_long_linear_series(
    spark: SparkSession,
    n_points: int,
    n_vars: int = 4,
    max_lag: int = 2,
    noise_type: str = "gaussian",
    seed: int = 42,
    n_segments: int = 32,
    burn_in: int = 200,
) -> DataFrame:
    """Distributed long-series generation: exactly one task per segment,
    wide output ``(time, X1..Xn)``. The grid has one row per segment, so
    round-robin ``repartition(N)`` + ``mapInPandas`` places each segment in
    its own partition — a hash ``groupBy`` would re-shuffle and collide
    ~1/e of the segments into shared tasks (measured: 18/32 partitions
    occupied, up to 3 segments serialized per task). Scale-out axis is the
    TIME dimension: a 10⁹-point series on 1000 executors is 1000 spans of
    10⁶ + burn-in."""
    spans = segment_spans(n_points, n_segments)
    values = ", ".join(f"({s}, {a}, {b})" for s, (a, b) in enumerate(spans))
    grid = spark.sql(
        f"SELECT * FROM (VALUES {values}) AS g(seg_id, start, stop)"
    )
    schema = (
        ", ".join(f"X{i + 1} double" for i in range(n_vars)) + ", time bigint"
    )

    def gen(batches):
        for pdf in batches:
            for _, cfg in pdf.iterrows():
                yield generate_segment(
                    int(cfg["seg_id"]), int(cfg["start"]), int(cfg["stop"]),
                    n_vars, max_lag, noise_type, seed, burn_in,
                )

    return grid.repartition(len(spans)).mapInPandas(gen, schema)
