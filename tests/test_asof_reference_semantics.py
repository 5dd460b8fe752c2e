"""asof_lag vs a direct numpy reimplementation of the REFERENCE semantics.

The DuckDB oracle and the Spark plan are both engine artifacts; this test
pins them against a third, independent implementation that transcribes the
reference's nearest-abs lookup semantics (a2.py:162-167, 220-223) directly:
for each row t with rank ≥ 2 and lag k ∈ {1, 2}, target = t − k·mean_gap
(mean_gap over the WHOLE series — quirk Q5's deliberate look-ahead),
answer = argmin over ALL prior rows of |past_t − target| with numpy's
first-index tie-break. Randomized irregular series with engineered
timestamp ties, plus singleton/2-row users.
"""

from __future__ import annotations

import numpy as np
import pytest

from synth_timeseries_data_spark.queries.timeseries import _ASOF_SPARK


def _numpy_asof(rows):
    """rows: list of (event_id, tus, user_id, value) — returns
    {(user_id, event_id, k): (lag_value, lag_event_id, delta_sec)}."""
    out = {}
    by_user = {}
    for eid, tus, uid, val in rows:
        by_user.setdefault(uid, []).append((tus, eid, val))
    for uid, evs in by_user.items():
        evs.sort()  # (tus, event_id) — matches ORDER BY ts, event_id
        n = len(evs)
        if n < 2:
            continue
        t = np.array([e[0] for e in evs], dtype=np.float64)
        # mean(diff) telescoped to (max-min)/(n-1), the engine's formula
        mean_gap = (t[-1] - t[0]) / (n - 1)
        for i in range(1, n):
            for k in (1, 2):
                target = t[i] - k * mean_gap
                deltas = np.abs(t[:i] - target)
                j = int(np.argmin(deltas))  # first index on ties
                out[(uid, evs[i][1], k)] = (
                    evs[j][2],
                    evs[j][1],
                    float(deltas[j]) / 1e6,
                )
    return out


def _fixture(seed: int):
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for uid in range(1, 4):
        n = int(rng.integers(40, 120))
        # coarse grid forces exact-tie timestamps inside a series
        gaps = rng.integers(0, 5, size=n) * 500_000
        tus = np.cumsum(gaps) + 1_000_000
        for t in tus:
            rows.append((eid, int(t), uid, round(float(rng.normal()), 3)))
            eid += 1
    rows.append((eid, 777_000, 50, 1.25))  # singleton
    eid += 1
    rows.append((eid, 1_000_000, 51, 0.5))  # 2-row series
    eid += 1
    rows.append((eid, 3_000_000, 51, 0.75))
    return rows


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_spark_asof_matches_numpy_reference(spark, seed):
    rows = _fixture(seed)
    want = _numpy_asof(rows)
    sdf = spark.createDataFrame(
        [(e, t * 1000, u, v) for e, t, u, v in rows],
        "event_id BIGINT, ts BIGINT, user_id BIGINT, value DOUBLE",
    )
    sdf.createOrReplaceTempView("events")
    try:
        got_rows = spark.sql(_ASOF_SPARK).collect()
    finally:
        spark.catalog.dropTempView("events")
    got = {
        (r.user_id, r.event_id, r.k): (r.lag_value, r.lag_event_id, r.delta_sec)
        for r in got_rows
    }
    assert set(got) == set(want)
    for key, (val, lag_eid, delta) in want.items():
        gval, geid, gdelta = got[key]
        assert gval == val and geid == lag_eid, (key, got[key], want[key])
        assert gdelta == pytest.approx(delta, abs=1e-9)
