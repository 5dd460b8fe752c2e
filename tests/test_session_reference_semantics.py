"""session_agg vs a direct gaps-and-islands reimplementation.

Independent check of the 30-minute-inactivity session semantics (the
session_window analog and the reference's burst-mask state family):
randomized irregular series with gaps engineered around the threshold —
strictly-greater-than-gap starts a new session, an exactly-30-minute gap
does NOT — plus ties and a singleton series.
"""

from __future__ import annotations

import numpy as np
import pytest

from synth_timeseries_data_spark.queries import all_queries

_GAP_US = 1_800_000_000


def _numpy_sessions(rows):
    by_user = {}
    for eid, tus, uid in rows:
        by_user.setdefault(uid, []).append((tus, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sess_no = 0
        prev = None
        for tus, _eid in evs:
            if prev is None or tus - prev > _GAP_US:
                sess_no += 1
            key = (uid, sess_no)
            n, lo, hi = out.get(key, (0, tus, tus))
            out[key] = (n + 1, min(lo, tus), max(hi, tus))
            prev = tus
    return out


@pytest.mark.parametrize("seed", [5, 77])
def test_session_agg_matches_numpy_reference(spark, seed, tmp_path):
    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for uid in range(1, 4):
        t = 0
        for _ in range(int(rng.integers(20, 60))):
            # gaps straddle the threshold: under, EXACTLY equal, and over
            gap = int(rng.choice([60, _GAP_US // 1000, 1_800_000, 1_800_001, 7_200_000]))
            t += gap * 1_000  # ms→us jitter-free integer gaps
            rows.append((eid, t, uid))
            eid += 1
    rows.append((eid, 123_456, 9))  # singleton
    eid += 1
    want = _numpy_sessions(rows)

    import os

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [(e, t * 1000, u, "view", 1.0, None) for e, t, u in rows],
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING,"
        " value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    got = {
        (r.user_id, r.session_no): (r.n_events, r.session_start_us, r.session_end_us)
        for r in all_queries()["session_agg"].build(spark, sf_dir).collect()
    }
    assert got == want
