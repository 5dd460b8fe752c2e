"""As-of band-bound semantics.

The oracle's candidate band is DERIVED from the data (see
queries/timeseries.py::_asof_sql): B = max(rn − #rows below the trailing
2·mean_gap cut) + max tie-group + 1. Two properties pinned here:

1. banded == unbounded (the reference's O(n²) scan, a2.py:162-167) on the
   oracle fixture;
2. banded == unbounded on an ADVERSARIAL fixture whose burst (many rows
   inside one mean gap, plus a tie-run) breaks any fixed small band — the
   old fixture-calibrated 100-row constant is exactly the kind of bound
   this fixture is designed to invalidate.
"""

from __future__ import annotations

import duckdb

from synth_timeseries_data_spark.queries.timeseries import _asof_sql

_BAND_PRED = "p.rn >= c.rn - (SELECT b FROM band) AND "


def _cmp(con) -> None:
    banded = _asof_sql("epoch_us(ts)")
    assert _BAND_PRED in banded
    unbounded = banded.replace(_BAND_PRED, "")
    a = (
        con.execute(banded)
        .df()
        .sort_values(["user_id", "event_id", "k"])
        .reset_index(drop=True)
    )
    b = (
        con.execute(unbounded)
        .df()
        .sort_values(["user_id", "event_id", "k"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    assert a.equals(b)


def test_banded_asof_equals_unbounded(duck):
    _cmp(duck)


def test_banded_asof_equals_unbounded_adversarial_burst():
    """300 rows packed inside ~2 mean gaps (with 40 exact-tie timestamps),
    after a long regular run — the nearest-abs winner for post-burst probes
    sits hundreds of rn behind, so a fixed 100-row band would answer
    wrongly; the derived band must stretch automatically."""
    rows = []
    eid = 0
    # regular spine: 50 events, 1s apart
    for i in range(50):
        rows.append((eid, i * 1_000_000, 0.1 * i))
        eid += 1
    t0 = 50 * 1_000_000
    # burst: 260 events within 2s, then a 40-row tie-run at one timestamp
    for i in range(260):
        rows.append((eid, t0 + i * 7_700, 1.0 + 0.01 * i))
        eid += 1
    tie_t = t0 + 2_000_000
    for i in range(40):
        rows.append((eid, tie_t, 2.0 + 0.01 * i))
        eid += 1
    # post-burst probes: their k·mean_gap targets land inside/before the burst
    for i in range(10):
        rows.append((eid, tie_t + (i + 1) * 1_000_000, 3.0 + 0.1 * i))
        eid += 1

    con = duckdb.connect()
    values = ", ".join(f"({e}, {t}, {v})" for e, t, v in rows)
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT event_id, make_timestamp(tus) AS ts, 7 AS user_id, val AS value "
        f"FROM (VALUES {values}) t(event_id, tus, val)"
    )
    _cmp(con)
    con.close()
