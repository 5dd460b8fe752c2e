"""The as-of band bound must be semantics-preserving: nearest-abs over the
last 100 past rows == nearest-abs over the FULL prefix (the reference's
O(n²) scan, a2.py:162-167) on the oracle fixture."""

from __future__ import annotations

from synth_timeseries_data_spark.queries.timeseries import _asof_sql


def test_banded_asof_equals_unbounded(duck):
    banded = _asof_sql("epoch_us(ts)")
    unbounded = banded.replace("p.rn >= c.rn - 100 AND ", "")
    a = duck.execute(banded).df().sort_values(["user_id", "event_id", "k"]).reset_index(drop=True)
    b = duck.execute(unbounded).df().sort_values(["user_id", "event_id", "k"]).reset_index(drop=True)
    assert a.equals(b)
