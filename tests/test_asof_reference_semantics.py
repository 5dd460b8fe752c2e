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


def test_asof_join_orders_interleaved_semantics(spark):
    """Two-table as-of semantics on a constructed interleaving the
    driver fixture cannot exercise (its orders all precede its events):
    events before any order -> NULL; an order AT the event instant
    matches (>= semantics); later orders supersede earlier ones; two
    orders on the same (cust, date) resolve to the highest orderkey on
    BOTH engines (native ASOF tie behavior is engine-unspecified, so
    Spark resolves the tie inside the union window's orderkey-ASC
    LAST_VALUE carry and the oracle dedups before its ASOF). Spark's
    join-free union-bracket plan vs DuckDB's native ASOF LEFT JOIN."""
    import pandas as pd

    from synth_timeseries_data_spark.queries.timeseries import (
        _ASOFJ_DUCK,
        _ASOFJ_SPARK,
        _orders_us_view,
    )

    US = 1_000_000
    orders = pd.DataFrame(
        [
            # cust 1: two orders, the second supersedes; a tie pair at t=500
            (101, 1, "O", 10.0, pd.Timestamp(100 * US * 1000)),
            (102, 1, "O", 20.0, pd.Timestamp(300 * US * 1000)),
            (103, 1, "O", 31.0, pd.Timestamp(500 * US * 1000)),
            (104, 1, "O", 32.0, pd.Timestamp(500 * US * 1000)),
            # cust 2: one order only after every event
            (201, 2, "O", 9.0, pd.Timestamp(900 * US * 1000)),
        ],
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
        ],
    )
    events = pd.DataFrame(
        [
            (1, pd.Timestamp(50 * US * 1000), 1, "view", 1.0, None),
            (2, pd.Timestamp(100 * US * 1000), 1, "view", 1.0, None),  # == order ts
            (3, pd.Timestamp(350 * US * 1000), 1, "view", 1.0, None),
            (4, pd.Timestamp(500 * US * 1000), 1, "view", 1.0, None),  # tie pair
            (5, pd.Timestamp(700 * US * 1000), 2, "view", 1.0, None),  # before cust2's order
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    # engine-canonical nanos bigint ts on the Spark side, like load()
    spark.createDataFrame(events).selectExpr(
        "event_id", "CAST(unix_micros(ts) AS BIGINT) * 1000 AS ts",
        "user_id", "event_type", "value", "props",
    ).createOrReplaceTempView("events")
    from pyspark.sql import functions as F

    sdf_orders = spark.createDataFrame(orders)
    sdf_orders.withColumn(
        "od_us", F.unix_micros("o_orderdate")
    ).createOrReplaceTempView("orders_us")
    try:
        got = {
            r.event_id: r
            for r in spark.sql(_ASOFJ_SPARK).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        spark.catalog.dropTempView("orders_us")

    assert got[1].o_orderkey is None and got[1].us_since_order is None
    assert got[2].o_orderkey == 101 and got[2].us_since_order == 0
    assert got[3].o_orderkey == 102
    assert got[4].o_orderkey == 104  # tie: highest orderkey, matched at ts
    assert got[5].o_orderkey is None  # cust 2's only order is later

    # DuckDB native ASOF on the same fixture agrees row-for-row (fresh
    # connection — the session-scoped oracle fixture's views must not be
    # clobbered)
    import duckdb

    con = duckdb.connect()
    con.register("orders_py", orders)
    con.register("events_py", events)
    con.execute("CREATE VIEW orders AS SELECT * FROM orders_py")
    con.execute("CREATE VIEW events AS SELECT * FROM events_py")
    drows = {r[0]: r for r in con.execute(_ASOFJ_DUCK).fetchall()}
    for eid, r in got.items():
        dr = drows[eid]
        assert (dr[3], dr[4], dr[5]) == (
            r.o_orderkey,
            r.o_totalprice,
            r.us_since_order,
        ), eid
