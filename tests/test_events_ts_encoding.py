"""events.ts physical-encoding regression: the fixture has shipped both
INT64 TIMESTAMP(NANOS) and timestamp[us] (TIMESTAMP_NTZ) across driver
generations, and load() must normalize BOTH to the same epoch-nanosecond
BIGINT — timezone-free, matching DuckDB's naive-as-UTC epoch_us."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from synth_timeseries_data_spark.sources import load

_US = [0, 1_000_000, 1_700_000_000_123_456, 86_400_000_000]


def _write_events(tmp: str, ts_array: pa.Array) -> str:
    d = os.path.join(tmp, "sf")
    os.makedirs(d, exist_ok=True)
    n = len(ts_array)
    t = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="ts_enc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ts_values(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    return [r.ts for r in df.orderBy("event_id").select("ts").collect()]


def test_timestamp_us_reads_as_epoch_nanos(spark, tmpdir):
    d = _write_events(tmpdir, pa.array(_US, pa.timestamp("us")))
    assert _ts_values(spark, d) == [u * 1000 for u in _US]


def test_timestamp_nanos_reads_as_epoch_nanos(spark, tmpdir):
    d = _write_events(
        os.path.join(tmpdir, "ns"), pa.array([u * 1000 for u in _US], pa.timestamp("ns"))
    )
    assert _ts_values(spark, d) == [u * 1000 for u in _US]


def test_encodings_agree_with_duckdb_epoch_us(spark, tmpdir, duck):
    d = _write_events(os.path.join(tmpdir, "x"), pa.array(_US, pa.timestamp("us")))
    duck_us = [
        r[0]
        for r in duck.execute(
            f"SELECT epoch_us(ts) FROM read_parquet('{d}/events.parquet') ORDER BY event_id"
        ).fetchall()
    ]
    assert [v // 1000 for v in _ts_values(spark, d)] == duck_us


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_stream_events_handles_both_encodings(spark, tmpdir, unit):
    """The STREAMING reader sniffs the parquet footer and must normalize
    both physical encodings to the same epoch-ns bigint + ts_event
    timestamp as the batch loader (a hardcoded schema broke when the
    driver's fixture flipped encodings between rounds)."""
    from synth_timeseries_data_spark.streaming import stream_events

    vals = (
        pa.array(_US, pa.timestamp("us"))
        if unit == "us"
        else pa.array([u * 1000 for u in _US], pa.timestamp("ns"))
    )
    d = _write_events(os.path.join(tmpdir, f"stream_{unit}"), vals)
    q = (
        stream_events(spark, d)
        .writeStream.format("memory")
        .queryName(f"enc_{unit}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        rows = spark.sql(
            f"SELECT ts FROM enc_{unit} ORDER BY event_id"
        ).collect()
        assert [r.ts for r in rows] == [u * 1000 for u in _US]
    finally:
        q.stop()


@pytest.mark.parametrize("tz", ["Pacific/Kiritimati", "America/New_York"])
@pytest.mark.parametrize("ntz_infer", ["true", "false"])
def test_epoch_values_invariant_to_session_timezone(spark, tmpdir, tz, ntz_infer):
    """A caller-owned session may run in any timezone, with or without
    TIMESTAMP_NTZ inference. The normalized epoch-ns values must be
    IDENTICAL in every combination (naive-as-UTC, matching the DuckDB
    oracle's epoch_us) — a tz-dependent load would shift every event
    query's windows by the session offset."""
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_ntz = spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZEnabled", "true"
    )
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZEnabled", ntz_infer)
        d = _write_events(
            os.path.join(tmpdir, f"tz_{tz.replace('/', '_')}_{ntz_infer}"),
            pa.array(_US, pa.timestamp("us")),
        )
        assert _ts_values(spark, d) == [u * 1000 for u in _US]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZEnabled", prev_ntz)
