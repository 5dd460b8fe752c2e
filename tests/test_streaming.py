"""Streaming behavior tests: each streaming job, run to completion with the
availableNow trigger, must produce the same aggregation results as its
batch analog (the oracle-checked streaming_analog queries)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from synth_timeseries_data_spark.streaming import (
    stream_events,
    streaming_dedup,
    tumbling_stream,
)


@pytest.fixture(scope="module")
def events_dir(smoke_sf_dir):
    # The file-stream source requires a DIRECTORY; the fixture is one file.
    d = tempfile.mkdtemp(prefix="stream_events_")
    shutil.copy(
        os.path.join(smoke_sf_dir, "events.parquet"),
        os.path.join(d, "part-0.parquet"),
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, events_dir, smoke_sf_dir):
    from synth_timeseries_data_spark.queries import all_queries

    stream = tumbling_stream(stream_events(spark, events_dir))
    q = _run_to_memory(stream, "tumbling_t")
    try:
        got = (
            spark.sql("SELECT * FROM tumbling_t")
            .toPandas()
            .sort_values(["hour_bucket", "event_type"])
            .reset_index(drop=True)
        )
        batch = (
            all_queries()["tumbling_agg"]
            .build(spark, smoke_sf_dir)
            .toPandas()
            .sort_values(["hour_bucket", "event_type"])
            .reset_index(drop=True)
        )
        assert got[["hour_bucket", "event_type", "n_events", "sum_value"]].equals(
            batch[["hour_bucket", "event_type", "n_events", "sum_value"]]
        )
    finally:
        q.stop()


def test_streaming_dedup_keeps_all_unique(spark, events_dir):
    """event_id is unique in the fixture, so watermarked dedup must be a
    row-preserving pass-through (state bounded by the watermark)."""
    ded = streaming_dedup(stream_events(spark, events_dir))
    out_dir = tempfile.mkdtemp(prefix="stream_dedup_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        q = (
            ded.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n_stream = spark.read.parquet(out_dir).count()
        n_batch = spark.read.parquet(events_dir).count()
        assert n_stream == n_batch
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_lagged_stream_matches_batch_flagship(spark, events_dir, smoke_sf_dir):
    """The custom stateful operator (applyInPandasWithState) must reproduce
    the batch flagship lag_features exactly: per-user last-two-values state,
    LAG-with-NULLs semantics, (ts, event_id) ordering."""
    from synth_timeseries_data_spark.queries import all_queries
    from synth_timeseries_data_spark.streaming import lagged_stream, stream_events

    q = _run_to_memory_append(
        lagged_stream(stream_events(spark, events_dir)), "lagged_t"
    )
    try:
        cols = ["user_id", "event_id", "ts_us", "value",
                "value_lag1", "value_lag2", "value_diff1"]
        got = (
            spark.sql("SELECT * FROM lagged_t")
            .toPandas()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)[cols]
        )
        batch = (
            all_queries()["lag_features"]
            .build(spark, smoke_sf_dir)
            .toPandas()
            .sort_values(["user_id", "event_id"])
            .reset_index(drop=True)[cols]
        )
        assert len(got) == len(batch) > 0
        import pandas.testing as pdt

        pdt.assert_frame_equal(got, batch, check_dtype=False)
    finally:
        q.stop()


def _run_to_memory_append(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q
