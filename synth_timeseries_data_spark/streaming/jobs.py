"""Structured-Streaming jobs over the event stream.

`readStream` file source replaying the events parquet → watermarked
windowed aggregations / session windows / stateful dedup. Each job's
aggregation semantics must equal its batch analog in
queries/streaming_analog.py — asserted by tests/test_streaming.py using the
availableNow trigger (process-everything-then-stop), which makes streaming
output comparable to batch output.

events.ts arrives as an epoch-ns BIGINT (session.py nanosAsLong), so jobs
first materialize a real TIMESTAMP column — watermarks and window() need
event-time typing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of events with a proper event-time column.

    `maxFilesPerTrigger=1` keeps micro-batches small; ts_event converts the
    nanosecond BIGINT to TIMESTAMP via microseconds.
    """
    raw = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return raw.withColumn(
        "ts_event", F.timestamp_micros(F.expr("ts div 1000"))
    )


def tumbling_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked 1-hour tumbling aggregation — the streaming twin of the
    tumbling_agg query; late rows beyond the watermark are dropped."""
    return (
        events.withWatermark("ts_event", watermark)
        .groupBy(F.window("ts_event", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.floor(F.col("value") * 1000000.0).cast("bigint")).cast(
                    "double"
                )
                / 1000000.0
            ).alias("sum_value"),
        )
        .select(
            (F.unix_micros("window.start") / 3_600_000_000)
            .cast("bigint")
            .alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with an inactivity gap — the streaming form of the
    reference's burst semantics (G14) and of the session_agg analog."""
    return (
        events.withWatermark("ts_event", "10 minutes")
        .groupBy(F.session_window("ts_event", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon —
    `dropDuplicates` with event-time bound so state is reclaimable."""
    return events.withWatermark("ts_event", watermark).dropDuplicates(
        ["event_id", "ts_event"]
    )
