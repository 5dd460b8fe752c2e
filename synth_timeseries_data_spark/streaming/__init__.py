"""Structured-Streaming jobs (EXT surface — the reference is pure batch)."""

from .jobs import (  # noqa: F401
    lagged_stream,
    sessionized_stream,
    sliding_stream,
    stream_events,
    streaming_dedup,
    tumbling_stream,
)
