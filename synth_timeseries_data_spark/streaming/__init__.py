"""Structured-Streaming jobs (EXT surface — the reference is pure batch)."""

from .jobs import (  # noqa: F401
    contamination_stream,
    docdedup_stream,
    lagged_stream,
    mix_stream,
    packing_stream,
    sessionized_stream,
    sliding_stream,
    stream_documents,
    stream_events,
    streaming_dedup,
    train_fingerprints,
    tumbling_stream,
)
