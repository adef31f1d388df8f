"""Structured Streaming layer (see `jobs` for the stream wrappers of
the batch time-window plans in `plans/streaming_queries.py`)."""

from datawarehouse_code_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    session_counts_stream,
    tumbling_counts_stream,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "session_counts_stream",
    "tumbling_counts_stream",
]
