from .ops import (
    read_stream_table,
    run_available_now,
    streaming_dedup,
    streaming_hourly_agg,
    streaming_sessionize,
)

__all__ = [
    "read_stream_table",
    "run_available_now",
    "streaming_dedup",
    "streaming_hourly_agg",
    "streaming_sessionize",
]
