from .ops import (
    final_user_stats,
    read_stream_table,
    run_available_now,
    streaming_contamination,
    streaming_dedup,
    streaming_dedup_against,
    streaming_semdedup_against,
    streaming_hourly_agg,
    streaming_merge,
    streaming_sessionize,
    streaming_user_stats,
)

__all__ = [
    "final_user_stats",
    "read_stream_table",
    "run_available_now",
    "streaming_contamination",
    "streaming_dedup",
    "streaming_dedup_against",
    "streaming_semdedup_against",
    "streaming_hourly_agg",
    "streaming_merge",
    "streaming_sessionize",
    "streaming_user_stats",
]
