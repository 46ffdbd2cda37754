from .pipelines import (
    events_stream,
    run_to_memory,
    stream_distinct_keys,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_agg,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "stream_distinct_keys",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_agg",
]
