from .windows import (
    run_stream_to_table,
    stream_events,
    stream_session_stats,
    stream_tumbling_counts,
)

__all__ = [
    "run_stream_to_table",
    "stream_events",
    "stream_session_stats",
    "stream_tumbling_counts",
]
