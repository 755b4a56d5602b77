from .pipelines import (
    read_events_stream,
    run_foreach_batch,
    run_to_memory,
    session_window_counts,
    sessionize_stateful,
    stream_stream_range_join,
    windowed_counts,
)

__all__ = [
    "read_events_stream",
    "run_foreach_batch",
    "run_to_memory",
    "session_window_counts",
    "sessionize_stateful",
    "stream_stream_range_join",
    "windowed_counts",
]
