from .live_state import (
    dedup_stream,
    interval_join_stream,
    latest_value_stream,
    sessionize_stream,
    stateful_latest_value,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream",
    "interval_join_stream",
    "latest_value_stream",
    "sessionize_stream",
    "stateful_latest_value",
    "windowed_event_counts",
]
