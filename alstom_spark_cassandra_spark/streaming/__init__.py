from .live_state import (
    latest_value_stream,
    stateful_latest_value,
    windowed_event_counts,
)

__all__ = [
    "latest_value_stream",
    "stateful_latest_value",
    "windowed_event_counts",
]
