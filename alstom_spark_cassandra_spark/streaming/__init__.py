from .live_state import latest_value_stream, windowed_event_counts

__all__ = ["latest_value_stream", "windowed_event_counts"]
