from .live_state import (
    compact_merge_sink,
    dedup_stream,
    enrich_stream,
    foreach_batch_merge_sink,
    foreach_batch_upsert_sink,
    interval_join_stream,
    latest_value_stream,
    read_merge_sink,
    read_upsert_sink,
    sessionize_stream,
    stateful_latest_value,
    windowed_event_counts,
)

__all__ = [
    "compact_merge_sink",
    "dedup_stream",
    "enrich_stream",
    "foreach_batch_merge_sink",
    "foreach_batch_upsert_sink",
    "read_merge_sink",
    "read_upsert_sink",
    "interval_join_stream",
    "latest_value_stream",
    "sessionize_stream",
    "stateful_latest_value",
    "windowed_event_counts",
]
