"""Structured-Streaming "online mode".

The reference distinguishes live vs playback only as a data-model
concept: a `replay` flag swaps to `*_replay` tables
(reference: SQL/GetMessage.sql:17-23) and catalog rows carry
`online_activated`/`playback_activated` flags
(Java/.../DataLoader.java:225-226) — every query is still batch.

Here "online" is a real Structured Stream over the same change-log
schema: the batch queries' central operator (latest value per series)
becomes a stateful streaming aggregation, so the same engine serves
both modes (SURVEY.md §2.10's stated opportunity).

Design: `max_by(value, clock)` under `groupBy(series)` in update
mode. State per series is one (clock, value) pair — bounded by series
cardinality, not stream length. Event-time watermarking bounds the
windowed variant's state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_value_stream(
    stream: DataFrame,
    series_cols: list[str],
    order_col: str = "instance_message_id",
    value_col: str = "new_value",
) -> DataFrame:
    """Maintain the current value per series over a stream of updates.

    Use with outputMode("update") (or "complete"): each microbatch
    emits the changed series rows.
    """
    return stream.groupBy(*series_cols).agg(
        F.max(order_col).alias("last_update_id"),
        F.max_by(value_col, order_col).alias("current_value"),
    )


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Late-data-tolerant windowed counts/sums over the event stream
    (append mode compatible thanks to the watermark)."""
    wm = stream.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return wm.groupBy(win, key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_value"),
    )
