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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


CHANGE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("uevol_field_id", T.IntegerType()),
        T.StructField("current_value", T.LongType()),
        T.StructField("n_updates_total", T.LongType()),
        T.StructField("last_update_id", T.LongType()),
    ]
)
_STATE_SCHEMA = "value long, n long, last_id long"


def stateful_latest_value(
    stream: DataFrame,
    key_col: str = "uevol_field_id",
    order_col: str = "instance_message_id",
    value_col: str = "new_value",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-series
    (current value, total update count, last update id), maintained
    across microbatches.

    This is the op the built-in `max_by` aggregation can't express —
    the cumulative n_updates_total requires explicit state carried
    between batches. State per key is 3 longs; use the TTL variant of
    GroupStateTimeout in deployments where series churn (the
    reference's catalog is bounded, so NoTimeout is safe there).
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            value, n, last_id = state.get
        else:
            value, n, last_id = None, 0, -1
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            n += len(pdf)
            newest = pdf.iloc[-1]
            if int(newest[order_col]) >= last_id:
                last_id = int(newest[order_col])
                value = int(newest[value_col])
        state.update((value, n, last_id))
        yield pd.DataFrame(
            {
                "uevol_field_id": [key[0]],
                "current_value": [value],
                "n_updates_total": [n],
                "last_update_id": [last_id],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CHANGE_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    exact: bool = False,
) -> DataFrame:
    """Streaming exact-dedup: the first arrival per key wins (the
    streaming counterpart of `operators.dedup.dedup_exact` — dedup a
    document/event feed at ingest instead of as a batch pass).

    Default path is `dropDuplicatesWithinWatermark`: a key's state is
    dropped once the event-time watermark passes it, so state is
    bounded by traffic inside the watermark horizon, not by stream
    lifetime — the only formulation that survives an unbounded 100 TB
    feed. Two occurrences separated by more than the horizon both
    pass; that is the deliberate trade, and downstream batch
    `dedup_exact` mops up the stragglers.

    `exact=True` switches to `dropDuplicates`: exact forever, state
    grows with distinct keys — only for bounded key domains (the
    reference's catalog tables).
    """
    wm = stream.withWatermark(ts_col, watermark)
    if exact:
        return wm.dropDuplicates(key_cols)
    return wm.dropDuplicatesWithinWatermark(key_cols)
