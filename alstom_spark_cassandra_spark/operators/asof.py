"""As-of lookups.

Two patterns from the reference:

1. Scalar as-of: translate a wall-clock bound into a message-id bound
   by sorting and taking the first row (reference: Java/.../
   RetrieveField.java:74-90 — three separate `orderBy(...).first()`
   driver round-trips; Backup.java:43-45). Semantically these are just
   min/max aggregates; here they are single aggregates that can either
   stay in-plan (cross-join of a 1-row aggregate — no driver round
   trip) or be collected as a scalar when the caller genuinely needs a
   Python value.

2. Snapshot-pair as-of: pick the closest snapshot at-or-before and
   at-or-after a target id from the snapshot index
   (SQL/GetMessage.sql:63-88, SQL/GetMultipleFields.sql:44-67).

Both aggregate tiny tables (the snapshot index, or an already
filtered slice of the message log), so at scale these cost one
partial+final aggregation — no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_id_bounds(
    message_log: DataFrame,
    time_col: str = "log_time",
    id_col: str = "id",
    start_time: int | None = None,
    end_time: int | None = None,
    duration: int | None = None,
) -> DataFrame:
    """1-row DataFrame (min_id, max_id) for a wall-clock window.

    Replaces RetrieveField.java:74-90's three orderBy().first() jobs
    with one aggregate. If end_time is absent it derives from
    start_time + duration (RetrieveField.java:85-89).
    """
    if end_time is None and start_time is not None and duration is not None:
        end_time = start_time + duration
    df = message_log
    if start_time is not None:
        df = df.filter(F.col(time_col) >= F.lit(start_time))
    if end_time is not None:
        df = df.filter(F.col(time_col) <= F.lit(end_time))
    return df.agg(
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    )


def asof_snapshot_pair(
    snapshot_index: DataFrame,
    target_id: int,
    start_col: str = "start_instance_message_id",
) -> DataFrame:
    """1-row (snap_min_name, snap_min_start, snap_max_name,
    snap_max_start): nearest snapshot <= target and >= target.

    snap_max columns are null when the target is beyond the last
    snapshot (the reference's single-snapshot ELSE branch,
    SQL/GetMessage.sql:611-990).
    """
    below = (
        snapshot_index.filter(F.col(start_col) <= F.lit(target_id))
        .orderBy(F.col(start_col).desc())
        .limit(1)
        .select(
            F.col("name").alias("snap_min_name"),
            F.col(start_col).alias("snap_min_start"),
        )
    )
    above = (
        snapshot_index.filter(F.col(start_col) >= F.lit(target_id))
        .orderBy(F.col(start_col).asc())
        .limit(1)
        .select(
            F.col("name").alias("snap_max_name"),
            F.col(start_col).alias("snap_max_start"),
        )
    )
    # Snapshot index is tiny (K epochs): join of two <=1-row frames.
    # FULL OUTER on a true condition so a missing side yields nulls,
    # never 0 rows: no snap_max = the reference's single-snapshot ELSE
    # branch; no snap_min = target precedes the first snapshot (the
    # caller decides whether to fall back to a log-only replay).
    return below.join(above, F.lit(True), "full")
