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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Generic backward as-of join: attach to every left row the
    `value_cols` of the LATEST right row with right_on ≤ left_on,
    per `on` keys (no prior right row → nulls, like an ASOF LEFT
    JOIN). The reference's Q2 is this op specialized to the change
    log (latest field update at a message id, RetrieveMessage.java:
    92-108's correlated lookup); exposing it generically covers
    event-to-dimension-version alignment.

    Plan shape: union both sides (right rows carry the payload, left
    rows a null payload), one window per key carries the last payload
    forward, keep the left rows — one shuffle + one sort, never the
    O(|left|×|right|) pair space of a naive range join, and ties
    (right_on == left_on) resolve INCLUSIVE because right rows sort
    before left rows at the same instant.

    Two RIGHT rows with equal (on, right_on) have no defined winner in
    the sort order alone; `right_tiebreak` names a right column that
    orders such ties deterministically (the LARGEST tiebreak wins,
    mirroring latest_per_key's iteration tiebreak). Without it, equal
    right keys resolve to whichever row the shuffle happened to order
    last — fine only when (on, right_on) is unique on the right.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — "
            "rename on the right side first"
        )
    payload = [f"__asof_{c}" for c in value_cols]
    l2 = left.withColumn("__ord", F.col(left_on)).withColumn(
        "__side", F.lit(1)
    )
    r_cols = [
        *on,
        F.col(right_on).alias("__ord"),
        *[F.col(c).alias(p) for c, p in zip(value_cols, payload)],
    ]
    order = [F.col("__ord").asc(), F.col("__side").asc()]
    if right_tiebreak is not None:
        # left rows carry a null __tb; __side already separates sides
        # at equal __ord, so the tiebreak only orders right-vs-right
        r_cols.append(F.col(right_tiebreak).alias("__tb"))
        order.append(F.col("__tb").asc_nulls_first())
    r2 = right.select(*r_cols).withColumn("__side", F.lit(0))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(p, ignorenulls=True).over(w).alias(c)
            for c, p in zip(value_cols, payload)
        ],
    )
    return filled.filter(F.col("__side") == 1).drop(
        "__ord", "__side", "__tb", *payload
    )
