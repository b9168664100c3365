"""LOCF (last observation carried forward) + dynamic pivot.

The reference builds the Q3 "update history" matrix procedurally: it
synthesizes a results table with one column per (field,src,dst) series
(reference: SQL/GetUpdateHistory.sql:36-78), seeds row 0 with the
start-of-window state (80-97), then WHILE-loops over every distinct
update message id, copying the previous row and overwriting the
updated cells (136-177) — O(rows × series) single-threaded work.

Spark-first: `groupBy(order).pivot(series)` + a forward-fill window
`last(value, ignorenulls=True)` per series column. One shuffle for the
pivot, one window pass for the fill. The long (un-pivoted) LOCF is the
primary API — the pivot is presentation, because one-column-per-series
is the reference's own scalability ceiling (SURVEY.md §7.4): at scale
you keep series as rows, partitioned by series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def locf(
    df: DataFrame,
    series_cols: Sequence[str],
    order_col: str,
    value_col: str = "value",
    filled_alias: str | None = None,
) -> DataFrame:
    """Per-series forward fill of nulls in `value_col` along `order_col`.

    Replaces the reference's prev-row-copy loop
    (SQL/GetUpdateHistory.sql:143-155). Scales: the window partitions
    by series key, so each series fills independently across executors.
    """
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_col = filled_alias or value_col
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def locf_pivot(
    df: DataFrame,
    order_col: str,
    series_key_col: str,
    value_col: str = "value",
    series_values: Sequence[str] | None = None,
    max_order_keys: int | None = None,
) -> DataFrame:
    """Dense history matrix: one row per `order_col`, one column per
    series, nulls carried forward.

    Column naming follows the reference's `id{f}_src{s}_dst{d}`
    synthesis (SQL/GetUpdateHistory.sql:36,129): callers pre-concat
    the series key into `series_key_col`. Passing `series_values`
    (the reference always knows its argument list) avoids the extra
    distinct-collect job Spark needs for an open pivot.

    PRESENTATION-ONLY: the forward-fill window below is global (the
    whole matrix passes through ONE task) — that is inherent to
    "one row per instant, one column per series", the reference's own
    scalability ceiling (SURVEY.md §7.4). `max_order_keys` is an
    OPT-IN guard rail: when set, the pivot refuses to build a matrix
    taller than the cap instead of silently serializing a full log
    through a single partition — at the cost of one extra
    distinct-count job per call, which is why it is off by default
    (callers that already bounded the input, as get_update_history
    does by filling per-series BEFORE the pivot, pay nothing).
    """
    if max_order_keys is not None:
        n = df.select(order_col).distinct().count()
        if n > max_order_keys:
            raise ValueError(
                f"locf_pivot: {n} distinct {order_col!r} keys exceeds the "
                f"max_order_keys cap ({max_order_keys}); the dense matrix "
                "fills through a single-partition window. Use locf() (long "
                "form, partitioned by series) at scale, or raise the cap "
                "deliberately."
            )
    pivoted = (
        df.groupBy(order_col)
        .pivot(series_key_col, list(series_values) if series_values else None)
        .agg(F.first(value_col))
    )
    series_cols = [c for c in pivoted.columns if c != order_col]
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = pivoted.select(
        order_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in series_cols],
    )
    return filled
