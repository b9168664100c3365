"""Snapshot same/diff detection (set operations).

The reference emulates intersection and symmetric difference with
`UNION ALL` + `GROUP BY all-columns HAVING COUNT(*) > 1` (unchanged
rows) / `= 1` (changed rows) over two snapshots (reference:
SQL/GetMessage.sql:127-176, SQL/GetMultipleFields.sql:105-151,
SQL/GetMultipleFieldsHistory.sql:122-149) — MySQL has no
INTERSECT/EXCEPT.

Spark-first: a single full-outer join on all compared columns gives
both sets in one shuffle — the matched side is the intersection, the
null sides are the symmetric difference. We expose the two halves as
separate functions (each is one `groupBy().count()` with map-side
partial aggregation, which Catalyst plans identically to
intersect/exceptAll but keeps multiplicity semantics explicit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dup_counts(a: DataFrame, b: DataFrame, cols: Sequence[str]) -> DataFrame:
    # UNION ALL then count duplicates over all compared columns
    # (SQL/GetMessage.sql:147-151). Partial aggregation makes this one
    # shuffle of distinct rows, not of the raw union.
    union = a.select(*cols).unionByName(b.select(*cols))
    return union.groupBy(*cols).agg(F.count(F.lit(1)).alias("__cnt"))


def unchanged_rows(a: DataFrame, b: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows present in both inputs (HAVING COUNT(*)>1 ≡ A ∩ B)."""
    return _dup_counts(a, b, cols).filter(F.col("__cnt") > 1).drop("__cnt")


def symmetric_diff_rows(a: DataFrame, b: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows present in exactly one input (HAVING COUNT(*)=1)."""
    return _dup_counts(a, b, cols).filter(F.col("__cnt") == 1).drop("__cnt")


def latest_state_sym_diff(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    cut_df: DataFrame,
) -> DataFrame:
    """Symmetric difference of two latest-per-key snapshots of one log
    in ONE scan + ONE keyed exchange.

    Equivalent by construction to

        symmetric_diff_rows(
            latest_per_key(df.filter(order <= cut), keys, order_col),
            latest_per_key(df, keys, order_col),
            [*keys, value_col])

    for logs where `order_col` is unique per key (the same tie
    contract latest_per_key's row_number carries), but without the two
    full-log window shuffles and the union re-aggregation: one
    conditional aggregation computes both snapshots' values per key —
    max_by with a NULL ordering for rows past the cut skips them
    entirely, so `__va` IS the old snapshot's value and a separate
    presence flag distinguishes "no old row" from "old value is NULL"
    — and the count-of-union=1 test collapses to a null-safe value
    comparison (`<=>` equals groupBy-key equality exactly: NaN<=>NaN
    and -0.0<=>0.0 are true, probed). Keys in only the new snapshot
    emit their new row; keys whose values differ emit both rows; keys
    with equal values emit nothing — the exact HAVING COUNT(*)=1
    multiset (each snapshot holds at most one row per key, and rows
    from different keys can never collide because the keys are part of
    the compared columns). `cut_df` is a one-row one-column frame
    (typically an aggregate of the log itself), attached as a
    broadcast scalar.

    100 TB shape: partial aggregation bounds the exchange at one row
    per key per map task — the r14 two-window form shuffled the
    WindowGroupLimit survivors TWICE and sorted them four times.
    """
    cut_col = cut_df.columns[0]
    in_old = F.col(order_col) <= F.col(cut_col)
    agg = (
        df.join(F.broadcast(cut_df), F.lit(True), "left")
        .groupBy(*keys)
        .agg(
            F.max_by(value_col, F.when(in_old, F.col(order_col))).alias("__va"),
            F.max(F.when(in_old, F.lit(1))).alias("__ha"),
            F.max_by(value_col, F.col(order_col)).alias("__vb"),
        )
    )
    va, ha, vb = F.col("__va"), F.col("__ha"), F.col("__vb")
    row = lambda c: F.struct(c.alias(value_col))  # noqa: E731
    vtype = df.schema[value_col].dataType.simpleString()
    empty = F.array().cast(f"array<struct<{value_col}:{vtype}>>")
    emit = (
        F.when(ha.isNull(), F.array(row(vb)))
        .when(~va.eqNullSafe(vb), F.array(row(va), row(vb)))
        .otherwise(empty)
    )
    return agg.select(
        *keys, F.explode(emit).alias("__e")
    ).select(*keys, f"__e.{value_col}")
