"""Point-in-interval (range) joins.

The reference resolves every time-window question by equality joins
against precomputed id bounds (SQL/RetrieveField.sql seq_nb/time
bounds); it has no general "join each point to the intervals that
contain it" operator. This module adds one, Spark-first, with two
physical strategies chosen by the caller's knowledge of the data:

- **Keyed** (`keys=[...]`): the common case — intervals and points
  share a partition key (per-train, per-user, per-device). The range
  predicate rides as a residual filter on an ordinary equi-join, so
  Catalyst plans a shuffled (or broadcast) hash/merge join on the
  key: co-partitioned, no cartesian anywhere.

- **Bucketed** (`bucket_width=W`): no shared key. A naive inequality
  join would plan BroadcastNestedLoopJoin (or worse, cartesian) —
  O(|points| x |intervals|) compares. Instead both sides are
  discretized to integral buckets of width W: each interval explodes
  into the buckets it overlaps (`sequence` + `explode`), each point
  maps to exactly one bucket, and the join becomes an equi-join on
  bucket id with the exact containment predicate as a residual
  filter. A (point, interval) match shares exactly one bucket — the
  point's own — so no duplicate pairs are produced and no dedup pass
  is needed. Cost: |intervals| x avg(span/W) exploded rows, tunable
  by W; a runtime `assert_true` guard fails fast if any interval
  would explode into more than `max_buckets_per_interval` rows
  (skew/ingest-error protection at 100 TB — one pathological
  year-long interval must not fan out into millions of rows
  silently).

Bucket ids use integral `DIV`, not float division: nanosecond clocks
exceed 2^53, where a double quietly loses the low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PB, _IB = "__rj_bucket_p", "__rj_bucket_i"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | list[tuple[str, str]] | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Join each point row to every interval row whose
    [start_col, end_col] (inclusive both ends) contains its
    point_col. Exactly one of `keys` / `bucket_width` selects the
    strategy. Output columns: all point columns then all interval
    columns (duplicate names reachable via the `p` / `i` aliases).

    `keys`: same-named join columns, or (point_col, interval_col)
    pairs. `how`: "inner" or "left" (left preserves unmatched POINT
    rows; intervals are the exploded side in the bucketed strategy
    and cannot be the preserved side of an outer join here).
    """
    if (keys is None) == (bucket_width is None):
        raise ValueError("pass exactly one of keys= or bucket_width=")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")

    if keys is not None:
        p = points.alias("p")
        i = intervals.alias("i")
        cond = (F.col(f"p.{point_col}") >= F.col(f"i.{start_col}")) & (
            F.col(f"p.{point_col}") <= F.col(f"i.{end_col}")
        )
        for k in keys:
            pk, ik = (k, k) if isinstance(k, str) else k
            cond = cond & (F.col(f"p.{pk}") == F.col(f"i.{ik}"))
        return p.join(i, cond, how)

    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    start_b = F.expr(f"CAST({start_col} AS BIGINT) DIV {w}")
    end_b = F.expr(f"CAST({end_col} AS BIGINT) DIV {w}")
    # the guard is woven INTO the sequence bound (not a separate
    # dropped column, which column pruning would silently remove)
    guarded_end = F.when(
        end_b - start_b < F.lit(max_buckets_per_interval), end_b
    ).otherwise(
        F.raise_error(
            F.lit(
                f"interval span exceeds {max_buckets_per_interval} buckets "
                f"of width {w}; raise bucket_width or "
                "max_buckets_per_interval"
            )
        ).cast("bigint")
    )
    i = intervals.withColumn(
        _IB, F.explode(F.sequence(start_b, guarded_end))
    ).alias("i")
    p = points.withColumn(
        _PB, F.expr(f"CAST({point_col} AS BIGINT) DIV {w}")
    ).alias("p")
    cond = (
        (F.col(_PB) == F.col(_IB))
        & (F.col(f"p.{point_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{point_col}") <= F.col(f"i.{end_col}"))
    )
    return p.join(i, cond, how).drop(_PB, _IB)
