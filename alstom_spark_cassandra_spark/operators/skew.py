"""Skew-resistant aggregation and join helpers.

The reference never had to care (single node, small data), but the
change-log domain is exactly where key skew bites at 100 TB: a few
chatty equipments/fields dominate `instance_field`, so a plain
groupBy((field, src, dst)) funnels those series into single reducers.

Two standard remedies, expressed as reusable operators:

- `salted_agg`: two-phase aggregation — partial agg on (keys, salt),
  final agg on keys. MEASURED guidance (SCALE.md): for plain
  algebraic aggregates Spark's map-side partial aggregation already
  collapses a hot key to one row per map task, and the plain groupBy
  WINS (salting pays an extra shuffle). Reach for salted_agg only
  when partial aggregation cannot compress: high-cardinality
  composite keys, distinct-style aggregation, or as the pattern for
  window work over a hot partition.
- `salted_broadcast_left`: replicate-and-salt pattern for joining a
  skewed fact against a dimension too big to broadcast whole but
  small enough to replicate R ways: fact rows get a random salt in
  [0,R), dim rows are exploded R times, the join key becomes
  (key, salt) — the hot key's rows spread over R reducers.

AQE (`spark.sql.adaptive.skewJoin.enabled`, set in session.py)
handles sort-merge-join skew automatically; these operators cover the
aggregation and broadcast-replication cases AQE does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: `aggs` maps output column ->
    (input column, fn) with fn in {sum, count, min, max}.

    Phase 1 aggregates on (keys, salt) — the hot key's rows split
    across n_salts reducers; phase 2 merges the partials on keys
    (count merges by sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (col, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"{fn} is not algebraic; use groupBy directly")

    # salt from row CONTENT, never monotonically_increasing_id: a
    # nondeterministic salt recomputed on task retry moves rows between
    # (key, salt) partitions mid-shuffle and silently double/under
    # counts (the SPARK-23207 failure class). Hashing all columns keeps
    # replays bit-identical; identical duplicate rows sharing a salt is
    # harmless for aggregation.
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(f"__p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-spread inner equi-join: fact rows get a deterministic salt,
    dim rows replicate n_salts ways, join on (key, salt)."""
    # deterministic content-derived salt (see salted_agg note)
    f = fact.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
        ).cast("int"),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [key, "__salt"]).drop("__salt")
