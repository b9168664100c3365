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
