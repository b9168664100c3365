"""Latest-value-per-key (argmax) — the engine's central operator.

The reference implements "latest update per key" two ways, both
replaced here:

- GROUP BY key -> max(instance_message_id), then a RIGHT OUTER
  self-join back on (key, max_id) to recover the value row
  (reference: SQL/GetMessage.sql:205-214, SQL/GetMultipleFields.sql:
  176-187).
- a correlated per-row UDF that re-filters and sorts the whole
  Dataset for each key (Java/.../RetrieveMessage.java:92-108,
  Backup.java:76-93) — a nested-loop lookup that only "works" in
  local mode.

Spark-first replacement: one window `row_number() == 1` (or,
equivalently, `max_by`). A single shuffle on the key columns, fully
whole-stage-codegen, no self-join, no per-row work. At 100 TB the
shuffle is unavoidable (it IS the group-by); what matters is that we
shuffle once and that any filter on the clock column is applied
*before* the window so the exchange only carries surviving rows.

Tie-break: the reference's max()+equi-join DUPLICATES rows when two
updates share an instance_message_id (SURVEY.md §7.4). We define a
total order instead: order_cols descending, then tiebreak_cols
descending (domain: iteration, DataLoader.java:65), so exactly one
row per key survives.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per `keys`: the row with the greatest `order_col`
    (ties broken by `tiebreak_cols`, all descending)."""
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
