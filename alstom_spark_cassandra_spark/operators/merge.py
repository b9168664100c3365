"""MERGE-style change application: upsert + delete in one pass.

The reference's maintenance flow only ever compacts by argmax
(old state ∪ recent updates, keep the latest row per series —
SQL/GetMessage.sql:63-88, covered by plans/queries.compact_log):
a series can be superseded but never REMOVED. Real change feeds
carry tombstones, and a 100 TB training-data pipeline needs the
full MERGE contract — the latest change per key wins, and if that
latest change is a delete the key disappears from the result
entirely (GDPR erasure, revoked documents, retracted events).

Spark-first shape: minimize the change feed FIRST (argmax per key —
map-side partial aggregation collapses each task's changes before
anything shuffles), then ONE full-outer join against the base on the
merge keys decides every row's fate:

  - change is a tombstone        -> row dropped (whether or not the
                                    key existed in the base)
  - change is an upsert          -> change's payload (insert if the
                                    key is new, update otherwise)
  - no change for the key        -> base row passes through

Both sides shuffle on the merge keys once; if the base is persisted
bucketed by those keys (sources/sinks.write_bucketed), its side of
the join is exchange-free and only the (already-minimized) change
set moves — the same physical-layout win `latest_bucketed_persisted`
proves for the argmax path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Minimize a change feed to its final change per key: argmax of
    (payload, op) by `seq_col`. `seq_col` must totally order changes
    within a key (a log offset / event id); ties would make "latest"
    ambiguous, so the caller guarantees uniqueness per key. One
    groupBy — partial aggregation keeps the shuffle at one row per
    key per map task, never the raw feed."""
    return changes.groupBy(*key_cols).agg(
        F.max(seq_col).alias(seq_col),
        *[
            F.max_by(c, F.col(seq_col)).alias(c)
            for c in [*payload_cols, op_col]
        ],
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """MERGE the change feed into the base snapshot.

    `base` holds one row per key with `payload_cols` and `seq_col`
    (the version that produced it). `changes` is the raw feed; its
    final change per key decides the outcome (upsert -> new payload,
    `delete_op` -> key removed, absent -> base row survives).

    Returns one row per surviving key: key cols, `seq_col` (the
    winning version), and `payload_cols`. The full-outer join is the
    single shuffle; a tombstone for a never-seen key is a no-op row
    dropped by the same filter that implements deletion.

    Contract: merge keys and `op_col` must be non-null (a null op
    would read as "no change", and null keys never equi-join, so a
    base row and a change row with null keys would BOTH survive as
    separate rows — standard SQL join semantics, not a merge)."""
    keys = list(key_cols)
    lc = latest_changes(changes, keys, seq_col, payload_cols, op_col)
    # disambiguate non-key columns across the two sides
    b = base.select(
        *keys,
        *[F.col(c).alias(f"__b_{c}") for c in [seq_col, *payload_cols]],
    )
    c = lc.select(
        *keys,
        F.col(op_col).alias("__c_op"),
        *[F.col(x).alias(f"__c_{x}") for x in [seq_col, *payload_cols]],
    )
    j = b.join(c, keys, "full_outer")
    has_change = F.col("__c_op").isNotNull()
    out_cols = [
        F.when(has_change, F.col(f"__c_{x}"))
        .otherwise(F.col(f"__b_{x}"))
        .alias(x)
        for x in [seq_col, *payload_cols]
    ]
    return j.filter(
        ~(has_change & (F.col("__c_op") == delete_op))
        # base-side-only rows survive; change-side-only upserts insert
    ).select(*keys, *out_cols)


def apply_changes_broadcast(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """`apply_changes` for the common daily case: the minimized
    change set fits in memory, the base does not. Spark cannot
    broadcast either side of a FULL OUTER join, so the shuffle-free
    form decomposes it:

      1. base ⟕ broadcast(latest changes): update / delete /
         pass-through — one broadcast pass over the base, no
         exchange;
      2. base ⋉ broadcast(change keys): which change keys already
         exist — at most one row per changed key, tiny;
      3. latest changes ⟕anti broadcast(matched keys): the inserts
         (new keys, minus tombstones-for-unseen-keys);
      4. union 1 (minus deletes) with 3.

    The base is scanned twice but SHUFFLED never — at 100 TB two
    broadcast map passes beat one full-table exchange by the width
    of the cluster bisection. Every exchange in the plan moves only
    the minimized FEED (the argmax, once per consuming branch unless
    Catalyst reuses it); all three joins are broadcast-hash — no
    sort-merge anywhere (plan-pinned by tests/test_operators.py::
    test_merge_apply_broadcast_plan). Same contract as
    apply_changes; results are identical (equality-pinned by test on
    the shared fixture)."""
    keys = list(key_cols)
    lc = latest_changes(changes, keys, seq_col, payload_cols, op_col)
    b = base.select(
        *keys,
        *[F.col(c).alias(f"__b_{c}") for c in [seq_col, *payload_cols]],
    )
    c = lc.select(
        *keys,
        F.col(op_col).alias("__c_op"),
        *[F.col(x).alias(f"__c_{x}") for x in [seq_col, *payload_cols]],
    )
    has_change = F.col("__c_op").isNotNull()
    existing = (
        b.join(F.broadcast(c), keys, "left_outer")
        .filter(~(has_change & (F.col("__c_op") == delete_op)))
        .select(
            *keys,
            *[
                F.when(has_change, F.col(f"__c_{x}"))
                .otherwise(F.col(f"__b_{x}"))
                .alias(x)
                for x in [seq_col, *payload_cols]
            ],
        )
    )
    matched = base.join(
        F.broadcast(lc.select(*keys)), keys, "left_semi"
    ).select(*keys)
    inserts = (
        lc.join(F.broadcast(matched), keys, "left_anti")
        .filter(F.col(op_col) != delete_op)
        .select(*keys, seq_col, *payload_cols)
    )
    return existing.unionByName(inserts)
