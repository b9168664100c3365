"""Incremental aggregate maintenance: hand-computed fold fates,
composition across batchings vs the from-scratch recompute, and the
single-exchange plan against a bucketed snapshot."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.ivm import (
    agg_state,
    merge_agg_deltas,
)

KEYS = ["k"]


def _rows(df):
    return {r["k"]: (r["cnt"], r["total"]) for r in df.collect()}


@pytest.fixture(scope="module")
def snapshot(spark):
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], "k string, v long"
    )
    return agg_state(base, KEYS, "v")


def test_plain_state(snapshot):
    assert _rows(snapshot) == {"a": (2, 30), "b": (1, 5), "c": (1, 7)}


def test_fold_all_fates(spark, snapshot):
    deltas = spark.createDataFrame(
        [
            ("a", 40, 1),   # add to existing key
            ("d", 9, 1),    # brand-new key
            ("b", 5, -1),   # full retraction -> key vanishes
            ("c", 7, -1),   # retract...
            ("c", 8, 1),    # ...and replace (a correction)
        ],
        "k string, v long, mult int",
    )
    out = _rows(merge_agg_deltas(snapshot, deltas, KEYS, "v"))
    assert out == {"a": (3, 70), "c": (1, 8), "d": (1, 9)}


def test_fold_composes_and_equals_recompute(spark, snapshot):
    b1 = spark.createDataFrame(
        [("a", 40, 1), ("b", 5, -1)], "k string, v long, mult int"
    )
    b2 = spark.createDataFrame(
        [("a", 40, -1), ("e", 3, 1)], "k string, v long, mult int"
    )
    step = merge_agg_deltas(
        merge_agg_deltas(snapshot, b1, KEYS, "v"), b2, KEYS, "v"
    )
    once = merge_agg_deltas(snapshot, b1.unionByName(b2), KEYS, "v")
    base_signed = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 1), ("b", 5, 1), ("c", 7, 1)],
        "k string, v long, mult int",
    )
    recompute = agg_state(
        base_signed.unionByName(b1).unionByName(b2), KEYS, "v", mult_col="mult"
    )
    assert _rows(step) == _rows(once) == _rows(recompute)
    # the transiently-retracted 'b' is gone, 'a' netted back to base
    assert _rows(step)["a"] == (2, 30) and "b" not in _rows(step)


def test_transient_zero_count_state_survives_batching(spark):
    """A correction can land BEFORE the insert it corrects: the key
    passes through cnt = 0 with a nonzero total. That state must
    survive the fold (only the exact (0,0) identity is eliminated),
    or iterated folding diverges from the one-shot fold."""
    empty = agg_state(
        spark.createDataFrame([], "k string, v long"), KEYS, "v"
    )
    b1 = spark.createDataFrame(
        [("x", 8, 1), ("x", 5, -1)], "k string, v long, mult int"
    )  # nets cnt 0, total +3 — the in-flight correction
    b2 = spark.createDataFrame([("x", 5, 1)], "k string, v long, mult int")
    step = merge_agg_deltas(
        merge_agg_deltas(empty, b1, KEYS, "v"), b2, KEYS, "v"
    )
    once = merge_agg_deltas(empty, b1.unionByName(b2), KEYS, "v")
    assert _rows(step) == _rows(once) == {"x": (1, 8)}


def test_bucketed_snapshot_single_exchange(spark, tmp_path):
    """Snapshot persisted bucketed by the group keys: the refresh
    plan's ONLY hash exchange is the minimized delta batch — the full
    statistics table never moves (the 100 TB refresh economics)."""
    from alstom_spark_cassandra_spark.sources.sinks import write_bucketed

    base = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    snap = agg_state(base, KEYS, "v")
    write_bucketed(
        snap, "bkt_ivm_snap", KEYS, 4, sort_cols=KEYS,
        path=str(tmp_path / "snap"),
    )
    deltas = spark.range(500).select(
        (F.col("id") % 40).cast("string").alias("k"),
        (F.col("id") % 11).alias("v"),
        F.when(F.col("id") % 9 == 0, -1).otherwise(1).alias("mult"),
    )
    try:
        out = merge_agg_deltas(
            spark.table("bkt_ivm_snap"), deltas, KEYS, "v"
        )
        assert out.count() == 100
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_ivm_snap")


def test_ivm_sink_retry_idempotent_and_composes(spark, tmp_path):
    """foreach_batch_ivm_sink: (a) a replayed batch re-reads its
    PREDECESSOR's snapshot and overwrites its own, so at-least-once
    delivery folds each batch once; (b) folds compose — including a
    key passing through the transient cnt-0-nonzero-total state
    across a batch boundary."""
    import os

    from alstom_spark_cassandra_spark.streaming import (
        foreach_batch_ivm_sink,
        read_merge_sink,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 5)], "k string, cnt long, total long"
    ).write.parquet(f"{sink}/snap_-1")
    write = foreach_batch_ivm_sink(sink, ["k"], "v")

    b0 = spark.createDataFrame(
        [("a", 8, 1), ("a", 5, -1),  # in-place correction, nets cnt 0
         ("b", 5, -1)],              # full retraction -> (0,0) -> gone
        "k string, v long, mult int",
    )
    b1 = spark.createDataFrame(
        [("a", 5, 1), ("c", 9, 1)], "k string, v long, mult int"
    )
    write(b0, 0)
    write(b1, 1)
    final = {r.k: (r.cnt, r.total) for r in read_merge_sink(spark, sink).collect()}
    assert final == {"a": (3, 38), "c": (1, 9)}
    # foreachBatch retry of batch 1: same result, not double-folded
    write(b1, 1)
    again = {r.k: (r.cnt, r.total) for r in read_merge_sink(spark, sink).collect()}
    assert again == final


def test_persisted_bucketed_fold_plan(spark, tmp_path):
    """The graded ivm_bucketed_persisted round-trip at its real data
    shape: snapshot written bucketed by the group keys, read back
    from disk, folded — the snapshot side must contribute ZERO hash
    exchanges (its bucketed scan already satisfies the fold join's
    clustering); the single hash exchange in the plan is the
    minimized delta."""
    from alstom_spark_cassandra_spark.workloads import (
        q_ivm_bucketed_persisted,
    )

    out = q_ivm_bucketed_persisted(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert out.count() > 0
