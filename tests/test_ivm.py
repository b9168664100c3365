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
