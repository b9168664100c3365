"""Global row index: equality with the naive global window, start
offsets, multi-column total orders, and the no-SinglePartition plan
contract that is the operator's reason to exist."""

from pyspark.sql import Window, functions as F

from alstom_spark_cassandra_spark.operators.rowindex import (
    global_row_index,
)


def _naive(df, order_cols):
    w = Window.orderBy(*order_cols)
    return df.withColumn("idx", F.row_number().over(w) - 1)


def test_matches_naive_global_window(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 101).alias("v"),
    )
    got = {
        r["k"]: r["idx"]
        for r in global_row_index(df, ["v", "k"], num_partitions=7).collect()
    }
    want = {r["k"]: r["idx"] for r in _naive(df, ["v", "k"]).collect()}
    assert got == want
    assert sorted(got.values()) == list(range(10_000))


def test_start_offset_and_single_partition_input(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k long").coalesce(1)
    got = {
        r["k"]: r["idx"]
        for r in global_row_index(df, ["k"], start=100).collect()
    }
    assert got == {1: 100, 2: 101, 3: 102}


def test_plan_has_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    out = global_row_index(df, ["v", "k"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the naive form is exactly the plan we refuse to produce
    naive_plan = _naive(df, ["v", "k"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SinglePartition" in naive_plan


def test_empty_input(spark):
    df = spark.createDataFrame([], "k long")
    assert global_row_index(df, ["k"]).count() == 0


def test_global_ntile_matches_sql_ntile(spark):
    from alstom_spark_cassandra_spark.operators.rowindex import (
        global_ntile,
    )

    # 103 rows into 10 buckets: the first 3 buckets take 11 rows —
    # the remainder rule that floor(idx*n/total) gets wrong
    df = spark.range(103).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 31).alias("v")
    )
    got = {
        r["k"]: r["bucket"]
        for r in global_ntile(df, 10, ["v", "k"], num_partitions=5).collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        r["k"]: r["nt"]
        for r in df.withColumn("nt", F.ntile(10).over(w)).collect()
    }
    assert got == want
    # more buckets than rows: every row alone in its own bucket
    tiny = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got3 = {
        r["k"]: r["bucket"] for r in global_ntile(tiny, 10, ["k"]).collect()
    }
    assert got3 == {1: 1, 2: 2, 3: 3}


def test_global_ntile_bad_n(spark):
    from alstom_spark_cassandra_spark.operators.rowindex import (
        global_ntile,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        global_ntile(df, 0, ["k"])


def test_nullable_order_col_sorts_nulls_last(spark):
    """Null ordering is pinned ASC NULLS LAST (the ANSI/DuckDB ORDER BY
    default) — Spark's bare asc is NULLS FIRST, which would silently
    diverge from the row_number()-OVER oracle on any nullable order
    column (round-9 ADVICE)."""
    df = spark.createDataFrame(
        [(1, None), (2, 10), (3, None), (4, 5)], "k long, v long"
    )
    got = {
        r["k"]: r["idx"]
        for r in global_row_index(df, ["v", "k"], num_partitions=3).collect()
    }
    # non-null v first (5 then 10), then nulls broken by k
    assert got == {4: 0, 2: 1, 1: 2, 3: 3}


def test_working_column_collision_raises(spark):
    import pytest as _pytest

    from alstom_spark_cassandra_spark.operators.rowindex import (
        global_ntile,
    )

    df = spark.createDataFrame([(1, 2)], "k long, __pid long")
    with _pytest.raises(ValueError, match="__pid"):
        global_row_index(df, ["k"])
    df2 = spark.createDataFrame([(1, 2)], "k long, __total long")
    with _pytest.raises(ValueError, match="__total"):
        global_ntile(df2, 2, ["k"])
