"""Rolling z-score and linear resampling: exact semantics."""

import math

from alstom_spark_cassandra_spark.operators.timeseries import (
    resample_linear,
    rolling_zscore,
)


def test_zscore_flags_spike_and_cold_start(spark):
    rows = [(i, 1, 10.0) for i in range(10)] + [(10, 1, 10.1), (11, 1, 500.0)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {
        r.event_id: (r.z, r.is_anomaly)
        for r in rolling_zscore(df, ["user_id"], "event_id", "value").collect()
    }
    for i in range(10):  # cold start: no full trailing window
        assert got[i] == (None, False)
    # constant trailing window (zero variance): no verdict
    assert got[10] == (None, False)
    # the 500.0 spike against a near-constant window: flagged
    z11, flag11 = got[11]
    assert flag11 and z11 > 3


def test_zscore_matches_python(spark):
    vals = [3.0, 7.5, 1.2, 9.9, 4.4, 6.1, 2.2, 8.8, 5.5, 0.5, 12.25]
    df = spark.createDataFrame(
        [(i, 1, v) for i, v in enumerate(vals)],
        "event_id long, user_id long, value double",
    )
    r = (
        rolling_zscore(df, ["user_id"], "event_id", "value", k=10)
        .filter("event_id = 10")
        .collect()[0]
    )
    m = [int(v * 1000 + 0.5) for v in vals]
    s1, s2 = sum(m[:10]), sum(x * x for x in m[:10])
    expect = (m[10] * 10 - s1) / math.sqrt(10 * s2 - s1 * s1)
    assert abs(r.z - expect) < 1e-12


def _resample(spark, rows, lo, hi, step):
    df = spark.createDataFrame(rows, "user_id long, ts_ms long, value double")
    return {
        (r.user_id, r.grid_ts): r.value_micro
        for r in resample_linear(
            df, ["user_id"], "ts_ms", "value", lo, hi, step
        ).collect()
    }


def test_resample_midpoint_and_exact_hit(spark):
    # updates at t=0 (v=1.0) and t=100 (v=3.0); grid at 0, 50, 100
    got = _resample(spark, [(1, 0, 1.0), (1, 100, 3.0)], 0, 100, 50)
    assert got[(1, 0)] == 1_000_000      # exact hit
    assert got[(1, 50)] == 2_000_000     # midpoint
    assert got[(1, 100)] == 3_000_000    # exact hit


def test_resample_flat_edge_extrapolation(spark):
    got = _resample(spark, [(1, 40, 2.0), (1, 60, 4.0)], 0, 100, 50)
    assert got[(1, 0)] == 2_000_000      # before first update
    assert got[(1, 100)] == 4_000_000    # after last update
    # t=50 between 40 and 60: 2 + (4-2)*(10/20) = 3
    assert got[(1, 50)] == 3_000_000


def test_resample_tied_update_ts_takes_max(spark):
    got = _resample(spark, [(1, 50, 1.0), (1, 50, 9.0)], 0, 100, 50)
    assert got[(1, 50)] == 9_000_000


def test_resample_series_without_updates_absent(spark):
    got = _resample(spark, [(1, 50, 5.0)], 0, 100, 50)
    assert set(got) == {(1, 0), (1, 50), (1, 100)}
    assert got[(1, 0)] == got[(1, 100)] == 5_000_000


def test_ohlc_bars_hand_computed(spark):
    from alstom_spark_cassandra_spark.operators import ohlc_bars

    H = 3_600_000
    rows = [
        # (event_id, ts, series, value): two buckets for series "a"
        (1, 100, "a", 50),
        (2, 200, "a", 70),      # high
        (3, 300, "a", 40),      # low
        (4, H - 1, "a", 60),    # close of bucket 0
        (5, H + 10, "a", 90),   # bucket 1: single row -> o=h=l=c
        (6, 500, "b", 10),      # other series, same bucket window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, series string, v long"
    )
    out = {
        (r.series, r.bucket_start_ms): (
            r.open, r.high, r.low, r.close, r.n, r.sum_value
        )
        for r in ohlc_bars(
            df, ["series"], "ts", "v", "event_id", bucket_ms=H
        ).collect()
    }
    assert out == {
        ("a", 0): (50, 70, 40, 60, 4, 220),
        ("a", H): (90, 90, 90, 90, 1, 90),
        ("b", 0): (10, 10, 10, 10, 1, 10),
    }


def test_ohlc_open_close_use_order_col_not_ts(spark):
    """Wall-clock ties must not make open/close nondeterministic:
    the order column (unique log id) decides, even when it disagrees
    with ts ordering."""
    from alstom_spark_cassandra_spark.operators import ohlc_bars

    rows = [
        (2, 100, "a", 11),  # same ts; higher event_id -> close
        (1, 100, "a", 22),  # lower event_id -> open
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, series string, v long"
    )
    [bar] = ohlc_bars(
        df, ["series"], "ts", "v", "event_id", bucket_ms=1000
    ).collect()
    assert (bar.open, bar.close) == (22, 11)


def test_ohlc_bars_single_exchange(spark):
    """One groupBy with map-side partials: exactly one hash exchange
    — ticks collapse to partial bars before the shuffle."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators import ohlc_bars

    df = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1000).alias("ts"),
        (F.col("id") % 7).cast("string").alias("series"),
        (F.col("id") % 97).alias("v"),
    )
    out = ohlc_bars(df, ["series"], "ts", "v", "event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan.lower(), plan
