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
