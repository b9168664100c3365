"""interval_join: keyed + bucketed strategies vs brute force."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators import interval_join


@pytest.fixture(scope="module")
def fixture(spark):
    # points at ns-ish scale to exercise >2^53 longs in DIV math
    base = 1_700_000_000_000_000_000
    h = 3_600_000_000_000  # 1h in ns
    points = spark.createDataFrame(
        [(k, base + i * h // 3, 10 * k + i) for k in (1, 2) for i in range(12)],
        "key int, ts long, pid int",
    )
    intervals = spark.createDataFrame(
        [
            (1, base, base + h, 100),  # covers points 0..3 (ends inclusive)
            (1, base + 2 * h, base + 3 * h, 101),
            (2, base + h, base + h, 102),  # degenerate single-instant
            (2, base - h, base - 1, 103),  # before everything: no matches
            (1, base, base + 4 * h, 104),  # overlaps interval 100
        ],
        "key int, lo long, hi long, iid int",
    )
    return points, intervals


def brute(points, intervals, keyed):
    cond = (points.ts >= intervals.lo) & (points.ts <= intervals.hi)
    if keyed:
        cond = cond & (points.key == intervals.key)
    return {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals).filter(cond).collect()
    }


def test_keyed_matches_brute_force(spark, fixture):
    points, intervals = fixture
    got = interval_join(
        points, intervals.withColumnRenamed("key", "ikey"),
        "ts", "lo", "hi", keys=[("key", "ikey")],
    )
    assert {(r.pid, r.iid) for r in got.collect()} == brute(
        points, intervals, keyed=True
    )


def test_bucketed_matches_brute_force(spark, fixture):
    points, intervals = fixture
    w = 3_600_000_000_000  # 1h buckets
    got = interval_join(
        points.drop("key"), intervals.drop("key"),
        "ts", "lo", "hi", bucket_width=w,
    )
    assert {(r.pid, r.iid) for r in got.collect()} == brute(
        points, intervals, keyed=False
    )
    # narrower buckets than intervals: same answer, more exploded rows
    got2 = interval_join(
        points.drop("key"), intervals.drop("key"),
        "ts", "lo", "hi", bucket_width=w // 7,
    )
    assert {(r.pid, r.iid) for r in got2.collect()} == brute(
        points, intervals, keyed=False
    )


def test_left_join_preserves_points(spark, fixture):
    points, intervals = fixture
    got = interval_join(
        points.drop("key"), intervals.drop("key"),
        "ts", "lo", "hi", bucket_width=3_600_000_000_000, how="left",
    )
    # every point appears; unmatched ones exactly once with null iid
    matched = brute(points, intervals, keyed=False)
    matched_pids = {p for p, _ in matched}
    rows = got.collect()
    assert {(r.pid, r.iid) for r in rows if r.iid is not None} == matched
    unmatched = [r for r in rows if r.iid is None]
    assert {r.pid for r in unmatched} == (
        {r.pid for r in points.collect()} - matched_pids
    )
    assert len(unmatched) == len({r.pid for r in unmatched})


def test_bucketed_no_nested_loop_join(spark, fixture):
    points, intervals = fixture
    plan = interval_join(
        points.drop("key"), intervals.drop("key"),
        "ts", "lo", "hi", bucket_width=3_600_000_000_000,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_keyed_no_nested_loop_join(spark, fixture):
    points, intervals = fixture
    plan = interval_join(
        points, intervals.withColumnRenamed("key", "ikey"),
        "ts", "lo", "hi", keys=[("key", "ikey")],
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_span_guard_trips(spark, fixture):
    points, intervals = fixture
    joined = interval_join(
        points.drop("key"), intervals.drop("key"),
        "ts", "lo", "hi", bucket_width=1_000,
        max_buckets_per_interval=10,
    )
    with pytest.raises(Exception, match="interval span exceeds"):
        joined.collect()


def test_arg_validation(spark, fixture):
    points, intervals = fixture
    with pytest.raises(ValueError, match="exactly one"):
        interval_join(points, intervals, "ts", "lo", "hi")
    with pytest.raises(ValueError, match="exactly one"):
        interval_join(
            points, intervals, "ts", "lo", "hi",
            keys=["key"], bucket_width=10,
        )
    with pytest.raises(ValueError, match="inner or left"):
        interval_join(
            points, intervals, "ts", "lo", "hi",
            bucket_width=10, how="right",
        )
