"""HLL sketch layer: merge algebra + accuracy + plan shape."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.sketches import (
    approx_distinct,
    hll_partial_sketches,
    hll_rollup,
)


@pytest.fixture(scope="module")
def events(spark):
    # 40k rows, 3 types x 20 days, per-type user cardinalities
    # large enough to leave HLL's exact sparse mode
    rows = spark.range(40_000).select(
        (F.col("id") % 3).cast("int").alias("type_id"),
        (F.col("id") % 20).cast("int").alias("day"),
        # distinct users per type: hash spread over ~7000 values
        F.abs(F.hash("id") % 7001).alias("user_id"),
    )
    return rows.cache()


def test_hll_merge_equals_direct(spark, events):
    """Union-of-daily-partials must give the SAME estimate as a
    one-pass sketch per type: register-wise max is the exact HLL
    union, not an approximation of it."""
    daily = hll_partial_sketches(events, ["type_id", "day"], "user_id")
    merged = hll_rollup(daily, ["type_id"])
    direct = approx_distinct(events, ["type_id"], "user_id")
    m = {r.type_id: r.approx_distinct for r in merged.collect()}
    d = {r.type_id: r.approx_distinct for r in direct.collect()}
    assert m == d


def test_hll_accuracy(spark, events):
    exact = {
        r.type_id: r.n
        for r in events.groupBy("type_id")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r.type_id: r.approx_distinct
        for r in approx_distinct(events, ["type_id"], "user_id").collect()
    }
    for t, n in exact.items():
        # lgk=12 -> ~1.6% standard error; 5% is > 3 sigma
        assert abs(est[t] - n) / n < 0.05, (t, est[t], n)


def test_hll_rollup_composes(spark, events):
    """day -> (type, parity-of-day) -> type composes to the same
    estimates as a one-hop rollup when sketches are kept."""
    daily = hll_partial_sketches(events, ["type_id", "day"], "user_id")
    mid = hll_rollup(
        daily.withColumn("bucket", F.col("day") % 2),
        ["type_id", "bucket"],
        keep_sketch=True,
    )
    two_hop = hll_rollup(mid, ["type_id"])
    one_hop = hll_rollup(daily, ["type_id"])
    assert {(r.type_id, r.approx_distinct) for r in two_hop.collect()} == {
        (r.type_id, r.approx_distinct) for r in one_hop.collect()
    }


def test_hll_partial_agg_in_plan(spark, events):
    """Map-side partial aggregation must appear: only sketches
    shuffle, never raw values."""
    plan = (
        hll_partial_sketches(events, ["type_id"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_hll_sketch_agg" in plan.lower() or "partial" in plan.lower()


def test_value_histogram_merge_and_quantiles(spark):
    """Partial histograms of two halves sum to the whole corpus's
    histogram (the mergeability contract), and the derived quantile
    upper-edges bound the exact nearest-rank values from above by at
    most one bin width."""
    from alstom_spark_cassandra_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )
    from pyspark.sql import functions as F

    vals = [float(v % 97) for v in range(1, 1001)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    a, b = df.filter(F.col("value") < 50), df.filter(F.col("value") >= 50)
    h_all = {
        r.bucket: r.n
        for r in value_histogram(df, "value", 0.0, 100.0, 50).collect()
    }
    h_a = {r.bucket: r.n for r in value_histogram(a, "value", 0.0, 100.0, 50).collect()}
    h_b = {r.bucket: r.n for r in value_histogram(b, "value", 0.0, 100.0, 50).collect()}
    merged = {
        k: h_a.get(k, 0) + h_b.get(k, 0) for k in set(h_a) | set(h_b)
    }
    assert merged == h_all

    qs = [0.5, 0.95]
    est = {
        r.q: r.est
        for r in histogram_quantiles(
            value_histogram(df, "value", 0.0, 100.0, 50), qs
        ).collect()
    }
    import math

    srt = sorted(vals)
    for q in qs:
        exact = srt[math.ceil(q * len(srt)) - 1]
        assert exact <= est[q] <= exact + 2.0  # within one bin width


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

from alstom_spark_cassandra_spark.operators.sketches import (  # noqa: E402
    cms_build,
    cms_lookup,
)


@pytest.fixture(scope="module")
def term_stream(spark):
    # zipf-ish: term t_k appears 1000 // (k + 1) times
    rows = [
        (f"t{k}",) for k in range(60) for _ in range(1000 // (k + 1))
    ]
    return spark.createDataFrame(rows, "term string").cache()


def test_cms_never_underestimates(spark, term_stream):
    sketch = cms_build(term_stream, "term", depth=4, width=64)
    probes = term_stream.distinct()
    est = {
        r.term: r.est_count
        for r in cms_lookup(sketch, probes, "term", depth=4, width=64).collect()
    }
    exact = {
        r.term: r.n
        for r in term_stream.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    for t, n in exact.items():
        assert est[t] >= n, t


def test_cms_bounded_cells_and_merge(spark, term_stream):
    """The sketch never exceeds depth*width cells, and the sketch of
    a union equals the cell-wise SUM of the parts' sketches — the
    exact-merge algebra that makes per-partition partials safe."""
    a = term_stream.filter(F.length("term") <= 2)   # t0..t9
    b = term_stream.filter(F.length("term") > 2)    # t10..t59
    s_all = cms_build(term_stream, "term", depth=4, width=64)
    assert s_all.count() <= 4 * 64
    s_a = cms_build(a, "term", depth=4, width=64)
    s_b = cms_build(b, "term", depth=4, width=64)
    merged = (
        s_a.unionAll(s_b)
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    diff = merged.exceptAll(s_all).count() + s_all.exceptAll(merged).count()
    assert diff == 0


def test_cms_absent_value_small_estimate(spark, term_stream):
    """A value never inserted gets only collision mass — bounded by
    the heaviest cell, far below the true heavy hitters."""
    sketch = cms_build(term_stream, "term", depth=4, width=64)
    probes = spark.createDataFrame([("never-seen-term",)], "term string")
    est = cms_lookup(sketch, probes, "term", depth=4, width=64).collect()[0]
    heavy = 1000  # t0's exact count
    assert 0 <= est.est_count < heavy


def test_histogram_cdf_monotone_and_exact(spark):
    """Larger values never get a smaller CDF; values sharing a bucket
    share a CDF; the micro value equals below/total exactly."""
    vals = [float(v) for v in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    from alstom_spark_cassandra_spark.operators.sketches import (
        histogram_cdf,
        value_histogram,
    )

    hist = value_histogram(df, "value", 0.0, 100.0, 10)
    rows = histogram_cdf(df, hist, "value").collect()
    got = sorted((r.value, r.bucket, r.cdf_micro) for r in rows)
    assert len(got) == 100
    last = -1
    for v, b, c in got:
        assert c >= last
        last = c
        assert c == int(b * 10 * 1_000_000 / 100 + 0.5)  # uniform data


def test_histogram_cdf_requires_geometry(spark):
    import pytest as _pytest

    from alstom_spark_cassandra_spark.operators.sketches import histogram_cdf

    df = spark.createDataFrame([(1.0,)], "value double")
    bad = df.groupBy().count()
    with _pytest.raises(ValueError, match="geometry"):
        histogram_cdf(df, bad, "value")
