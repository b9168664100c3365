"""Time-series extensions of the reference's state-reconstruction
family: rolling anomaly scores and fixed-grid resampling with linear
interpolation.

The reference's temporal semantics are LOCF state carried between
updates (SQL/GetUpdateHistory.sql row-0 seeding + carry-forward; the
engine's operators/locf.py). These two operators extend that family
where a pipeline needs them:

- `rolling_zscore`: per-series anomaly scoring against the trailing
  window — the data-cleaning screen run before training on sensor-like
  series. One window over the series key; the frame carries exact
  integer partials.
- `resample_linear`: the dense-grid resampling of update_history with
  linear interpolation between neighboring updates instead of a flat
  carry — the standard feature-store alignment step.

Portability contract (both get hard DuckDB oracles): values quantize
to integer milli-units, every windowed aggregate is an exact integer
sum (order-free; immune to Spark's sliding-frame incremental
accumulation, which re-associates FLOAT sums), and the only floating
ops are a final canonical expression — for z, (k·v − s1)/√(k·s2 − s1²)
(one sqrt + one division over exact ints, bit-identical on any IEEE
engine); for interpolation, v0 + (v1 − v0)·(t − t0)/(t1 − t0) over
exact ints, half-up micro-quantized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MILLI = 1_000


def _milli(col: Column) -> Column:
    return F.floor(col * F.lit(float(MILLI)) + F.lit(0.5)).cast("long")


def rolling_zscore(
    df: DataFrame,
    series_cols: list[str],
    order_col: str,
    value_col: str,
    k: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-row z-score of `value_col` against the PREVIOUS `k` values
    of its series (the row itself excluded — an anomaly must not mask
    itself). Rows without a full trailing window get NULL z (no
    verdict on a cold start); zero-variance windows get NULL z too
    (a constant series has no scale — flagging any deviation there is
    threshold-free and belongs to exact-change detection instead).

    Output adds: z (double, canonical (k·v−s1)/√(k·s2−s1²)) and
    is_anomaly (|z| > threshold; false where z is NULL).

    One exchange on the series key; frame partials are exact integer
    sums, so results are partitioning- and engine-invariant."""
    v = _milli(F.col(value_col))
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(order_col)
        .rowsBetween(-k, -1)
    )
    base = (
        df.withColumn("__v", v)
        .withColumn("__n", F.count("__v").over(w))
        .withColumn("__s1", F.sum("__v").over(w))
        .withColumn("__s2", F.sum(F.col("__v") * F.col("__v")).over(w))
    )
    num = F.col("__v") * F.lit(k) - F.col("__s1")
    var_k2 = F.col("__s2") * F.lit(k) - F.col("__s1") * F.col("__s1")
    z = F.when(
        (F.col("__n") == k) & (var_k2 > 0),
        num.cast("double") / F.sqrt(var_k2.cast("double")),
    )
    return (
        base.withColumn("z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z")) > F.lit(threshold), F.lit(False)),
        )
        .drop("__v", "__n", "__s1", "__s2")
    )


def resample_linear(
    updates: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    grid_start_ms: int,
    grid_end_ms: int,
    step_ms: int,
) -> DataFrame:
    """Resample each series onto the fixed grid [start, end] at
    `step_ms`, linearly interpolating between the neighboring updates
    (t0, v0) ≤ t < (t1, v1). Grid points before a series' first
    update or after its last take the nearest update's value (flat
    extrapolation — the LOCF stance at the edges). A grid point that
    coincides with an update takes that update's value exactly.

    Output: series_cols + (grid_ts, value_micro) — value in integer
    micro-units (half-up), so the oracle compares exactly.

    Plan: grid rows union update rows per series, ONE series-key
    exchange carries both direction scans (forward last-non-null,
    backward first-non-null over the same sort), then the interp
    expression. Grid size = series × steps — the same dense-grid
    economics as update_history; updates never join all-pairs."""
    spark = updates.sparkSession
    n_steps = (grid_end_ms - grid_start_ms) // step_ms + 1
    series = updates.select(*series_cols).distinct()
    grid = series.crossJoin(
        F.broadcast(
            spark.range(n_steps).select(
                (F.lit(grid_start_ms) + F.col("id") * step_ms).alias("__ts")
            )
        )
    ).withColumn("__is_grid", F.lit(True))
    # collapse same-timestamp updates to max value: the sort below
    # must be a TOTAL order (ties between coincident updates would
    # make last/first-non-null engine-dependent), and max is the
    # deterministic documented choice
    ups = (
        updates.select(
            *series_cols,
            F.col(ts_col).cast("long").alias("__ts"),
            _milli(F.col(value_col)).alias("__v"),
        )
        .groupBy(*series_cols, "__ts")
        .agg(F.max("__v").alias("__v"))
        .withColumn("__is_grid", F.lit(False))
    )
    # updates sort BEFORE coincident grid points so first_value-
    # backward sees the update at the same ts (exact-hit semantics)
    both = grid.withColumn("__v", F.lit(None).cast("long")).unionByName(ups)
    order = [F.col("__ts").asc(), F.col("__is_grid").asc()]
    wb = (
        Window.partitionBy(*series_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*series_cols)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("__v", ignorenulls=True).over(wb)
    prev_t = F.last(
        F.when(F.col("__v").isNotNull(), F.col("__ts")), ignorenulls=True
    ).over(wb)
    next_v = F.first("__v", ignorenulls=True).over(wf)
    next_t = F.first(
        F.when(F.col("__v").isNotNull(), F.col("__ts")), ignorenulls=True
    ).over(wf)
    pts = (
        both.withColumn("__pv", prev_v)
        .withColumn("__pt", prev_t)
        .withColumn("__nv", next_v)
        .withColumn("__nt", next_t)
        .filter(F.col("__is_grid"))
    )
    t = F.col("__ts").cast("double")
    pv, pt = F.col("__pv").cast("double"), F.col("__pt").cast("double")
    nv, nt = F.col("__nv").cast("double"), F.col("__nt").cast("double")
    interp = F.when(F.col("__pv").isNull(), F.col("__nv").cast("double")) \
        .when(F.col("__nv").isNull(), F.col("__pv").cast("double")) \
        .when(F.col("__nt") == F.col("__pt"), F.col("__pv").cast("double")) \
        .otherwise(pv + (nv - pv) * (t - pt) / (nt - pt))
    value_micro = F.floor(
        interp * F.lit(1000.0) + F.lit(0.5)
    ).cast("long")  # milli grid -> micro units: *1e6/1e3
    out = pts.filter(
        F.col("__pv").isNotNull() | F.col("__nv").isNotNull()
    ).select(
        *series_cols,
        F.col("__ts").alias("grid_ts"),
        value_micro.alias("value_micro"),
    )
    return out


def ohlc_bars(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    order_col: str,
    bucket_ms: int = 3_600_000,
) -> DataFrame:
    """Time-bucketed OHLC bars per series: open/high/low/close plus
    count and exact integer sum for each `bucket_ms` bucket of the
    epoch-ms clock `ts_col` — the canonical downsampling step that
    turns a raw tick/update feed into fixed-width bars for trend
    features (the LOCF family's aggregating cousin: instead of
    carrying state ACROSS buckets it summarizes WITHIN them).

    open/close are argmin/argmax by `order_col`, which must totally
    order rows within a series bucket (a unique log id — ties on a
    wall clock would make open/close nondeterministic; the same
    contract as merge.latest_changes). One groupBy, map-side partial
    aggregation: at 100 TB each task collapses its rows to one
    partial bar per (series, bucket) before the shuffle, so only
    bars move, never ticks. `value_col` must already be exact
    (integer-quantized) for the sum to be engine-portable."""
    # integer DIV on the canonical non-negative epoch-ms clock (no
    # float quotient in the bucketing path)
    bucket = F.expr(f"({ts_col} DIV {bucket_ms}) * {bucket_ms}")
    o = F.col(order_col)
    return (
        df.groupBy(*series_cols, bucket.alias("bucket_start_ms"))
        .agg(
            F.min_by(value_col, o).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, o).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
    )
