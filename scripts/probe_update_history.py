"""Scale probe for get_update_history at a realistic series count.

The registry query (update_history_dense) runs 3 series; the dense
grid is rows x series, so the claims that matter at 100 TB — one
series-key exchange carrying agg + LOCF, a veto-filter path that does
not degenerate at many filtered series, a time-point window that
cannot skew — need a probe at ~1000 filtered series over millions of
log rows. Local[N] cannot prove cluster behavior, but it can falsify
it: superlinear growth in series count or filter count would show
here first.

Usage: python scripts/probe_update_history.py [rows_millions ...]
Writes nothing outside /tmp; prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.plans.queries import (
    get_update_history,
    make_arguments,
)
from alstom_spark_cassandra_spark.session import get_spark


def synth_log(spark, n_rows: int, n_series: int, n_msgs: int):
    """Deterministic instance_field-shaped change log: n_series series
    (field ids 1..n_series, src 0, dst 0), update times spread over
    message ids 1..n_msgs."""
    return spark.range(n_rows).select(
        (F.pmod(F.xxhash64("id"), n_series) + 1)
        .cast("int")
        .alias("uevol_field_id"),
        F.lit(1).alias("uevol_message_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), n_msgs) + 1)
        .cast("long")
        .alias("instance_message_id"),
        F.lit(0).cast("long").alias("instance_message_id_previous"),
        F.lit(0).alias("src_id"),
        F.lit(0).alias("dst_id"),
        F.lit("000").alias("relative_path"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 3)).cast("int").alias("iteration"),
        F.lit(0).cast("long").alias("previous_value"),
        F.pmod(F.xxhash64("id", F.lit(3)), 1000).alias("new_value"),
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main():
    sizes_m = [float(x) for x in sys.argv[1:]] or [5]
    spark = get_spark(app_name="probe_update_history")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    n_series = 1000
    for m in sizes_m:
        n = int(m * 1_000_000)
        # grid density: distinct update ids ~= min(n_msgs, n); keep the
        # output matrix ~2k points x 1k series so the probe measures
        # the pipeline, not the noop sink writing a billion rows
        n_msgs = 2000
        log = synth_log(spark, n, n_series, n_msgs).cache()
        log.count()

        args_plain = make_arguments(
            spark,
            list(range(1, n_series + 1)),
            [0] * n_series,
            [0] * n_series,
        )
        args_filtered = make_arguments(
            spark,
            list(range(1, n_series + 1)),
            [0] * n_series,
            [0] * n_series,
            ["value >= 0"] * n_series,
        )
        res = {
            "rows_millions": m,
            "n_series": n_series,
            "grid_points": n_msgs,
            "plain": timed(
                get_update_history(log, args_plain, 100, n_msgs - 100)
            ),
            "filtered_1000": timed(
                get_update_history(log, args_filtered, 100, n_msgs - 100)
            ),
        }
        print(json.dumps(res))
        log.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
