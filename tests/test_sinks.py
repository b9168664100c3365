"""Write-path tests: partitioned layout produces partition pruning."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.sources.sinks import (
    day_col,
    write_compacted_log,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, i * 86_400_000_000_000 + 5, float(i)) for i in range(10)],
        "event_id long, ts long, value double",
    ).withColumn("day_idx", day_col())
    out = str(tmp_path / "ev_part")
    write_partitioned(ev, out, ["day_idx"])

    back = spark.read.parquet(out)
    q = back.filter(F.col("day_idx") == 3)
    assert q.count() == 1
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan; no pushed data filter needed
    assert "PartitionFilters" in plan and "day_idx" in plan.split("PartitionFilters")[1][:200]


def test_compacted_log_roundtrip(spark, tmp_path):
    log = spark.createDataFrame(
        [(1, 0, 0, "000", 10, 0, 100), (2, 0, 0, "000", 11, 0, 200)],
        "uevol_field_id int, src_id int, dst_id int, relative_path string,"
        " instance_message_id long, iteration int, new_value long",
    )
    out = str(tmp_path / "compacted")
    write_compacted_log(log, out)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert "series_bucket" in back.columns
