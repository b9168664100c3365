"""Structured-streaming online-mode tests (memory sink, availableNow)."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.streaming import (
    latest_value_stream,
    stateful_latest_value,
    windowed_event_counts,
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    # write a small change-log batch as the streaming source
    df = spark.createDataFrame(
        [
            (1, 0, 0, 10, 100),
            (1, 0, 0, 20, 200),
            (2, 0, 0, 15, 999),
            (2, 1, 0, 16, 55),
        ],
        "uevol_field_id int, src_id int, dst_id int, instance_message_id long,"
        " new_value long",
    )
    path = str(tmp_path / "stream_src")
    df.coalesce(1).write.parquet(path)
    return path, df.schema


def test_latest_value_stream(spark, stream_dir):
    path, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(path)
    agg = latest_value_stream(src, ["uevol_field_id", "src_id", "dst_id"])
    q = (
        agg.writeStream.format("memory")
        .queryName("live_state")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.uevol_field_id, r.src_id): (r.last_update_id, r.current_value)
        for r in spark.sql("select * from live_state").collect()
    }
    assert rows[(1, 0)] == (20, 200)
    assert rows[(2, 0)] == (15, 999)
    assert rows[(2, 1)] == (16, 55)


def test_stateful_latest_value(spark, stream_dir, tmp_path):
    path, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(path)
    out = stateful_latest_value(src)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.uevol_field_id: (r.current_value, r.n_updates_total, r.last_update_id)
        for r in spark.sql("select * from stateful_state").collect()
    }
    assert rows[1] == (200, 2, 20)  # two updates, latest wins, count kept
    assert rows[2] == (55, 2, 16)


def test_duplicate_clock_tiebreak_online_matches_batch(spark, tmp_path):
    """Two updates sharing (key, instance_message_id) but different
    iteration: online (max_by tiebreak) and stateful
    (applyInPandasWithState tuple compare) must both pick the row the
    batch latest_per_key tiebreak picks."""
    from alstom_spark_cassandra_spark.operators.latest import latest_per_key

    df = spark.createDataFrame(
        [
            # key 1: duplicate clock 10, iterations 1 < 2 -> value 222
            (1, 10, 1, 111),
            (1, 10, 2, 222),
            # key 2: unique clocks, latest wins normally
            (2, 5, 1, 50),
            (2, 6, 1, 60),
        ],
        "uevol_field_id int, instance_message_id long, iteration int,"
        " new_value long",
    )
    batch = {
        r.uevol_field_id: r.new_value
        for r in latest_per_key(
            df,
            ["uevol_field_id"],
            "instance_message_id",
            tiebreak_cols=["iteration"],
        ).collect()
    }
    assert batch == {1: 222, 2: 60}

    path = str(tmp_path / "tie_src")
    df.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)

    agg = latest_value_stream(
        src, ["uevol_field_id"], tiebreak_col="iteration"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("tie_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    online = {
        r.uevol_field_id: r.current_value
        for r in spark.sql("select * from tie_live").collect()
    }
    assert online == batch

    out = stateful_latest_value(src, tiebreak_col="iteration")
    q2 = (
        out.writeStream.format("memory")
        .queryName("tie_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tie"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    stateful = {
        r.uevol_field_id: r.current_value
        for r in spark.sql("select * from tie_stateful").collect()
    }
    assert stateful == batch


def test_windowed_event_counts(spark, tmp_path):
    ev = spark.createDataFrame(
        [
            ("2024-01-01 00:01:00", "click", 1.0),
            ("2024-01-01 00:02:00", "click", 2.0),
            ("2024-01-01 00:07:00", "view", 3.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    path = str(tmp_path / "ev_src")
    ev.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(ev.schema).parquet(path)
    agg = windowed_event_counts(src, window="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_type, n, sum_value from win_counts").collect()
    got = {(r.event_type): (r.n, r.sum_value) for r in rows}
    assert got["click"] == (2, 3.0)
    assert got["view"] == (1, 3.0)


def test_dedup_stream(spark, tmp_path):
    from datetime import datetime, timezone

    from alstom_spark_cassandra_spark.streaming import dedup_stream

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    df = spark.createDataFrame(
        [
            ("h1", t(1), 1),
            ("h1", t(5), 2),   # dup of h1 within the horizon -> dropped
            ("h2", t(3), 3),
            ("h2", t(4), 4),   # dup of h2 -> dropped
            ("h3", t(9), 5),
        ],
        "content_hash string, ts timestamp, payload int",
    )
    path = str(tmp_path / "dedup_src")
    df.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    out = dedup_stream(src, ["content_hash"], ts_col="ts", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from dedup_stream_out").collect()
    assert sorted(r.content_hash for r in rows) == ["h1", "h2", "h3"]
    # first arrival (by event time within the batch) wins per key
    assert {r.content_hash: r.payload for r in rows}["h1"] in (1, 2)
