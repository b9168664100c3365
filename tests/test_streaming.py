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


def test_stateful_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: stop the stateful query, append new source
    files, restart from the SAME checkpoint — the cumulative
    n_updates_total must count batch-1 updates too, which is only
    possible if the per-key state was recovered, not rebuilt."""
    schema = (
        "uevol_field_id int, src_id int, dst_id int,"
        " instance_message_id long, new_value long"
    )
    src_dir = str(tmp_path / "restart_src")
    ckpt = str(tmp_path / "ckpt_restart")
    out_dir = str(tmp_path / "restart_out")

    batch1 = spark.createDataFrame(
        [(1, 0, 0, 10, 100), (1, 0, 0, 20, 200), (2, 0, 0, 15, 999)], schema
    )
    batch1.coalesce(1).write.mode("append").parquet(src_dir)

    # memory sink cannot recover from a checkpoint; foreachBatch can,
    # and the monotone batch_id distinguishes pre/post-restart output
    def sink(df, batch_id):
        df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    def run_once():
        src = spark.readStream.schema(batch1.schema).parquet(src_dir)
        out = stateful_latest_value(src)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def emitted(min_batch=0):
        rows = spark.read.parquet(out_dir).filter(
            F.col("batch_id") >= min_batch
        )
        return {
            r.uevol_field_id: (
                r.current_value, r.n_updates_total, r.last_update_id
            )
            for r in rows.collect()
        }

    run_once()
    first = emitted()
    assert first[1] == (200, 2, 20)
    assert first[2] == (999, 1, 15)
    max_batch = (
        spark.read.parquet(out_dir).agg(F.max("batch_id")).collect()[0][0]
    )

    # the query is stopped; new data lands; restart from the checkpoint
    batch2 = spark.createDataFrame(
        [(1, 0, 0, 30, 300), (3, 0, 0, 5, 50)], schema
    )
    batch2.coalesce(1).write.mode("append").parquet(src_dir)

    run_once()
    second = emitted(min_batch=max_batch + 1)
    # key 1: 2 old + 1 new update -> n=3 proves recovered state
    assert second[1] == (300, 3, 30)
    assert second[3] == (50, 1, 5)
    # key 2 saw no new rows: update mode emits only changed keys
    assert 2 not in second


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


def test_sessionize_stream_boundary(spark, tmp_path):
    """Pin the gap-boundary contract: session_window merges on
    `diff <= gap` (touching ranges overlap), so with gap = G an event
    exactly G after its predecessor stays in the SAME session — the
    batch rule `split iff diff > G` — while G+1ms splits."""
    from alstom_spark_cassandra_spark.streaming import sessionize_stream

    G = 1_800_000  # 30 min in ms
    base = 1_700_000_000_000
    rows = [
        # user 1: gaps of exactly G -> one session of 3 events
        (1, base), (1, base + G), (1, base + 2 * G),
        # user 2: gap of G+1 -> two sessions
        (2, base), (2, base + G + 1),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts_ms long").withColumn(
        "ts", F.timestamp_millis("ts_ms")
    )
    path = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    sess = sessionize_stream(
        src, key_cols=["user_id"], gap="30 minutes", watermark=None
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_boundary")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = spark.sql(
        "select user_id, count(*) as n_sessions, sum(n_events) as n_events "
        "from sess_boundary group by user_id"
    ).collect()
    got = {r.user_id: (r.n_sessions, r.n_events) for r in out}
    assert got[1] == (1, 3)
    assert got[2] == (2, 2)


def test_stateful_latest_multi_batch_matches_single(spark, tmp_path):
    """availableNow can drain a source in ONE micro-batch, which never
    exercises cross-batch state (r5 VERDICT item 5). Force a
    one-file-per-trigger execution over a 3-part source and require
    the final per-key state to be what any batching yields: value from
    the max (id, tiebreak) across ALL batches, cumulative count 3 —
    file processing order must not matter because the state compare is
    on the total order, not arrival order."""
    rows1 = [(1, 10, 100), (2, 7, 70)]
    rows2 = [(1, 20, 200)]
    rows3 = [(1, 5, 55)]  # stale id arriving in a later batch
    schema = "uevol_field_id int, instance_message_id long, new_value long"
    path = str(tmp_path / "mb_src")
    for rows in (rows1, rows2, rows3):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stateful_latest_value(src)
    q = (
        out.writeStream.format("memory")
        .queryName("mb_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "mb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    # the run genuinely spanned multiple micro-batches
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 3
    # update-mode memory sink accumulates per-batch emissions; final
    # state per key = the row with the largest cumulative count
    final = {
        r.uevol_field_id: (r.current_value, r.last_update_id)
        for r in spark.sql(
            "select * from ("
            "  select *, row_number() over ("
            "    partition by uevol_field_id order by n_updates_total desc"
            "  ) rn from mb_stateful) where rn = 1"
        ).collect()
    }
    counts = {
        r.uevol_field_id: r.n_updates_total
        for r in spark.sql(
            "select uevol_field_id, max(n_updates_total) as n_updates_total "
            "from mb_stateful group by uevol_field_id"
        ).collect()
    }
    assert final[1] == (200, 20)  # stale id 5 never overwrote
    assert counts[1] == 3         # but it WAS counted
    assert final[2] == (70, 7) and counts[2] == 1


def test_sessionize_multi_batch_merges_across_batches(spark, tmp_path):
    """Sessions must MERGE across micro-batches: two events of the
    same session arriving in different files (forced one-file
    triggers) end as ONE session row, and an out-of-gap event stays
    its own session — identical to the single-batch result."""
    from alstom_spark_cassandra_spark.streaming import sessionize_stream

    base = 1_700_000_000_000
    files = [
        [(1, base)],
        [(1, base + 600_000)],        # +10 min: same session (gap 30m)
        [(1, base + 5_400_000)],      # +90 min: new session
    ]
    schema = "user_id int, ts_ms long"
    path = str(tmp_path / "mb_sess_src")
    for rows in files:
        (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.timestamp_millis("ts_ms"))
            .coalesce(1)
            .write.mode("append")
            .parquet(path)
        )
    full_schema = spark.read.parquet(path).schema
    src = (
        spark.readStream.schema(full_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    sess = sessionize_stream(
        src, key_cols=["user_id"], gap="30 minutes", watermark=None
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("mb_sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 3
    # complete mode: the memory table is the FINAL full result
    out = sorted(
        (r.n_events for r in spark.sql("select * from mb_sess").collect())
    )
    assert out == [1, 2]  # merged 2-event session + the isolated one


def test_upsert_sink_exactly_once_across_batches_and_retries(spark, tmp_path):
    """foreach_batch_upsert_sink: multi-batch run (one file per
    trigger) + a manually REPLAYED batch (the at-least-once failure
    mode) must land exactly the batch argmax — the replay overwrites
    its own directory instead of appending."""
    from alstom_spark_cassandra_spark.streaming import (
        foreach_batch_upsert_sink,
        latest_value_stream,
        read_upsert_sink,
    )

    schema = "uevol_field_id int, instance_message_id long, new_value long"
    src_path = str(tmp_path / "ups_src")
    for rows in ([(1, 10, 100), (2, 7, 70)], [(1, 20, 200)], [(1, 5, 55)]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_path)

    sink = str(tmp_path / "ups_sink")
    writer = foreach_batch_upsert_sink(sink)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    agg = latest_value_stream(src, ["uevol_field_id"])
    q = (
        agg.writeStream.foreachBatch(writer)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ups_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 3

    final = read_upsert_sink(spark, sink, ["uevol_field_id"])
    before = sorted(map(tuple, final.collect()))
    got = {r.uevol_field_id: (r.last_update_id, r.current_value)
           for r in final.collect()}
    assert got[1] == (20, 200) and got[2] == (7, 70)

    # simulate an at-least-once REPLAY of the last batch: rewriting
    # the same batch_id must change nothing
    last_batch = spark.createDataFrame(
        [(1, 20, 200)], schema
    ).groupBy("uevol_field_id").agg(
        F.max("instance_message_id").alias("last_update_id"),
        F.max_by("new_value", F.col("instance_message_id")).alias(
            "current_value"
        ),
    )
    import glob

    max_bid = max(
        int(d.rsplit("=", 1)[1])
        for d in glob.glob(f"{sink}/batch_id=*")
    )
    writer(last_batch, max_bid)
    after = sorted(
        map(
            tuple,
            read_upsert_sink(spark, sink, ["uevol_field_id"]).collect(),
        )
    )
    assert after == before


def test_interval_join_stream_horizon(spark, tmp_path):
    """Stream-stream attribution: inclusive horizon boundary, key
    isolation, and no matches before the left event."""
    from alstom_spark_cassandra_spark.streaming import interval_join_stream

    H = 3_600_000  # 1h in ms
    base = 1_700_000_000_000
    clicks = spark.createDataFrame(
        [(1, base, 10), (2, base, 20)],
        "c_user int, c_ms long, click_id long",
    ).withColumn("c_ts", F.timestamp_millis("c_ms")).drop("c_ms")
    purchases = spark.createDataFrame(
        [
            (1, base + H, 100),      # exactly at horizon: inclusive
            (1, base + H + 1, 101),  # 1ms past: excluded
            (1, base - 1, 102),      # before the click: excluded
            (2, base + 5, 200),      # other user's window
        ],
        "p_user int, p_ms long, purchase_id long",
    ).withColumn("p_ts", F.timestamp_millis("p_ms")).drop("p_ms")
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks.coalesce(1).write.parquet(cdir)
    purchases.coalesce(1).write.parquet(pdir)
    j = interval_join_stream(
        spark.readStream.schema(clicks.schema).parquet(cdir),
        spark.readStream.schema(purchases.schema).parquet(pdir),
        "c_user", "p_user", "c_ts", "p_ts", "1 hour",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("select * from attr_test").collect()
    }
    assert got == {(10, 100), (20, 200)}


def test_dedup_stream_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery for the exact dedup path: a key seen before
    the restart must STILL be suppressed after it — only possible if
    the dedup state store was recovered, not rebuilt."""
    from alstom_spark_cassandra_spark.streaming import dedup_stream

    schema = "content_hash string, ts timestamp, payload int"
    src_dir = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "dd_ckpt")
    out_dir = str(tmp_path / "dd_out")

    from datetime import datetime, timezone

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)

    def sink(df, batch_id):
        df.write.mode("append").parquet(out_dir)

    def run_once():
        src = spark.readStream.schema(schema).parquet(src_dir)
        out = dedup_stream(src, ["content_hash"], ts_col="ts", exact=True)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(
        [("a", t(1), 1), ("b", t(2), 2)], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()
    assert sorted(
        r.content_hash for r in spark.read.parquet(out_dir).collect()
    ) == ["a", "b"]

    # restart with one duplicate key and one new key
    spark.createDataFrame(
        [("a", t(30), 3), ("c", t(31), 4)], schema
    ).coalesce(1).write.mode("append").parquet(src_dir)
    run_once()
    got = sorted(r.content_hash for r in spark.read.parquet(out_dir).collect())
    # 'a' emitted once only — the pre-restart state suppressed its dup
    assert got == ["a", "b", "c"]


def test_enrich_stream_left_join_keeps_unmatched(spark, tmp_path):
    """Stream-static enrichment: facts with no dim row survive with
    null attributes, and the join is stateless + broadcast."""
    from alstom_spark_cassandra_spark.streaming.live_state import enrich_stream

    src_dir = str(tmp_path / "facts")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99)], "event_id long, user_id long"
    ).write.mode("overwrite").parquet(src_dir)
    dim = spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long"
    ).parquet(src_dir)
    out = enrich_stream(stream, dim, "user_id", "left")
    name = "enrich_test_sink"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r.event_id: r.tier for r in spark.table(name).collect()}
    assert rows == {1: "gold", 2: "silver", 3: None}


def test_late_filter_semantics_lag_and_boundary(spark, tmp_path):
    """Pins the THREE watermark rules q_stream_late_data's oracle
    replays as batch SQL (measured on this Spark, probe-derived):

    1. the late filter LAGS one batch — batch k drops rows against
       the watermark in effect during batch k-1 (max event time over
       files 0..k-2 minus delay), so a row arriving in the same batch
       that first advances the watermark past its window is KEPT;
    2. the drop boundary is INCLUSIVE (window end == lagged watermark
       drops);
    3. append mode emits exactly the windows whose end <= the final
       watermark — INCLUSIVE at the boundary (a window ending exactly
       on the final watermark is emitted); later windows stay in
       state, unfinalized.

    Four hand-built files, one per trigger, delay 0: if Spark's
    semantics drift on an upgrade, this fails before the driver's
    graded row does."""
    import os

    H = 3_600_000
    files = [
        [(1, 2 * H)],                    # M0=2H
        [(2, int(1.5 * H))],             # w1 row; lagged wm=0 -> KEPT (rule 1)
        [(4, int(1.7 * H)), (5, 4 * H)], # w1 end 2H <= lagged wm 2H -> DROP (rule 2)
        # finalize: final wm = 9H, so w8's end == 9H sits EXACTLY on
        # the emission boundary (inclusive -> emitted) while w9
        # (end 10H) stays unfinalized (rule 3)
        [(6, 8 * H), (7, 9 * H)],
    ]
    src_dir = str(tmp_path / "late_src")
    os.makedirs(src_dir)
    for k, rows in enumerate(files):
        stage = str(tmp_path / f"stage{k}")
        spark.createDataFrame(rows, "rid long, ts_ms long").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        import glob
        import shutil

        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    src = (
        spark.readStream.schema("rid long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    agg = (
        src.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_sem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 4  # genuinely multi-batch
    dropped = sum(
        (p.get("stateOperators") or [{}])[0].get(
            "numRowsDroppedByWatermark", 0
        )
        for p in q.recentProgress
    )
    assert dropped == 1  # exactly the boundary row (rule 2)
    got = {
        int(r.ws) // H: r.n
        for r in spark.sql(
            "select unix_millis(window.start) as ws, n from late_sem"
        ).collect()
    }
    # w1 emitted with ONLY the batch-1 row (rules 1+2); w2 and w4
    # emitted; w8 (end 9H == final wm 9H) emitted AT the inclusive
    # boundary; w9 (end 10H > 9H) unfinalized (rule 3)
    assert got == {1: 1, 2: 1, 4: 1, 8: 1}


def test_stream_late_data_drops_and_converges(spark):
    """The graded q_stream_late_data flow at sf0.001: the replay must
    span multiple micro-batches, REALLY drop late rows (the stragglers
    displaced beyond the lagged watermark), and still match its batch
    oracle — which scripts/check_oracle.py gates every round; here we
    assert the drop actually happened so the demo can never silently
    degrade into an all-on-time replay."""
    from alstom_spark_cassandra_spark.workloads import q_stream_late_data

    out = q_stream_late_data(spark, "/root/testdata/sf0.001")
    total_emitted = out.agg(F.sum("n")).collect()[0][0]
    # 1000 events; 42 predicted dropped + the unfinalized tail —
    # emitted strictly fewer than fed, but most rows survive
    assert total_emitted < 1000 - 42 + 1
    assert total_emitted > 800


def test_stateful_latest_ttl_evicts_idle_series(spark, tmp_path):
    """Event-time TTL on stateful_latest_value — the bounded-state
    mode for unbounded key domains: a series idle past the TTL is
    evicted once the watermark passes (last event time + ttl), and a
    LATER update re-creates it FRESH (update counter restarts, and a
    stale id that the old state would have rejected now wins) — while
    a series active inside the horizon keeps cumulative state. Forced
    one-file-per-trigger; eviction fires in a batch where the evicted
    key has no input (Spark never times out a key with data in the
    same batch)."""
    import glob
    import os
    import shutil

    H = 3_600_000
    files = [
        # k1 and k2 born at 0.5H
        [(1, 10, 100, int(0.5 * H)), (2, 7, 70, int(0.5 * H))],
        # k2 active at 3.5H -> advances wm past k1's 1.5H timeout
        [(2, 20, 200, int(3.5 * H))],
        # unrelated k3: the batch where k1's timeout actually fires
        [(3, 1, 1, 4 * H)],
        # k1 returns with a STALE id: fresh state must accept it
        [(1, 5, 55, int(4.5 * H))],
    ]
    schema = (
        "uevol_field_id int, instance_message_id long, new_value long,"
        " ts_ms long"
    )
    src_dir = str(tmp_path / "ttl_src")
    os.makedirs(src_dir)
    for k, rows in enumerate(files):
        stage = str(tmp_path / f"stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_latest_value(src, ttl="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) >= 4
    rows = spark.sql("select * from ttl_stateful").collect()
    k1 = sorted(
        (r.current_value, r.n_updates_total, r.last_update_id)
        for r in rows
        if r.uevol_field_id == 1
    )
    # first life (100, 1, 10), then evicted, then FRESH (55, 1, 5);
    # the no-TTL outcome (100, 2, 10) must never appear
    assert k1 == [(55, 1, 5), (100, 1, 10)]
    k2 = {
        (r.current_value, r.n_updates_total, r.last_update_id)
        for r in rows
        if r.uevol_field_id == 2
    }
    # active inside the horizon: cumulative state survives
    assert (200, 2, 20) in k2


def test_stateful_latest_ttl_monotone_under_late_rows(spark, tmp_path):
    """A late-but-valid OLDER event (inside the watermark delay) must
    not move the key's TTL timeout earlier: the timeout base is the
    max event time ever seen (carried in state), so the key survives
    until true-last-seen + ttl. With the naive per-batch base the key
    here would be evicted in batch 3 (timeout 3.5H < wm 3.7H) and its
    counter would reset; the monotone base keeps 4.0H > 3.7H."""
    import glob
    import os
    import shutil

    H = 3_600_000
    files = [
        [(1, 10, 100, 3 * H)],            # k1 newest ts 3.0H
        [(1, 11, 110, int(2.5 * H))],     # k1 late-but-valid older ts
        [(3, 1, 1, int(4.7 * H))],        # wm -> 3.7H during next batch
        [(2, 2, 2, 5 * H)],               # k1 idle: timeout check fires
        [(1, 5, 55, int(5.2 * H))],       # stale id: live state rejects
    ]
    schema = (
        "uevol_field_id int, instance_message_id long, new_value long,"
        " ts_ms long"
    )
    src_dir = str(tmp_path / "mono_src")
    os.makedirs(src_dir)
    for k, rows in enumerate(files):
        stage = str(tmp_path / f"stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "1 hour")
    )
    out = stateful_latest_value(src, ttl="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_mono")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "mono_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql(
        "select * from ttl_mono where uevol_field_id = 1"
    ).collect()
    counts = sorted(r.n_updates_total for r in rows)
    # three emissions, cumulative: the state was never evicted
    assert counts == [1, 2, 3]
    final = max(rows, key=lambda r: r.n_updates_total)
    # newest id 11 still wins; the stale id-5 row only bumped the count
    assert (final.current_value, final.last_update_id) == (110, 11)


def test_stateful_latest_ttl_null_ts_grace_and_null_value(spark, tmp_path):
    """Keys whose rows carry NO event time still get the FULL ttl
    grace on the watermark clock (an always-arm at wm+1 would evict
    them on the very next tick), and a NULL new_value winning the
    order is stored as NULL instead of crashing the executor with
    int(NaN). Timeline (ttl 2h, delay 0): after k1's batch-2 row the
    grace arms at wm(1.5H)+2H = 3.5H; the watermark then sits at 3.2H
    — ABOVE the degenerate wm+1-style arm a graceless always-arm (or
    the old max(last_ts+ttl, wm+1) with last_ts=0 -> 2H) would fire
    at, but below 3.5H — so only the grace keeps k1 alive for its
    on-time id-13 row (n=3). Eviction then genuinely happens once the
    watermark passes 4.5H+2H, and the final life restarts at n=1."""
    import glob
    import os
    import shutil

    H = 3_600_000
    files = [
        [(1, 10, 100, None), (9, 1, 1, 1 * H)],        # k1 null-ts born
        [(9, 2, 2, int(1.5 * H))],                     # wm 1H: k1 survives
        [(1, 12, None, None)],                         # null VALUE wins; n=2
        [(9, 3, 3, int(3.2 * H))],                     # wm 1.5H: alive
        [(9, 4, 4, int(3.4 * H))],                     # wm 3.2H: 2H-arm would
                                                       # evict; 3.5H-arm holds
        [(1, 13, 130, int(4.5 * H))],                  # state alive: n=3
        [(9, 5, 5, 7 * H)],                            # wm 4.5H: alive
        [(9, 6, 6, int(7.2 * H))],                     # wm 7H > 6.5H: evict k1
        [(1, 14, 140, int(7.5 * H))],                  # fresh life: n=1
    ]
    schema = (
        "uevol_field_id int, instance_message_id long, new_value long,"
        " ts_ms long"
    )
    src_dir = str(tmp_path / "nullts_src")
    os.makedirs(src_dir)
    for k, rows in enumerate(files):
        stage = str(tmp_path / f"stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_latest_value(src, ttl="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_nullts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "nullts_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    k1 = sorted(
        (r.n_updates_total, r.current_value, r.last_update_id)
        for r in spark.sql(
            "select * from ttl_nullts where uevol_field_id = 1"
        ).collect()
    )
    # one life through n=3 (the 3.2H watermark did NOT evict — grace
    # held), then a genuine watermark-clock eviction and a fresh start
    assert k1 == [
        (1, 100, 10),
        (1, 140, 14),
        (2, None, 12),
        (3, 130, 13),
    ]


def test_null_tiebreak_loses_online_like_batch(spark, tmp_path):
    """A NULL tiebreak sorts BELOW every real tiebreak in the batch
    latest_per_key (desc ordering, NULLS LAST) — the stateful operator
    must agree, even though pandas' default NaN-sorts-last would let
    the null row win the intra-batch sort."""
    from alstom_spark_cassandra_spark.operators.latest import latest_per_key

    df = spark.createDataFrame(
        [(1, 5, 3, 111), (1, 5, None, 222)],
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
    assert batch == {1: 111}  # real tiebreak beats NULL

    path = str(tmp_path / "nulltb_src")
    df.coalesce(1).write.parquet(path)
    src = spark.readStream.schema(df.schema).parquet(path)
    out = stateful_latest_value(src, tiebreak_col="iteration")
    q = (
        out.writeStream.format("memory")
        .queryName("nulltb_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "nulltb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r.uevol_field_id: r.current_value
        for r in spark.sql("select * from nulltb_stateful").collect()
    }
    assert got == batch


def _stage_files(spark, tmp_path, files, schema, sub="src"):
    """One parquet file per micro-batch, mtime-ordered so the
    FileStreamSource replays them in list order (the staging pattern
    of q_stream_late_data)."""
    import glob
    import os
    import shutil

    src_dir = str(tmp_path / sub)
    os.makedirs(src_dir, exist_ok=True)
    for k, rows in enumerate(files):
        stage = str(tmp_path / f"{sub}_stage{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    return src_dir


_LOG_SCHEMA = (
    "uevol_field_id int, instance_message_id long, new_value long,"
    " ts_ms long"
)


def test_ttl_timeout_fires_strictly_above_watermark(spark, tmp_path):
    """Probe-pinned EventTimeTimeout firing rule (the q_stream_latest_ttl
    oracle encodes exactly this): a key's timeout T fires in a batch
    where the key has no data and the CURRENT batch watermark (max
    event time over PRIOR batches minus delay — it lags data by one
    batch) is STRICTLY greater than T; wm == T does not fire. Here
    k1's T = 1H-ts + 1h ttl = 2H and the watermark reaches exactly 2H
    during batches 2 and 3 — strictly-greater means k1 is never
    evicted and its counter stays cumulative (n=2); an inclusive rule
    would restart it (n=1). A Spark upgrade that changes the
    comparison fails here first."""
    H = 3_600_000
    files = [
        [(1, 10, 100, 1 * H)],
        [(2, 1, 1, 2 * H)],       # wm during this batch: 1H
        [(3, 1, 1, 2 * H)],       # wm: 2H == T -> must NOT fire
        [(1, 11, 110, int(2.1 * H))],  # wm still 2H; k1 has data
    ]
    src_dir = _stage_files(spark, tmp_path, files, _LOG_SCHEMA)
    src = (
        spark.readStream.schema(_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
        .withWatermark("ts", "0 seconds")
    )
    out = stateful_latest_value(src, ttl="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_strict")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "strict_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    ns = sorted(
        r.n_updates_total
        for r in spark.sql(
            "select * from ttl_strict where uevol_field_id = 1"
        ).collect()
    )
    assert ns == [1, 2], f"timeout comparison rule changed: {ns}"


def test_no_ttl_checkpoint_resumes_across_builds(spark, tmp_path):
    """The no-TTL path keeps the original 4-long state schema (the
    analyzed plan carries no last_ts field), so checkpoints written
    before TTL existed resume cleanly — the per-call-schema contract
    from the round-7 review."""
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_upsert_sink,
        read_upsert_sink,
    )

    H = 3_600_000
    sink = str(tmp_path / "nottl_sink")
    ckpt = str(tmp_path / "nottl_ckpt")

    def run():
        src = (
            spark.readStream.schema(_LOG_SCHEMA)
            .parquet(str(tmp_path / "src"))
            .withColumn("ts", F.timestamp_millis("ts_ms"))
        )
        out = stateful_latest_value(src)
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "last_tb" in plan and "last_ts" not in plan
        q = (
            out.writeStream.foreachBatch(foreach_batch_upsert_sink(sink))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    _stage_files(spark, tmp_path, [[(1, 10, 100, 1 * H)]], _LOG_SCHEMA)
    run()
    _stage_files(
        spark,
        tmp_path,
        [[(1, 10, 100, 1 * H)], [(1, 11, 110, 2 * H)]],
        _LOG_SCHEMA,
    )
    run()  # resumes the same checkpoint: only batch1 is new
    got = read_upsert_sink(spark, sink, ["uevol_field_id"]).collect()
    assert [(r.current_value, r.n_updates_total) for r in got] == [(110, 2)]


def test_ttl_toggle_on_old_checkpoint_fails_loudly(spark, tmp_path):
    """Enabling ttl on a checkpoint written by the no-TTL (4-long)
    schema must fail with Spark's state-schema incompatibility error
    — a CLEAR message naming both schemas (the round-7 verdict asked
    for a loud failure instead of a cryptic deserializer crash; the
    per-call schema makes Spark's own checker produce it). The
    remedy is the docstring's: restart from a fresh checkpoint."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_upsert_sink,
    )

    H = 3_600_000
    sink = str(tmp_path / "toggle_sink")
    ckpt = str(tmp_path / "toggle_ckpt")

    def run(ttl):
        src = (
            spark.readStream.schema(_LOG_SCHEMA)
            .parquet(str(tmp_path / "src"))
            .withColumn("ts", F.timestamp_millis("ts_ms"))
        )
        if ttl:
            src = src.withWatermark("ts", "0 seconds")
        out = stateful_latest_value(src, ttl=ttl)
        q = (
            out.writeStream.foreachBatch(foreach_batch_upsert_sink(sink))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    _stage_files(spark, tmp_path, [[(1, 10, 100, 1 * H)]], _LOG_SCHEMA)
    run(None)
    _stage_files(
        spark,
        tmp_path,
        [[(1, 10, 100, 1 * H)], [(1, 11, 110, 2 * H)]],
        _LOG_SCHEMA,
    )
    with pytest.raises(
        StreamingQueryException,
        match="STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE",
    ):
        run("1 hour")


def test_ttl_requires_timestamp_ts_col(spark, stream_dir):
    """ttl fails FAST at build time when ts_col is absent or not a
    timestamp (an epoch-ms long would silently collapse the timeout
    base to ~0 via pandas' nanosecond reinterpretation — every key
    evicted on its next idle batch; a missing column only died later
    as an executor KeyError)."""
    path, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(path)
    with pytest.raises(ValueError, match="not in"):
        stateful_latest_value(src, ttl="1 hour", ts_col="nope")
    src_long = src.withColumn("ts", F.col("instance_message_id") * 1000)
    with pytest.raises(ValueError, match="TimestampType"):
        stateful_latest_value(src_long, ttl="1 hour")


def test_stream_latest_ttl_demo_really_evicts(spark):
    """The graded q_stream_latest_ttl must actually exercise the
    eviction path at the demo scale, not just replay cumulative
    state: at sf0.001 the oracle's eviction model predicts 6 of the
    15 keys restart, so at least one key's final n_updates_total must
    be SMALLER than its total row count across the staged replay (a
    no-eviction run would report the full count for every key)."""
    from alstom_spark_cassandra_spark.workloads import q_stream_latest_ttl

    out = q_stream_latest_ttl(spark, "/root/testdata/sf0.001").collect()
    # recompute each key's TOTAL fed rows under the same gap rule
    # (through the canonical loader, which gives the epoch-ms clock)
    from alstom_spark_cassandra_spark.sources.loader import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fed = (
        ev.select(
            F.col("user_id").cast("int").alias("k"),
            F.least(
                F.expr("greatest(ts DIV 86400000 - 19723, 0) DIV 8"),
                F.lit(3),
            ).cast("int").alias("b"),
        )
        .filter((F.col("k") + F.col("b")) % 3 != 0)
        .groupBy("k")
        .count()
        .collect()
    )
    totals = {r["k"]: r["count"] for r in fed}
    restarted = [
        r for r in out if r.n_updates_total < totals[r.uevol_field_id]
    ]
    survived = [
        r for r in out if r.n_updates_total == totals[r.uevol_field_id]
    ]
    assert len(restarted) >= 1, "TTL demo degenerated: nothing evicted"
    assert len(survived) >= 1, "TTL demo degenerated: everything evicted"


def _run_outer_join(spark, tmp_path, left_files, right_files,
                    horizon="30 minutes", watermark="1 hour",
                    how="left_outer"):
    """Replay two mtime-pinned file feeds through the left-outer
    watermarked interval join (one file per side per trigger) and
    return [(lid, rid)] sorted."""
    import uuid

    from alstom_spark_cassandra_spark.streaming import interval_join_stream

    lsrc = _stage_files(
        spark, tmp_path, left_files, "lid long, lts long, lkey long", "L"
    )
    rsrc = _stage_files(
        spark, tmp_path, right_files, "rid long, rts long, rkey long", "R"
    )
    ls = (
        spark.readStream.schema("lid long, lts long, lkey long")
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc)
        .withColumn("ltts", F.timestamp_millis("lts"))
    )
    rs = (
        spark.readStream.schema("rid long, rts long, rkey long")
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
        .withColumn("rtts", F.timestamp_millis("rts"))
    )
    j = interval_join_stream(
        ls, rs, "lkey", "rkey", "ltts", "rtts",
        horizon=horizon, watermark=watermark, how=how,
    )
    name = f"oj_{uuid.uuid4().hex[:8]}"
    q = (
        j.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return sorted(
        (r.lid, r.rid) for r in spark.table(name).select("lid", "rid").collect()
    )


_T0 = 1_704_067_200_000  # 2024-01-01, the canonical test epoch
_MIN = 60_000


def test_outer_join_null_emission_strict_boundary(spark, tmp_path):
    """Pins the measured null-emission rule the stream_join_outer
    oracle encodes: a never-matched left row emits its null row iff
    left_ts + horizon < final watermark, STRICTLY.  A left sentinel
    (700min, never emitted: eviction 730min > wm) keeps the left
    input's own watermark from being the minimum; the right side's
    max (200min) then sets wm_final = 140min.  A left at 110min
    (eviction exactly 140min) must NOT emit; one at 110min − 1ms
    must."""
    sent_l = (98, _T0 + 700 * _MIN, 98)
    sent_r = [(99, _T0 + 200 * _MIN, 99)]
    files_r = [sent_r, [], []]
    # eviction point == wm exactly -> suppressed
    out = _run_outer_join(
        spark, tmp_path / "eq",
        [[sent_l, (1, _T0 + 110 * _MIN, 1)], [], []], files_r,
    )
    assert out == []
    # 1ms below the boundary -> the null row emits
    out = _run_outer_join(
        spark, tmp_path / "lt",
        [[sent_l, (1, _T0 + 110 * _MIN - 1, 1)], [], []], files_r,
    )
    assert out == [(1, None)]


def test_outer_join_watermark_is_min_of_sides(spark, tmp_path):
    """Pins the other measured rule: the global watermark is the MIN
    over both inputs of (max event time − delay).  Here the left
    side's own max (115min) is the minimum, so wm_final = 55min and
    NO left row's eviction point (130/145min) is ever strictly
    passed — nothing emits, even though the right side's clock
    (200min) alone would have released the 100min row."""
    out = _run_outer_join(
        spark, tmp_path,
        [[(1, _T0 + 100 * _MIN, 1), (2, _T0 + 115 * _MIN, 2)], [], []],
        [[(9, _T0 + 200 * _MIN, 99)], [], []],
    )
    assert out == []


def test_outer_join_matches_cross_batch_and_nulls(spark, tmp_path):
    """End-to-end fates in one replay: same-batch match, cross-batch
    match near the file boundary (left still in state because the
    1-hour delay exceeds the 30-min horizon), early never-matched
    left (null row), and a tail left whose eviction the final
    watermark never strictly passes (suppressed)."""
    out = _run_outer_join(
        spark, tmp_path,
        [
            [
                (1, _T0, 10),              # matched in batch 0
                (2, _T0 + 10 * _MIN, 20),  # never matched -> null row
                (3, _T0 + 230 * _MIN, 30), # match arrives in batch 1
            ],
            [(4, _T0 + 470 * _MIN, 40)],   # eviction 500min < wm 660min
            [(5, _T0 + 700 * _MIN, 50)],   # eviction 730min > wm: suppressed
        ],
        [
            [(101, _T0 + 10 * _MIN, 10)],
            [(103, _T0 + 250 * _MIN, 30)],
            [(199, _T0 + 720 * _MIN - 1, 99)],
        ],
    )
    assert out == [(1, 101), (2, None), (3, 103), (4, None)]


def test_outer_join_state_bounded_by_watermark(spark, tmp_path):
    """The 100 TB contract of the outer join: state is bounded by
    traffic inside the horizon+delay window, not stream length. On
    the sf0.001 replay (1000 events fed across 4 files per side),
    every batch must REMOVE evicted rows and the final batch's
    retained state must be the unprovable tail only — two orders of
    magnitude below the fed row count."""
    import glob
    import os
    import shutil
    import uuid

    from alstom_spark_cassandra_spark.sources.loader import load_table
    from alstom_spark_cassandra_spark.streaming import interval_join_stream

    base = str(tmp_path / "ojoin_state")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id",
        "ts",
        "user_id",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias(
            "v_milli"
        ),
    )
    ev = ev.withColumn(
        "b",
        F.least(
            F.expr("greatest(ts DIV 86400000 - 19723, 0) DIV 8"), F.lit(3)
        ).cast("int"),
    )
    for side, parity in (("L", 0), ("R", 1)):
        os.makedirs(f"{base}/{side}")
        for k in range(4):
            stage = f"{base}/stage_{side}{k}"
            (
                ev.filter(
                    (F.col("b") == k) & (F.col("event_id") % 2 == parity)
                )
                .drop("b")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(stage)
            )
            part = glob.glob(f"{stage}/part-*.parquet")[0]
            dst = f"{base}/{side}/batch{k}.parquet"
            shutil.copyfile(part, dst)
            os.utime(dst, (1_000_000_000 + 60 * k,) * 2)
    sch = "event_id long, ts long, user_id long, v_milli long"
    left = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/L")
        .select(
            F.col("event_id").alias("l_event_id"),
            F.col("user_id").alias("l_user"),
            F.timestamp_millis("ts").alias("ltts"),
        )
    )
    right = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/R")
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("user_id").alias("r_user"),
            F.timestamp_millis("ts").alias("rtts"),
        )
    )
    j = interval_join_stream(
        left, right, "l_user", "r_user", "ltts", "rtts",
        horizon="30 minutes", watermark="1 hour", how="left_outer",
    )
    name = f"ojs_{uuid.uuid4().hex[:8]}"
    q = (
        j.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progress = q.recentProgress
    totals = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"] for p in progress
    )
    assert removed >= 400, (totals, removed)
    assert totals[-1] <= 20, totals  # only the unprovable tail is kept
    assert max(totals) < 500, totals  # never the whole 1000-row feed


def test_merge_sink_retry_idempotent_and_composes(spark, tmp_path):
    """foreach_batch_merge_sink: (a) a replayed batch re-reads its
    PREDECESSOR's snapshot and overwrites its own, so at-least-once
    delivery yields the once-applied result; (b) fates compose
    across batches — delete-then-insert re-inserts, insert-then-
    delete deletes."""
    import os

    from alstom_spark_cassandra_spark.streaming import (
        foreach_batch_merge_sink,
        read_merge_sink,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    spark.createDataFrame(
        [(1, 10, 100), (2, 11, 110)], "k long, event_id long, v long"
    ).write.parquet(f"{sink}/snap_-1")
    write = foreach_batch_merge_sink(sink, ["k"], "event_id", ["v"])

    b0 = spark.createDataFrame(
        [
            (1, 20, 0, "D"),    # delete key 1 ...
            (3, 21, 330, "U"),  # ... insert key 3
        ],
        "k long, event_id long, v long, op string",
    )
    b1 = spark.createDataFrame(
        [
            (1, 30, 150, "U"),  # ... then re-insert key 1
            (3, 31, 0, "D"),    # ... then delete key 3
        ],
        "k long, event_id long, v long, op string",
    )
    write(b0, 0)
    write(b1, 1)
    final = {
        (r.k): (r.event_id, r.v)
        for r in read_merge_sink(spark, sink).collect()
    }
    assert final == {1: (30, 150), 2: (11, 110)}
    # replay batch 1 (simulated foreachBatch retry): same result,
    # not a double-application
    write(b1, 1)
    again = {
        (r.k): (r.event_id, r.v)
        for r in read_merge_sink(spark, sink).collect()
    }
    assert again == final


def test_merge_sink_ignores_torn_snapshot_and_time_travels(spark, tmp_path):
    """A snapshot directory without Spark's _SUCCESS marker (a writer
    that died mid-overwrite) must be invisible both to readers and to
    a retrying batch looking for its predecessor; and read_merge_sink
    (version=N) time-travels to the committed state as of batch N."""
    import os
    import shutil

    from alstom_spark_cassandra_spark.streaming import (
        foreach_batch_merge_sink,
        read_merge_sink,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    spark.createDataFrame(
        [(1, 10, 100)], "k long, event_id long, v long"
    ).write.parquet(f"{sink}/snap_-1")
    write = foreach_batch_merge_sink(sink, ["k"], "event_id", ["v"])
    write(
        spark.createDataFrame(
            [(2, 20, 200, "U")], "k long, event_id long, v long, op string"
        ),
        0,
    )
    # tear snapshot 1: write it, then strip the success marker
    write(
        spark.createDataFrame(
            [(1, 30, 0, "D")], "k long, event_id long, v long, op string"
        ),
        1,
    )
    os.remove(f"{sink}/snap_1/_SUCCESS")
    # reader skips the torn snapshot and serves batch 0's state
    got = {r.k: r.v for r in read_merge_sink(spark, sink).collect()}
    assert got == {1: 100, 2: 200}
    # the replayed batch also seeds from snap_0, not the torn snap_1
    write(
        spark.createDataFrame(
            [(1, 30, 0, "D")], "k long, event_id long, v long, op string"
        ),
        1,
    )
    got = {r.k: r.v for r in read_merge_sink(spark, sink).collect()}
    assert got == {2: 200}
    # time travel: version=0 still shows key 1 alive
    got0 = {r.k: r.v for r in read_merge_sink(spark, sink, version=0).collect()}
    assert got0 == {1: 100, 2: 200}
    # and a fully torn chain raises the clear error
    shutil.rmtree(f"{sink}/snap_-1")
    os.remove(f"{sink}/snap_0/_SUCCESS")
    os.remove(f"{sink}/snap_1/_SUCCESS")
    try:
        read_merge_sink(spark, sink)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError as e:
        assert "committed" in str(e)


def test_compact_merge_sink_retention(spark, tmp_path):
    """compact_merge_sink keeps the newest keep_last committed
    snapshots (so a retry always finds its predecessor), preserves a
    torn CURRENT write for its retry, and deletes older torn debris."""
    import os

    from alstom_spark_cassandra_spark.streaming import (
        compact_merge_sink,
        foreach_batch_merge_sink,
        read_merge_sink,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    spark.createDataFrame(
        [(1, 10, 100)], "k long, event_id long, v long"
    ).write.parquet(f"{sink}/snap_-1")
    write = foreach_batch_merge_sink(sink, ["k"], "event_id", ["v"])
    for i in range(4):
        write(
            spark.createDataFrame(
                [(2 + i, 20 + i, 200 + i, "U")],
                "k long, event_id long, v long, op string",
            ),
            i,
        )
    # age a torn older snapshot and a torn newest-write
    os.remove(f"{sink}/snap_0/_SUCCESS")
    os.makedirs(f"{sink}/snap_9")
    removed = compact_merge_sink(sink, keep_last=2)
    assert removed == [-1, 0, 1]  # old committed + old torn go
    assert sorted(
        d for d in os.listdir(sink) if d.startswith("snap_")
    ) == ["snap_2", "snap_3", "snap_9"]  # torn current write survives
    final = {r.k for r in read_merge_sink(spark, sink).collect()}
    assert final == {1, 2, 3, 4, 5}
    try:
        compact_merge_sink(sink, keep_last=1)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "predecessor" in str(e)


def test_full_outer_right_null_boundary(spark, tmp_path):
    """Pins the measured full-outer right-side rule the
    stream_join_full_outer oracle encodes: a never-matched right row
    emits its null row iff r_ts < final watermark, STRICTLY — its own
    timestamp is the eviction point (a matching left must satisfy
    l_ts <= r_ts, and lefts at or below the watermark can no longer
    arrive). Sentinels on both sides pin the watermark at 640min;
    rights at 640min and above are suppressed, 1ms below emits."""
    sent_l = (98, _T0 + 700 * _MIN, 98)
    sent_r = (97, _T0 + 700 * _MIN, 97)
    for off, expect in [
        (0, []),                   # r_ts == wm -> suppressed
        (1, []),                   # above -> suppressed
        (-1, [(None, 9)]),         # 1ms below -> null row emits
    ]:
        out = _run_outer_join(
            spark, tmp_path / f"o{off}",
            [[sent_l], [], []],
            [[sent_r, (9, _T0 + 640 * _MIN + off, 9)], [], []],
            how="full_outer",
        )
        assert out == expect, (off, out)


def test_quota_stream_cross_batch_saturation(spark, tmp_path):
    """A key saturated in batch 0 must stay rejected in later batches
    (one long of cross-batch state, not a per-batch head); an
    under-cap key keeps admitting with continuing ranks; null order
    rows are dropped."""
    import uuid

    from alstom_spark_cassandra_spark.streaming import quota_stream

    sch = "k long, event_id long, v long"
    src = _stage_files(
        spark, tmp_path,
        [
            # batch 0: key 1 hits the cap (3); key 2 admits 2 of 3
            [(1, 10, 0), (1, 11, 1), (1, 12, 2), (1, 13, 3),
             (2, 20, 0), (2, 21, 1)],
            # batch 1: key 1 all rejected; key 2 admits one more then
            # rejects; null order row dropped
            [(1, 14, 4), (2, 22, 2), (2, 23, 3), (2, None, 9)],
        ],
        sch,
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = quota_stream(stream, ["k"], "event_id", ["v"], cap=3)
    name = f"q_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.k, r.event_id): r.quota_rank
        for r in spark.table(name).collect()
    }
    assert got == {
        (1, 10): 1, (1, 11): 2, (1, 12): 3,
        (2, 20): 1, (2, 21): 2, (2, 22): 3,
    }


def test_quota_stream_arrow_chunk_boundary(spark, tmp_path):
    """Pins the round-9 fix: applyInPandasWithState hands a key's
    micro-batch to admit() as MULTIPLE Arrow chunks when the batch
    exceeds arrow.maxRecordsPerBatch; sorting each chunk independently
    would admit the first `cap` of the FIRST CHUNK, not the batch's
    first `cap` by order_col. With the chunk size forced to 4 and one
    12-row batch arriving in descending event_id order, the per-chunk
    bug admits {9,10,11} (the first chunk's smallest); the contract —
    and the row_number oracle — requires {0,1,2}."""
    import uuid

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        sch = "k long, event_id long, v long"
        src = _stage_files(
            spark, tmp_path,
            [[(1, eid, eid) for eid in range(11, -1, -1)]],
            sch,
        )
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from alstom_spark_cassandra_spark.streaming import quota_stream

        out = quota_stream(stream, ["k"], "event_id", ["v"], cap=3)
        name = f"q_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = {
            (r.event_id, r.quota_rank)
            for r in spark.table(name).collect()
        }
        assert got == {(0, 1), (1, 2), (2, 3)}
    finally:
        spark.conf.set(key, old)


def test_quota_stream_chunk_prune_tie_break(spark, tmp_path):
    """Pins the round-10 memory bound: admit() prunes each Arrow chunk
    to its stable-sorted first `cap - n` rows before the cross-chunk
    concat, so memory is O(cap + chunk) not O(micro-batch). The prune
    must not change tie-breaking: with every row sharing order_col=7
    across 3 forced chunks of 4, the stable contract admits the first
    `cap` rows in DELIVERY order (chunk order, then original position
    within chunk) — exactly what sorting the whole batch at once
    yields. A prune that reordered ties would admit a different v-set."""
    import uuid

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        sch = "k long, event_id long, v long"
        # 12 rows, all tied on event_id=7; v encodes delivery position
        src = _stage_files(
            spark, tmp_path,
            [[(1, 7, pos) for pos in range(12)]],
            sch,
        )
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        from alstom_spark_cassandra_spark.streaming import quota_stream

        out = quota_stream(stream, ["k"], "event_id", ["v"], cap=5)
        name = f"q_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = {(r.v, r.quota_rank) for r in spark.table(name).collect()}
        assert got == {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)}
    finally:
        spark.conf.set(key, old)


def test_interval_join_replay_chunking_invariant(spark):
    """The round-9 replay-cost trim rests on one claim: the drained
    outer-join table is independent of how the feed is chunked into
    trigger files, because matches never consult the watermark and
    the null-row cutoffs depend only on the FINAL watermark — a
    whole-feed property. Pin it by draining the same sf0.001 feed as
    3×11-day and 4×8-day files and comparing the full row sets."""
    from alstom_spark_cassandra_spark.workloads import (
        _staged_interval_join_replay,
    )

    rows = lambda df: sorted(  # noqa: E731
        tuple(r) for r in df.collect()
    )
    a = rows(_staged_interval_join_replay(
        spark, "/root/testdata/sf0.001", "left_outer", "inv3",
        files=(3, 11),
    ))
    b = rows(_staged_interval_join_replay(
        spark, "/root/testdata/sf0.001", "left_outer", "inv4",
        files=(4, 8),
    ))
    assert a == b
    assert len(a) > 0


def test_replay_leaves_caller_conf_untouched(spark, monkeypatch):
    """Round-11 hardening of the r9-ADVICE shuffle-partitions item:
    the small-scale 4-partition override now runs on a CLONED session
    (spark.newSession() inside _staged_interval_join_replay), so the
    caller's spark.sql.shuffle.partitions is untouchable by
    construction — pin it on BOTH the success path (a full small
    drain) and the failure path (the join builder raising mid-setup,
    where the old session-global set + try/finally restore depended
    on the finally actually running on the shared session)."""
    from alstom_spark_cassandra_spark.workloads import (
        _staged_interval_join_replay,
    )

    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")  # sentinel no code path ever sets
    try:
        out = _staged_interval_join_replay(
            spark, "/root/testdata/sf0.001", "left_outer", "confok"
        )
        assert out.count() > 0
        assert spark.conf.get(key) == "7"

        def boom(*a, **k):
            raise RuntimeError("mid-drain failure")

        monkeypatch.setattr(
            "alstom_spark_cassandra_spark.streaming.live_state."
            "interval_join_stream",
            boom,
        )
        with pytest.raises(RuntimeError, match="mid-drain"):
            _staged_interval_join_replay(
                spark, "/root/testdata/sf0.001", "left_outer", "confko"
            )
        assert spark.conf.get(key) == "7"
    finally:
        spark.conf.set(key, old)


def test_index_ingest_replay_is_a_noop_and_torn_batch_invisible(
    spark, tmp_path
):
    """foreach_batch_index_ingest's replay contract: re-delivering a
    COMMITTED batch (at-least-once into foreachBatch) short-circuits
    on the done marker — the index gains no rows and the pairs are
    untouched; a batch whose marker never landed (torn) is invisible
    to read_index_ingest_pairs until its replay commits it."""
    import os

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_index_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_minhash_index(docs, index_path, "text", "doc_id")
    ingest = foreach_batch_index_ingest(
        index_path, pairs_sink, threshold=1.0
    )
    batch = spark.createDataFrame(
        [(11, "a b c d e f g h")], "doc_id long, text string"
    )
    ingest(batch, 0)
    n_sig = spark.read.parquet(f"{index_path}/signatures").count()
    got = {(r.a, r.b) for r in read_index_ingest_pairs(spark, pairs_sink).collect()}
    assert got == {(1, 11)}
    # replay after success: marker short-circuits — nothing changes
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/signatures").count() == n_sig
    assert {
        (r.a, r.b) for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == {(1, 11)}
    # torn batch: pairs dir present, marker missing -> invisible
    spark.createDataFrame([(99, 100)], "a long, b long").write.parquet(
        f"{pairs_sink}/pairs_7"
    )
    assert {
        (r.a, r.b) for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == {(1, 11)}


def test_simhash_ingest_replay_is_a_noop(spark, tmp_path):
    """The SECOND family through the family-agnostic ingest core
    (foreach_batch_simhash_ingest): replay after success
    short-circuits on the done marker — the band index gains no rows
    and the pairs are untouched; same contract, different
    incremental operator."""
    import os

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_simhash_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_simhash_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_simhash_index(docs, index_path, "text", "doc_id")
    ingest = foreach_batch_simhash_ingest(index_path, pairs_sink)
    batch = spark.createDataFrame(
        [(11, "a b c d e f g h")], "doc_id long, text string"
    )
    ingest(batch, 0)
    n_bands = spark.read.parquet(f"{index_path}/bands").count()
    got = {
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    }
    assert got == {(1, 11)}
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/bands").count() == n_bands
    assert {
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == {(1, 11)}


def test_index_ingest_double_append_does_not_multiply_pairs(
    spark, tmp_path
):
    """The crash window between the index append and the done marker
    double-appends the batch's SIGNATURE rows on replay, and the
    MinHash estimator joins signatures per pair side — so without
    the sink's pairs-level dropDuplicates, every later batch pairing
    those docs would emit duplicate (a, b) rows and the drained
    union would diverge from the oracle.  Simulated here: commit
    batch 0, delete its marker (the crash), replay it (index rows
    now doubled), then ingest batch 1 against the corrupted index —
    every batch's pairs must still be exactly-once."""
    import os
    from collections import Counter

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_index_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_minhash_index(docs, index_path, "text", "doc_id")
    ingest = foreach_batch_index_ingest(
        index_path, pairs_sink, threshold=1.0
    )
    batch0 = spark.createDataFrame(
        [(11, "a b c d e f g h")], "doc_id long, text string"
    )
    ingest(batch0, 0)
    n_sig = spark.read.parquet(f"{index_path}/signatures").count()
    # the crash: append + pairs committed, marker lost -> replay
    # re-runs the whole batch, double-appending doc 11's index rows
    os.rmdir(f"{pairs_sink}/done_0")
    ingest(batch0, 0)
    assert (
        spark.read.parquet(f"{index_path}/signatures").count()
        == n_sig + 1
    )
    # batch 1 pairs against the corrupted index: doc 11 carries two
    # signature rows, so the estimator join would emit (11, 21)
    # twice without the sink's dropDuplicates
    batch1 = spark.createDataFrame(
        [(21, "a b c d e f g h")], "doc_id long, text string"
    )
    ingest(batch1, 1)
    counts = Counter(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    )
    assert counts == Counter({(1, 11): 1, (1, 21): 1, (11, 21): 1})


def test_incremental_ingest_inner_batch_plan_clean(spark, tmp_path):
    """The foreachBatch INNER plans the registry sweep cannot reach
    (stream_* rows are excluded there because calling them executes
    the stream): the exact pairs plan foreach_batch_incremental_
    ingest writes — the family's incremental operator against a
    persisted index plus the sink's dropDuplicates — and the merge
    sink's apply_changes fold, both captured directly and pinned
    free of cartesian products and row-at-a-time Python UDFs."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
        build_simhash_index,
        incremental_dedup_pairs,
        incremental_simhash_pairs,
    )
    from alstom_spark_cassandra_spark.operators.merge import (
        apply_changes,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d") for i in range(20)],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh")
    sh = str(tmp_path / "sh")
    build_minhash_index(docs, mh, "text", "doc_id")
    build_simhash_index(docs, sh, "text", "doc_id")
    batch = docs.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    plans = {
        "minhash": incremental_dedup_pairs(
            spark, batch, mh, "text", "doc_id", threshold=1.0
        ).dropDuplicates(["a", "b"]),
        "simhash": incremental_simhash_pairs(
            spark, batch, sh, "text", "doc_id"
        ).dropDuplicates(["a", "b"]),
    }
    # the semantic member's inner plan (verdicts, not pairs): flat
    # assignment + prune against the persisted bucketed kept table
    import random

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    rng = random.Random(11)
    base_vecs = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    init = base_vecs.limit(4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    sem = str(tmp_path / "sem")
    build_semantic_index(base_vecs, init, sem, threshold=0.4)
    sem_batch = base_vecs.select(
        (F.col("vec_id") + 100).alias("vec_id"), "embedding"
    )
    plans["semantic"] = incremental_semantic_dedup(
        spark, sem_batch, sem, threshold=0.4
    ).dropDuplicates(["vec_id"])
    # the merge sink's inner fold over parquet-read state
    prev_path = str(tmp_path / "prev")
    spark.createDataFrame(
        [(1, 10, 100)], "k long, event_id long, v long"
    ).write.parquet(prev_path)
    changes = spark.createDataFrame(
        [(2, 20, 200, "U")], "k long, event_id long, v long, op string"
    )
    plans["merge"] = apply_changes(
        spark.read.parquet(prev_path),
        changes,
        ["k"],
        "event_id",
        ["v"],
    )
    offenders = {}
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [
            t
            for t in (
                "CartesianProduct",
                "BatchEvalPython",
                "BroadcastNestedLoopJoin",
            )
            if t in plan
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_winnow_ingest_replay_is_a_noop(spark, tmp_path):
    """The THIRD family through the family-agnostic ingest core
    (foreach_batch_winnow_ingest): replay after success
    short-circuits on the done marker — the fingerprint index gains
    no rows and the pairs are untouched; winnowing parameters come
    from the index's own params table."""
    import os

    from alstom_spark_cassandra_spark.operators.winnow import (
        build_winnow_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_winnow_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words in this other document"),
        ],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_winnow_index(docs, index_path, "text", "doc_id", k=3, w=4)
    ingest = foreach_batch_winnow_ingest(
        index_path, pairs_sink, threshold=0.9, max_docs_per_fp=None
    )
    batch = spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    ingest(batch, 0)
    n_fp = spark.read.parquet(f"{index_path}/fps").count()
    got = {
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    }
    assert got == {(1, 11)}
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/fps").count() == n_fp
    assert {
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == {(1, 11)}


def test_bm25_ingest_replay_and_crash_guard(spark, tmp_path):
    """The BM25 member of the family-agnostic ingest core — the one
    whose output IS the index and whose append mutates GLOBAL stats,
    so a double-append would corrupt every score rather than cost
    bytes.  Three pins in one lifecycle: (1) the streamed index
    serves identically to a one-shot build over the union; (2)
    replay after success short-circuits on the done marker; (3) the
    member's own anti-join guard makes the CRASH replay (marker
    deleted after a committed append) a no-op on postings, doc_len
    AND the global stats — the window the pairs-level dropDuplicates
    cannot cover."""
    import os

    from alstom_spark_cassandra_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_bm25_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles are expensive at scale"),
            (2, "broadcast joins avoid the shuffle entirely"),
            (3, "parquet footers carry the row group stats"),
            (4, "the optimizer prunes partitions from the scan"),
        ],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4),
        index_path,
    )
    ingest = foreach_batch_bm25_ingest(index_path, pairs_sink)
    batch = spark.createDataFrame(
        [
            (11, "shuffle partitions size the spark exchange"),
            (12, "row group pruning reads fewer parquet bytes"),
        ],
        "doc_id long, text string",
    )
    ingest(batch, 0)
    queries = spark.createDataFrame(
        [(0, "spark shuffle partitions")],
        "query_id long, query_text string",
    )
    union = docs.unionByName(batch)

    def serve():
        return [
            (r.query_id, r.doc, r.score_micro, r.rank)
            for r in bm25_topk(
                union,
                queries,
                k=4,
                index=read_bm25_index(spark, index_path),
            )
            .orderBy("query_id", "rank")
            .collect()
        ]

    want = [
        (r.query_id, r.doc, r.score_micro, r.rank)
        for r in bm25_topk(
            union,
            queries,
            k=4,
            index=build_bm25_index(union, "text", "doc_id"),
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert serve() == want  # streamed index == one-shot build
    stats0 = spark.read.parquet(f"{index_path}/stats").first()
    n_post = spark.read.parquet(f"{index_path}/postings").count()
    art = sorted(
        (r.doc, r.dl)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    )
    assert art == [(11, 6), (12, 7)]
    # (2) marker replay: everything untouched
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/stats").first() == stats0
    # (3) CRASH replay: marker lost after the append committed — the
    # anti-join vs persisted doc_len must make the re-run append
    # NOTHING (append_bm25_index's empty-batch short-circuit), or
    # n_docs/total_len double-count and every score shifts
    os.rmdir(f"{pairs_sink}/done_0")
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/stats").first() == stats0
    assert (
        spark.read.parquet(f"{index_path}/postings").count() == n_post
    )
    assert sorted(
        (r.doc, r.dl)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == art  # artifact recomputed from the batch: replay-stable
    assert serve() == want
    # a LATER batch still appends normally past the replayed one
    batch1 = spark.createDataFrame(
        [(21, "stats in the footer prune row groups")],
        "doc_id long, text string",
    )
    ingest(batch1, 1)
    stats1 = spark.read.parquet(f"{index_path}/stats").first()
    assert stats1["n_docs"] == stats0["n_docs"] + 1
    # compaction sweeps the member's started_ markers together with
    # done_ — the sink keeps no per-trigger debris below the baseline
    from alstom_spark_cassandra_spark.streaming.live_state import (
        compact_ingest_pairs,
    )

    assert compact_ingest_pairs(spark, pairs_sink) == [0, 1]
    names = set(os.listdir(pairs_sink))
    assert not any(
        n.startswith(("done_", "started_", "pairs_")) for n in names
    ), names
    assert "baseline_1" in names
    # and the artifact union is unchanged through the fold
    assert sorted(
        (r.doc, r.dl)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == art + [(21, 7)]


def test_positional_ingest_replay_and_crash_guard(spark, tmp_path):
    """The positional member: double-appended postings would double
    phrase match counts, so the started-marker guard must make the
    crash replay (done marker lost after a committed append) a no-op
    on the postings — and the drained index must phrase-search
    identically to a one-shot build over the union."""
    import os

    from alstom_spark_cassandra_spark.operators.retrieval import (
        build_positional_index,
        phrase_search,
        read_positional_index,
        write_positional_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_positional_ingest,
    )

    docs = spark.createDataFrame(
        [
            (1, "the table hash join beats the sort merge join"),
            (2, "no phrase here at all"),
        ],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    write_positional_index(
        build_positional_index(docs, "text", "doc_id", n_buckets=4),
        index_path,
    )
    ingest = foreach_batch_positional_ingest(index_path, pairs_sink)
    batch = spark.createDataFrame(
        [(11, "another table hash probe and table hash build")],
        "doc_id long, text string",
    )
    ingest(batch, 0)

    def matches():
        return sorted(
            (r.doc, r.n_matches)
            for r in phrase_search(
                read_positional_index(spark, index_path), "table hash"
            ).collect()
        )

    want = [(1, 1), (11, 2)]
    assert matches() == want
    n_post = spark.read.parquet(f"{index_path}/postings").count()
    # crash replay: marker lost after the append committed — without
    # the guard, doc 11's postings double and its count reads 4
    os.rmdir(f"{pairs_sink}/done_0")
    ingest(batch, 0)
    assert (
        spark.read.parquet(f"{index_path}/postings").count() == n_post
    )
    assert matches() == want
    # a later batch appends normally
    ingest(
        spark.createDataFrame(
            [(21, "table hash once more")], "doc_id long, text string"
        ),
        1,
    )
    assert matches() == want + [(21, 1)]


def test_ivf_pq_ingest_replay_and_crash_guard(spark, tmp_path):
    """The IVF and PQ members: a double-appended vector occupies two
    ranks in every matching top-k, so the started-marker guard must
    make the crash replay a no-op on the assignment/codes tables —
    and the committed per-batch artifact must be replay-stable."""
    import os
    import random

    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.pq import (
        pq_build,
        write_pq_index,
    )
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_ivf_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_ivf_ingest,
        foreach_batch_pq_ingest,
        read_index_ingest_pairs,
    )

    rng = random.Random(11)
    base = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (100, [rng.gauss(0, 1) for _ in range(8)]),
            (101, [rng.gauss(0, 1) for _ in range(8)]),
        ],
        "vec_id long, embedding array<double>",
    )

    # --- IVF ---
    ivf_path = str(tmp_path / "ivf")
    ivf_sink = str(tmp_path / "ivf_pairs")
    os.makedirs(ivf_sink)
    build_ivf_index(base, ivf_path, n_centroids=4)
    ingest = foreach_batch_ivf_ingest(ivf_path, ivf_sink)
    ingest(batch, 0)
    n_assign = spark.read.parquet(f"{ivf_path}/assignment").count()
    assert n_assign == 14
    art = sorted(
        (r.vec_id, r.cid)
        for r in read_index_ingest_pairs(spark, ivf_sink).collect()
    )
    assert [v for v, _ in art] == [100, 101]
    os.rmdir(f"{ivf_sink}/done_0")
    ingest(batch, 0)
    assert (
        spark.read.parquet(f"{ivf_path}/assignment").count()
        == n_assign
    )
    assert sorted(
        (r.vec_id, r.cid)
        for r in read_index_ingest_pairs(spark, ivf_sink).collect()
    ) == art  # artifact replay-stable (frozen-centroid assignment)

    # --- PQ ---
    pq_path = str(tmp_path / "pq")
    pq_sink = str(tmp_path / "pq_pairs")
    os.makedirs(pq_sink)
    init = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    codes, books = pq_build(base, init, m_sub=4, n_iters=1)
    write_pq_index(codes, books, pq_path)
    pingest = foreach_batch_pq_ingest(pq_path, pq_sink)
    pingest(batch, 0)
    n_codes = spark.read.parquet(f"{pq_path}/codes").count()
    assert n_codes == 14 * 4  # one code row per (vector, subspace)
    os.rmdir(f"{pq_sink}/done_0")
    pingest(batch, 0)
    assert spark.read.parquet(f"{pq_path}/codes").count() == n_codes
    assert sorted(
        (r.vec_id, r.dim)
        for r in read_index_ingest_pairs(spark, pq_sink).collect()
    ) == [(100, 8), (101, 8)]


def test_ingest_survives_mid_stream_compaction(spark, tmp_path):
    """Maintenance interleaved with the streaming ingest loop: after
    batch 0 commits, compact_partitioned_parquet folds the band
    directories and the signatures table; batch 1 must then probe
    the COMPACTED index and still pair exactly-once against both the
    base corpus and batch 0 — compaction changes the file layout and
    nothing the stream can observe (the single-writer discipline is
    the caller's: compaction runs BETWEEN triggers, as the
    maintenance cycle would)."""
    import os

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
    )
    from alstom_spark_cassandra_spark.sources.sinks import (
        compact_partitioned_parquet,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_index_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_minhash_index(docs, index_path, "text", "doc_id")
    ingest = foreach_batch_index_ingest(
        index_path, pairs_sink, threshold=1.0
    )
    ingest(
        spark.createDataFrame(
            [(11, "a b c d e f g h")], "doc_id long, text string"
        ),
        0,
    )
    compact_partitioned_parquet(spark, f"{index_path}/bands", "band")
    compact_partitioned_parquet(
        spark, f"{index_path}/signatures", None
    )
    ingest(
        spark.createDataFrame(
            [(21, "a b c d e f g h")], "doc_id long, text string"
        ),
        1,
    )
    got = sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    )
    assert got == [(1, 11), (1, 21), (11, 21)]


def test_semantic_ingest_replay_is_a_noop(spark, tmp_path):
    """The semantic member of the family-agnostic ingest core — the
    one whose output is per-vector VERDICTS, not pairs, and whose
    append is survivors-only: replay after success short-circuits on
    the done marker (kept table gains no rows, verdicts untouched)."""
    import os
    import random

    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_incremental_ingest,
        read_index_ingest_pairs,
    )

    rng = random.Random(5)
    base_vecs = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(8)
    ]
    base = spark.createDataFrame(
        base_vecs, "vec_id long, embedding array<double>"
    )
    init = base.limit(4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_semantic_index(base, init, index_path, threshold=0.4)

    def _fn(spark_, batch_df, path):
        return incremental_semantic_dedup(
            spark_, batch_df, path, threshold=0.4, update_index=True
        )

    ingest = foreach_batch_incremental_ingest(
        index_path, pairs_sink, _fn, pair_cols=("vec_id",)
    )
    # one near-dup of base vec 0 (dropped) and one fresh vector (kept)
    batch = spark.createDataFrame(
        [
            (100, [x + 0.001 for x in base_vecs[0][1]]),
            (101, [rng.gauss(0, 1) for _ in range(8)]),
        ],
        "vec_id long, embedding array<double>",
    )
    ingest(batch, 0)
    n_kept = spark.read.parquet(f"{index_path}/kept").count()
    got = {
        (r.vec_id, r.kept)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    }
    assert got == {(100, False), (101, True)}
    ingest(batch, 0)
    assert spark.read.parquet(f"{index_path}/kept").count() == n_kept
    assert {
        (r.vec_id, r.kept)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == {(100, False), (101, True)}


def test_semantic_ingest_crash_replay_preserves_verdicts(
    spark, tmp_path
):
    """The crash window the pairs-level dropDuplicates CANNOT cover
    for an index-state-dependent member: the semantic incremental_fn
    commits its survivor append BEFORE the verdicts write and done
    marker, so an at-least-once redelivery re-prunes the batch
    against its OWN appended survivors.  _incremental_prune's
    same-id exclusion makes the replay recompute bit-identical
    verdicts (a survivor never self-matches at cosine 1.0) — without
    it the replay would overwrite pairs_0 with kept=false for every
    survivor and the marker would commit the corruption permanently.
    Simulated exactly like the MinHash double-append sim: commit
    batch 0, delete its marker (the crash), replay it."""
    import os
    import random

    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        foreach_batch_incremental_ingest,
        read_index_ingest_pairs,
    )

    # seed 5 = the no-op replay test's geometry, whose first-run
    # verdicts {(100, False), (101, True)} are already pinned there
    rng = random.Random(5)
    base_vecs = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(8)
    ]
    base = spark.createDataFrame(
        base_vecs, "vec_id long, embedding array<double>"
    )
    init = base.limit(4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_semantic_index(base, init, index_path, threshold=0.4)

    def _fn(spark_, batch_df, path):
        return incremental_semantic_dedup(
            spark_, batch_df, path, threshold=0.4, update_index=True
        )

    ingest = foreach_batch_incremental_ingest(
        index_path, pairs_sink, _fn, pair_cols=("vec_id",)
    )
    fresh = [rng.gauss(0, 1) for _ in range(8)]
    batch = spark.createDataFrame(
        [
            (100, [x + 0.001 for x in base_vecs[0][1]]),
            (101, fresh),
        ],
        "vec_id long, embedding array<double>",
    )
    want = {(100, False), (101, True)}
    ingest(batch, 0)
    n_kept = spark.read.parquet(f"{index_path}/kept").count()
    assert {
        (r.vec_id, r.kept)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == want
    # the crash: append + pairs committed, marker lost -> the replay
    # re-runs the whole batch against its own appended survivor 101
    os.rmdir(f"{pairs_sink}/done_0")
    ingest(batch, 0)
    assert {
        (r.vec_id, r.kept)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == want  # verdicts bit-identical, NOT flipped to kept=false
    # the double-append costs index bytes only (survivor 101 twice)
    kept = spark.read.parquet(f"{index_path}/kept")
    assert kept.count() == n_kept + 1
    assert kept.filter("id = 101").count() == 2
    # batch 1 against the duplicated table: a near-dup of 101 drops
    # exactly once, via the appended survivor
    batch1 = spark.createDataFrame(
        [(200, [x + 0.001 for x in fresh])],
        "vec_id long, embedding array<double>",
    )
    ingest(batch1, 1)
    assert {
        (r.vec_id, r.kept)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    } == want | {(200, False)}


def test_compact_ingest_pairs_lifecycle(spark, tmp_path):
    """The ingest sink's small-files maintenance op
    (compact_ingest_pairs): per-trigger pairs directories fold into
    one committed baseline with the drained union unchanged; replay
    markers survive (a redelivery of a folded batch is still a
    no-op); the compaction's own crash window (baseline committed,
    source dirs not yet deleted) reads exactly-once and a re-run
    converges; later triggers land beside the baseline and a second
    compaction folds baseline + tail."""
    import os

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
    )
    from alstom_spark_cassandra_spark.streaming.live_state import (
        compact_ingest_pairs,
        foreach_batch_index_ingest,
        read_index_ingest_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    index_path = str(tmp_path / "idx")
    pairs_sink = str(tmp_path / "pairs")
    os.makedirs(pairs_sink)
    build_minhash_index(docs, index_path, "text", "doc_id")
    ingest = foreach_batch_index_ingest(
        index_path, pairs_sink, threshold=1.0
    )
    for k, (new_id, text) in enumerate(
        [(11, "a b c d e f g h"), (21, "a b c d e f g h"),
         (31, "p q r s t u v w")]
    ):
        ingest(
            spark.createDataFrame(
                [(new_id, text)], "doc_id long, text string"
            ),
            k,
        )
    want = sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    )
    assert (1, 11) in want and (11, 21) in want and (2, 31) in want

    folded = compact_ingest_pairs(spark, pairs_sink)
    assert folded == [0, 1, 2]
    names = sorted(os.listdir(pairs_sink))
    assert "baseline_2" in names
    assert not any(n.startswith("pairs_") for n in names)
    # markers ≤ baseline are DELETED (listing stays O(batches since
    # the fold), not O(triggers ever) — the r14 verdict's marker-
    # growth item); the committed baseline id takes over as the
    # replay guard below
    assert not any(n.startswith("done_") for n in names)
    assert sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == want
    # late redelivery of a folded, marker-deleted batch: still a
    # no-op via the baseline low-water mark (id 0 ≤ baseline 2)
    n_sig = spark.read.parquet(f"{index_path}/signatures").count()
    ingest(
        spark.createDataFrame(
            [(11, "a b c d e f g h")], "doc_id long, text string"
        ),
        0,
    )
    assert spark.read.parquet(f"{index_path}/signatures").count() == n_sig
    assert not os.path.exists(f"{pairs_sink}/pairs_0")
    assert sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == want

    # crash window: baseline committed, a covered pairs dir still on
    # disk -> exactly-once read; the next run sweeps the debris
    spark.createDataFrame(
        [(1, 11, 1.0)], "a long, b long, est_jaccard double"
    ).write.parquet(f"{pairs_sink}/pairs_1")
    assert sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == want
    assert compact_ingest_pairs(spark, pairs_sink) == []
    assert not os.path.exists(f"{pairs_sink}/pairs_1")

    # later trigger + second fold: baseline + tail -> new baseline
    ingest(
        spark.createDataFrame(
            [(41, "a b c d e f g h")], "doc_id long, text string"
        ),
        7,
    )
    want2 = sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    )
    assert len(want2) > len(want)
    assert compact_ingest_pairs(spark, pairs_sink) == [7]
    names = sorted(os.listdir(pairs_sink))
    assert "baseline_7" in names and "baseline_2" not in names
    assert sorted(
        (r.a, r.b)
        for r in read_index_ingest_pairs(spark, pairs_sink).collect()
    ) == want2
