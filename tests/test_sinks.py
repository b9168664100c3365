"""Write-path tests: partitioned layout produces partition pruning."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.sources.sinks import (
    day_col,
    write_compacted_log,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, tmp_path):
    ev = spark.createDataFrame(
        [(i, i * 86_400_000 + 5, float(i)) for i in range(10)],
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


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed identically on the join key: the join plan
    must contain NO shuffle exchange — the co-location contract that
    makes repeated fact-fact joins affordable at 100 TB."""
    from alstom_spark_cassandra_spark.sources.sinks import write_bucketed

    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10_000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
    )
    # one file per bucket: Spark only trusts bucket sort order when
    # each bucket is a single file (else it re-sorts before the SMJ)
    write_bucketed(a.coalesce(1), "bkt_a", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "bkt_a"))
    write_bucketed(b.coalesce(1), "bkt_b", ["k"], 8, sort_cols=["k"],
                   path=str(tmp_path / "bkt_b"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # sort-elimination on bucketed scans moved behind a legacy flag in
    # Spark 3.0 (multi-file buckets would need a merge-sort reader);
    # with coalesce(1) above each bucket is one file, so it is safe
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        assert j.count() == 3334
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # pre-sorted buckets: no per-partition Sort before the SMJ
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_bucketed_agg_no_shuffle(spark, tmp_path):
    """GroupBy on the bucket key reuses the bucketed layout: no
    exchange before the final aggregate."""
    from alstom_spark_cassandra_spark.sources.sinks import write_bucketed

    a = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(a, "bkt_g", ["k"], 8, path=str(tmp_path / "bkt_g"))
    try:
        g = spark.table("bkt_g").groupBy("k").agg(F.sum("v").alias("s"))
        assert g.count() == 100
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_g")


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a partitioned fact to a filtered dim must inject a
    dynamic pruning subquery into the fact scan: only the dim's
    surviving partitions are read — at 100 TB this is the difference
    between scanning a day and scanning a decade."""
    from alstom_spark_cassandra_spark.sources.sinks import write_partitioned

    fact = spark.range(10_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("day_idx"),
        (F.col("id") % 997).alias("v"),
    )
    out = str(tmp_path / "fact_part")
    write_partitioned(fact, out, ["day_idx"])
    dim = spark.createDataFrame(
        [(i, "hot" if i == 3 else "cold") for i in range(10)],
        "day_idx long, label string",
    )
    j = (
        spark.read.parquet(out)
        .join(dim, "day_idx")
        .filter(F.col("label") == "hot")
    )
    assert j.count() == 1000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_bucketed_join_persisted_query_plan(spark):
    """The GRADED bucketed-join query (workloads.
    q_bucketed_join_persisted) must actually run shuffle-free: both
    bucketed scans report HashPartitioning(custkey), so neither the
    sort-merge join nor the per-customer aggregate may introduce a
    hash exchange — the only exchange allowed is the output sort's
    range partitioning. This pins write_bucketed's 'joins skip their
    shuffle' claim on the persisted round-trip the driver grades."""
    from alstom_spark_cassandra_spark.workloads import (
        q_bucketed_join_persisted,
    )

    sf = "/root/testdata/sf0.001"
    try:
        df = q_bucketed_join_persisted(spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # the scans really are bucketed reads, not plain file scans
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        slug = "".join(c if c.isalnum() else "_" for c in sf)
        spark.sql(f"DROP TABLE IF EXISTS bkt_orders{slug}")
        spark.sql(f"DROP TABLE IF EXISTS bkt_cust{slug}")


def test_latest_bucketed_persisted_query_plan(spark):
    """The GRADED bucketed change-log argmax (workloads.
    q_latest_bucketed_persisted): the scan of the series-key-bucketed
    log reports HashPartitioning(uevol_field_id, src_id), which
    satisfies the groupBy's clustering (bucket cols are a subset of
    the grouping keys), so the latest-per-series aggregate runs with
    NO hash exchange — the only exchange is the output sort. This is
    the hot reconstruction path as physical layout."""
    from alstom_spark_cassandra_spark.workloads import (
        q_latest_bucketed_persisted,
    )

    sf = "/root/testdata/sf0.001"
    try:
        df = q_latest_bucketed_persisted(spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        slug = "".join(c if c.isalnum() else "_" for c in sf)
        spark.sql(f"DROP TABLE IF EXISTS bkt_log{slug}")


def test_merge_apply_bucketed_base_single_exchange(spark, tmp_path):
    """apply_changes against a base PERSISTED bucketed by the merge
    keys: the base side of the full-outer join reads pre-partitioned
    (no exchange), so the entire merge moves only the minimized
    change set — ONE hash exchange in the whole plan. This is the
    daily-MERGE economics at 100 TB: the big snapshot never
    shuffles, only the day's changes do."""
    from alstom_spark_cassandra_spark.operators import apply_changes
    from alstom_spark_cassandra_spark.sources.sinks import write_bucketed

    base = spark.range(1000).select(
        F.col("id").alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).alias("v"),
    )
    write_bucketed(
        base, "bkt_merge_base", ["k"], 4, sort_cols=["k"],
        path=str(tmp_path / "base"),
    )
    changes = spark.range(2000, 2100).select(
        (F.col("id") % 50).alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 89).alias("v"),
        F.when(F.col("id") % 10 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    try:
        out = apply_changes(
            spark.table("bkt_merge_base"), changes, ["k"], "event_id", ["v"]
        )
        n = out.count()
        # 1000 base keys, changes touch keys 0..49, 10 of the 100
        # change rows are tombstones; latest-change-wins decides how
        # many of the 50 touched keys survive
        assert 950 <= n <= 1000
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_merge_base")


def test_partitioned_ingest_prunes(spark):
    """The GRADED partitioned-ingest query must resolve its day
    window against partition directories at planning time: the scan
    lists PartitionFilters on `day` and reads only the matching
    day= directories — no post-scan filter over the full log."""
    from alstom_spark_cassandra_spark.workloads import q_partitioned_ingest

    df = q_partitioned_ingest(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # the day window really reached the partition filter clause
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "day" in pf.group(1), plan


def test_write_table_parquet_roundtrip(spark, tmp_path):
    """write_table's parquet branch mirrors load_table's path
    convention: {base}/{name}.parquet, readable back via the loader."""
    from alstom_spark_cassandra_spark.sources import write_table
    from alstom_spark_cassandra_spark.sources.loader import load_table

    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_table(df, str(tmp_path), "pairs", mode="overwrite")
    back = spark.read.parquet(str(tmp_path / "pairs.parquet"))
    assert back.count() == 10
    assert {r.k: r.v for r in back.collect()} == {i: 2 * i for i in range(10)}


def test_write_table_cassandra_dispatch(spark):
    """The cassandra:// branch assembles the connector write (same
    format string and option names as the read path in
    sources/loader.load_table): without the connector jar Spark must
    fail at DATA-SOURCE RESOLUTION — proving the dispatch selected
    the Cassandra format and never silently fell through to parquet.
    The cluster round-trip itself is a deployment concern (the
    sandbox has no connector jar or cluster), exactly like the read
    path's existing coverage."""
    import pytest

    from alstom_spark_cassandra_spark.sources import write_table

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(Exception) as ei:
        write_table(df, "cassandra://testks", "pairs")
    msg = str(ei.value).lower()
    assert "cassandra" in msg, msg


def test_compact_partitioned_parquet_one_file_per_partition(
    spark, tmp_path
):
    """The generic index-maintenance op (sources/sinks.
    compact_partitioned_parquet) on the MinHash band layout: two
    appends leave multiple file generations per band dir; compaction
    folds every band back to exactly ONE file with the row multiset
    bit-identical — the compact_semantic_index physical-rewrite
    contract extended to the engine's partitioned-dir indexes."""
    import os

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
        incremental_dedup_pairs,
    )
    from alstom_spark_cassandra_spark.sources.sinks import (
        compact_partitioned_parquet,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    path = str(tmp_path / "mh_compact")
    build_minhash_index(docs, path, "text", "doc_id")
    for off in (10_000_000, 20_000_000):
        batch = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + off).alias("doc_id"), "text"
        )
        incremental_dedup_pairs(
            spark, batch, path, "text", "doc_id", update_index=True
        ).count()

    def band_files():
        root = f"{path}/bands"
        return {
            d: len(
                [
                    f
                    for f in os.listdir(f"{root}/{d}")
                    if f.startswith("part-")
                ]
            )
            for d in os.listdir(root)
            if d.startswith("band=")
        }

    before_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/bands").collect()
    )
    assert max(band_files().values()) >= 3  # build + 2 appends
    compact_partitioned_parquet(spark, f"{path}/bands", "band")
    after = band_files()
    assert set(after.values()) == {1}
    after_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/bands").collect()
    )
    assert after_rows == before_rows

    # the flat signatures table compacts to n_files
    sig_dir = f"{path}/signatures"
    sig_before = sorted(
        tuple(r) for r in spark.read.parquet(sig_dir).collect()
    )
    compact_partitioned_parquet(spark, sig_dir, None, n_files=2)
    n = len(
        [f for f in os.listdir(sig_dir) if f.startswith("part-")]
    )
    assert n <= 2
    assert (
        sorted(tuple(r) for r in spark.read.parquet(sig_dir).collect())
        == sig_before
    )


def test_compact_partitioned_parquet_crash_recovery(spark, tmp_path):
    """The compaction's final overwrite is not atomic; recovery goes
    through the stage's commit marker.  (a) A COMMITTED stage (crash
    after the stage commit tore the live dir) is replayed verbatim —
    the re-run must restore the stage's snapshot, never re-derive
    from the torn live dir.  (b) An UNCOMMITTED stage (crash before
    the stage commit; live dir intact) is rebuilt from the live dir.
    Either way a plain re-run converges."""
    import os
    import shutil

    from alstom_spark_cassandra_spark.sources.sinks import (
        compact_partitioned_parquet,
    )

    live = str(tmp_path / "idx")
    spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "v long, p int"
    ).write.partitionBy("p").parquet(live)
    truth = sorted(
        tuple(r) for r in spark.read.parquet(live).collect()
    )

    # (a) committed stage holding the true snapshot; live dir torn
    stage = live + "_compact_stage"
    spark.read.parquet(live).repartition(4, "p").write.partitionBy(
        "p"
    ).parquet(stage)
    assert os.path.exists(f"{stage}/_SUCCESS")
    shutil.rmtree(f"{live}/p=3")  # the torn overwrite
    compact_partitioned_parquet(spark, live, "p")
    assert (
        sorted(tuple(r) for r in spark.read.parquet(live).collect())
        == truth
    )
    assert not os.path.exists(stage)

    # (b) uncommitted stage: must be ignored and rebuilt from live
    os.makedirs(stage)
    spark.createDataFrame([(999, 9)], "v long, p int").write.mode(
        "append"
    ).partitionBy("p").parquet(stage)
    os.remove(f"{stage}/_SUCCESS")  # simulate no commit
    compact_partitioned_parquet(spark, live, "p")
    got = sorted(tuple(r) for r in spark.read.parquet(live).collect())
    assert got == truth  # the phantom 999 row never leaked in


def test_compact_partitioned_parquet_preserves_string_partitions(
    spark, tmp_path
):
    """Partition values live only in DIRECTORY NAMES, and Spark's
    partition-type inference would retype a string value that parses
    as a number ('01' -> 1) and renormalize the directory on rewrite
    — a layout change in an op whose contract is 'physical rewrite
    only'. The compaction reads with inference off, so string
    partition values round-trip verbatim (and the caller's inference
    conf is restored afterwards)."""
    import os

    from alstom_spark_cassandra_spark.sources.sinks import (
        compact_partitioned_parquet,
    )

    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [("01", 1), ("01", 2), ("7", 3)], "bucket string, v long"
    )
    df.write.partitionBy("bucket").parquet(path)
    # a second generation in one partition, as an append would leave
    spark.createDataFrame([("01", 4)], "bucket string, v long").write.mode(
        "append"
    ).partitionBy("bucket").parquet(path)
    infer_key = (
        "spark.sql.sources.partitionColumnTypeInference.enabled"
    )
    before = spark.conf.get(infer_key)
    compact_partitioned_parquet(spark, path, "bucket")
    assert spark.conf.get(infer_key) == before
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("bucket=")
    )
    assert dirs == ["bucket=01", "bucket=7"], dirs
    # content unchanged (read back pinning the original schema, the
    # index-family reader pattern)
    got = sorted(
        (r.bucket, r.v)
        for r in spark.read.schema("v long, bucket string")
        .parquet(path)
        .collect()
    )
    assert got == [("01", 1), ("01", 2), ("01", 4), ("7", 3)]
    # and exactly one file per partition value
    for d in dirs:
        files = [
            f
            for f in os.listdir(f"{path}/{d}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
