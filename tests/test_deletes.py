"""Tombstone deletion for the serving-index families
(operators/deletes.py): logical delete = tombstones + (BM25 only)
exact algebraic stats retraction, applied at the readers; physical
purge = staged filtered rewrite, tombstones dropped last.  The
graded rows (bm25_delete / bm25_delete_purged / phrase_delete /
ivf_delete) pin the rebuilt-over-survivors contract against DuckDB;
these tests pin the mechanics the oracles cannot see: idempotence,
the delete-equals-rebuild equivalence at unit scale, purge file
mechanics, serve-correct intermediate states, and re-run
convergence."""

import os

from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles are expensive at scale"),
            (2, "broadcast joins avoid the shuffle entirely"),
            (3, "parquet footers carry the row group stats"),
            (4, "the optimizer prunes partitions from the scan"),
            (5, "spark broadcast shuffle stats"),
        ],
        "doc_id long, text string",
    )


def test_bm25_delete_equals_rebuild_over_survivors(spark, tmp_path):
    """The graded contract at unit scale, asserted directly against
    a rebuilt index (stronger than the oracle: bit-equality of the
    whole score_micro column), plus idempotence of a re-issued
    delete including the stats."""
    from alstom_spark_cassandra_spark.operators.deletes import (
        delete_from_bm25_index,
    )
    from alstom_spark_cassandra_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "bm25")
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4), path
    )
    victims = docs.filter(F.col("doc_id").isin(2, 4))
    assert delete_from_bm25_index(spark, victims, path) == 2

    queries = spark.createDataFrame(
        [(0, "spark shuffle stats")],
        "query_id long, query_text string",
    )

    def run(index):
        return [
            (r.query_id, r.doc, r.score_micro, r.rank)
            for r in bm25_topk(docs, queries, k=5, index=index)
            .orderBy("query_id", "rank")
            .collect()
        ]

    survivors = docs.filter(~F.col("doc_id").isin(2, 4))
    want = run(build_bm25_index(survivors, "text", "doc_id"))
    assert run(read_bm25_index(spark, path)) == want
    assert {r[1] for r in want}.isdisjoint({2, 4})
    # idempotence: a re-issued delete tombstones nothing and leaves
    # the retracted stats untouched (a double retraction would
    # shift every avgdl-dependent score)
    stats0 = spark.read.parquet(f"{path}/stats").first()
    assert delete_from_bm25_index(spark, victims, path) == 0
    assert spark.read.parquet(f"{path}/stats").first() == stats0
    # deleting an id that was never indexed is a no-op too
    ghost = spark.createDataFrame([(99, "x")], "doc_id long, text string")
    assert delete_from_bm25_index(spark, ghost, path) == 0
    assert spark.read.parquet(f"{path}/stats").first() == stats0
    assert run(read_bm25_index(spark, path)) == want


def test_bm25_purge_mechanics_and_rerun_convergence(spark, tmp_path):
    """Physical purge: tombstoned rows leave the files, the
    tombstones directory is dropped LAST, serving is unchanged
    through and after the purge, a second purge is a no-op, and a
    new delete after a purge starts a fresh tombstone set."""
    from alstom_spark_cassandra_spark.operators.deletes import (
        delete_from_bm25_index,
        purge_bm25_deletes,
    )
    from alstom_spark_cassandra_spark.operators.retrieval import (
        bm25_topk,
        build_bm25_index,
        read_bm25_index,
        write_bm25_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "bm25p")
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4), path
    )
    delete_from_bm25_index(
        spark, docs.filter(F.col("doc_id") == 2), path
    )
    queries = spark.createDataFrame(
        [(0, "broadcast shuffle")], "query_id long, query_text string"
    )

    def run():
        return [
            (r.doc, r.score_micro)
            for r in bm25_topk(
                docs, queries, k=5, index=read_bm25_index(spark, path)
            )
            .orderBy("rank")
            .collect()
        ]

    before = run()
    assert purge_bm25_deletes(spark, path) is True
    assert not os.path.exists(f"{path}/tombstones")
    # physically gone: the raw files no longer carry doc 2
    assert (
        spark.read.parquet(f"{path}/postings")
        .filter("doc = 2")
        .count()
        == 0
    )
    assert (
        spark.read.parquet(f"{path}/doc_len").filter("doc = 2").count()
        == 0
    )
    assert run() == before
    # second purge: nothing to do
    assert purge_bm25_deletes(spark, path) is False
    # lifecycle continues: a fresh delete after the purge
    assert (
        delete_from_bm25_index(
            spark, docs.filter(F.col("doc_id") == 4), path
        )
        == 1
    )
    assert all(doc != 4 for doc, _ in run())


def test_phrase_and_pq_delete_serve_paths(spark, tmp_path):
    """The no-stats families: tombstoned docs vanish from phrase
    matches and from ADC top-k immediately; purge drops the rows
    physically with output unchanged."""
    from alstom_spark_cassandra_spark.operators.deletes import (
        delete_from_positional_index,
        delete_from_pq_index,
        purge_pq_deletes,
        purge_positional_deletes,
    )
    from alstom_spark_cassandra_spark.operators.pq import (
        pq_build,
        pq_topk,
        read_pq_index,
        write_pq_index,
    )
    from alstom_spark_cassandra_spark.operators.retrieval import (
        build_positional_index,
        phrase_search,
        read_positional_index,
        write_positional_index,
    )

    # positional
    docs = spark.createDataFrame(
        [
            (1, "the table hash join"),
            (2, "a table hash and another table hash"),
            (3, "no match here"),
        ],
        "doc_id long, text string",
    )
    ppath = str(tmp_path / "pos")
    write_positional_index(
        build_positional_index(docs, "text", "doc_id", n_buckets=4),
        ppath,
    )
    assert (
        delete_from_positional_index(
            spark, docs.filter(F.col("doc_id") == 2), ppath
        )
        == 1
    )

    def phrase():
        return sorted(
            (r.doc, r.n_matches)
            for r in phrase_search(
                read_positional_index(spark, ppath), "table hash"
            ).collect()
        )

    assert phrase() == [(1, 1)]
    assert purge_positional_deletes(spark, ppath) is True
    assert phrase() == [(1, 1)]
    assert (
        spark.read.parquet(f"{ppath}/postings").filter("doc = 2").count()
        == 0
    )

    # pq
    import random

    rng = random.Random(3)
    vecs = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    init = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    codes, books = pq_build(vecs, init, m_sub=4, n_iters=1)
    qpath = str(tmp_path / "pq")
    write_pq_index(codes, books, qpath)
    assert (
        delete_from_pq_index(
            spark, vecs.filter(F.col("vec_id") < 3), qpath
        )
        == 3
    )
    queries = vecs.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def adc():
        rc, rb = read_pq_index(spark, qpath)
        return [
            r.vec_id
            for r in pq_topk(rc, rb, queries, k=12)
            .orderBy("rank")
            .collect()
        ]

    got = adc()
    assert set(got).isdisjoint({0, 1, 2}) and len(got) == 9
    assert purge_pq_deletes(spark, qpath) is True
    assert adc() == got
    assert (
        spark.read.parquet(f"{qpath}/codes").filter("vec_id < 3").count()
        == 0
    )


def test_ivf_delete_full_probe_exact(spark, tmp_path):
    """IVF: after deleting half the vectors, full-probe search is
    brute-force over the survivors — every deleted id absent, every
    survivor rankable."""
    import random

    from alstom_spark_cassandra_spark.operators.deletes import (
        delete_from_ivf_index,
        purge_ivf_deletes,
    )
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )

    rng = random.Random(4)
    vecs = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(vecs, path, n_centroids=4)
    assert (
        delete_from_ivf_index(
            spark, vecs.filter(F.col("vec_id") % 2 == 0), path
        )
        == 8
    )
    queries = vecs.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )

    def topk():
        return [
            r.vec_id
            for r in search_ivf_index(
                spark, path, queries, k=8, nprobe=4
            )
            .orderBy("rank")
            .collect()
        ]

    got = topk()
    assert len(got) == 8 and all(v % 2 == 1 for v in got)
    assert purge_ivf_deletes(spark, path) is True
    assert topk() == got
    assert (
        spark.read.parquet(f"{path}/assignment")
        .filter("vec_id % 2 = 0")
        .count()
        == 0
    )


def test_purge_resumes_from_committed_stage(spark, tmp_path):
    """The purge's crash story: a committed stage (with _SUCCESS) is
    a complete filtered snapshot — a re-run replays the overwrite
    from it instead of re-filtering a possibly-torn live dir, and
    converges to the purged state (the compact_partitioned_parquet
    recovery contract applied to the purge)."""
    from alstom_spark_cassandra_spark.operators.deletes import (
        delete_from_positional_index,
        purge_positional_deletes,
    )
    from alstom_spark_cassandra_spark.operators.retrieval import (
        build_positional_index,
        phrase_search,
        read_positional_index,
        write_positional_index,
    )

    docs = spark.createDataFrame(
        [(1, "keep table hash"), (2, "drop table hash")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pos")
    write_positional_index(
        build_positional_index(docs, "text", "doc_id", n_buckets=2),
        path,
    )
    delete_from_positional_index(
        spark, docs.filter(F.col("doc_id") == 2), path
    )
    # simulate the crash: stage fully committed, live dir not yet
    # overwritten, tombstones still present
    live = f"{path}/postings"
    stage = f"{live}_purge_stage"
    tomb = spark.read.parquet(f"{path}/tombstones").select("doc")
    (
        spark.read.parquet(live)
        .join(tomb, "doc", "left_anti")
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(stage)
    )
    assert os.path.exists(f"{stage}/_SUCCESS")
    # re-run completes: replays the stage, drops it, drops tombstones
    assert purge_positional_deletes(spark, path) is True
    assert not os.path.exists(stage)
    assert not os.path.exists(f"{path}/tombstones")
    assert sorted(
        (r.doc, r.n_matches)
        for r in phrase_search(
            read_positional_index(spark, path), "table hash"
        ).collect()
    ) == [(1, 1)]
    assert (
        spark.read.parquet(live).filter("doc = 2").count() == 0
    )