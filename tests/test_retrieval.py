"""BM25 inverted-index retrieval (operators/retrieval.py)."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.retrieval import (
    bm25_topk,
    build_bm25_index,
)


def _corpus(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple banana"),
        (2, "zebra quagga okapi"),
        (3, "banana banana banana banana"),
        (4, "the the the the the the"),
        (5, ""),
        (6, "   "),
        (7, "cherry zebra"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_self_retrieval_ranks_self_first(spark):
    docs = _corpus(spark)
    queries = _queries(spark, [(100, "zebra quagga okapi")])
    out = bm25_topk(docs, queries, k=3).collect()
    assert out[0]["rank"] == 1 and out[0]["doc"] == 2
    # doc 7 shares only 'zebra' -> present but ranked below
    assert {r["doc"] for r in out} == {2, 7}


def test_rare_term_outscores_common_term(spark):
    docs = _corpus(spark)
    # 'quagga' appears in 1 doc, 'banana' in 3 -> for equal tf/length
    # the rational idf must score the rare term higher
    out = {
        (r["query_id"], r["doc"]): r["score_micro"]
        for r in bm25_topk(
            docs, _queries(spark, [(0, "quagga"), (1, "banana")]), k=10
        ).collect()
    }
    assert out[(0, 2)] > max(v for (q, _), v in out.items() if q == 1)


def test_empty_and_whitespace_docs_never_match(spark):
    docs = _corpus(spark)
    out = bm25_topk(docs, _queries(spark, [(0, "apple banana zebra")]), k=20)
    assert {r["doc"] for r in out.collect()}.isdisjoint({5, 6})


def test_persisted_index_path_identical(spark):
    docs = _corpus(spark)
    queries = _queries(spark, [(0, "apple banana"), (1, "cherry")])
    inline = bm25_topk(docs, queries, k=10).collect()
    idx = build_bm25_index(docs, "text", "doc_id")
    idx.postings.cache(), idx.doc_len.cache(), idx.stats.cache()
    reused = bm25_topk(docs, queries, k=10, index=idx).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, reused))


def test_query_term_repeats_do_not_double_count(spark):
    docs = _corpus(spark)
    once = bm25_topk(docs, _queries(spark, [(0, "banana")]), k=10).collect()
    thrice = bm25_topk(
        docs, _queries(spark, [(0, "banana banana banana")]), k=10
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, thrice))


def test_score_partition_invariant(spark):
    docs = _corpus(spark).repartition(7)
    queries = _queries(spark, [(0, "apple banana cherry zebra")])
    a = sorted(map(tuple, bm25_topk(docs, queries, k=10).collect()))
    b = sorted(
        map(tuple, bm25_topk(docs.coalesce(1), queries, k=10).collect())
    )
    assert a == b


def test_bucketed_index_roundtrip_and_pruning(spark, tmp_path):
    from alstom_spark_cassandra_spark.operators.retrieval import (
        read_bm25_index,
        write_bm25_index,
    )

    docs = _corpus(spark)
    queries = _queries(spark, [(0, "apple zebra"), (1, "banana")])
    baseline = sorted(map(tuple, bm25_topk(docs, queries, k=10).collect()))

    idx = build_bm25_index(docs, "text", "doc_id", n_buckets=8)
    path = str(tmp_path / "bm25idx")
    write_bm25_index(idx, path)
    disk = read_bm25_index(spark, path)

    out = bm25_topk(docs, queries, k=10, index=disk)
    got = sorted(map(tuple, out.collect()))
    assert got == baseline

    # the query terms' buckets must reach the postings scan as
    # partition filters (directory pruning on a disk-resident index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]


def test_plan_broadcasts_query_side_no_cartesian(spark):
    docs = _corpus(spark)
    queries = _queries(spark, [(0, "apple zebra")])
    df = bm25_topk(docs, queries, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the only nested-loop is the 1-row corpus-scalar broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------

from alstom_spark_cassandra_spark.operators.retrieval import rrf_fuse  # noqa: E402


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc long, rank int")


def test_rrf_doc_in_both_lists_wins(spark):
    """Equal single-system ranks: the doc surfaced by BOTH systems
    must outrank a doc surfaced by one."""
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranked(spark, [(1, 10, 2), (1, 12, 1)])
    out = {r.doc: r.rank for r in rrf_fuse([a, b], k=10).collect()}
    assert out[10] == 1          # in both lists
    assert set(out) == {10, 11, 12}


def test_rrf_exact_micro_contributions(spark):
    """Scores are the exact integer sum of floor(1e6/(60+rank)+.5)."""
    a = _ranked(spark, [(1, 10, 1)])
    b = _ranked(spark, [(1, 10, 3)])
    got = rrf_fuse([a, b], k=1).collect()[0]
    expect = int(1e6 / 61 + 0.5) + int(1e6 / 63 + 0.5)
    assert got.rrf_micro == expect


def test_rrf_ties_break_on_doc_id(spark):
    a = _ranked(spark, [(1, 20, 1), (1, 10, 1)])  # same contribution
    out = [r.doc for r in rrf_fuse([a], k=2).orderBy("rank").collect()]
    assert out == [10, 20]


# ---------------------------------------------------------------------------
# MMR diversity rerank
# ---------------------------------------------------------------------------

from alstom_spark_cassandra_spark.operators.retrieval import mmr_rerank  # noqa: E402


def test_mmr_penalizes_near_duplicates(spark):
    """Second-ranked near-copy of the top hit must drop below a less
    relevant but diverse candidate."""
    cands = spark.createDataFrame(
        [(1, 10, 900000), (1, 11, 890000), (1, 12, 500000)],
        "query_id long, doc long, rel_micro long",
    )
    sims = spark.createDataFrame(
        [(1, 10, 11, 990000), (1, 11, 10, 990000),
         (1, 10, 12, 100000), (1, 12, 10, 100000),
         (1, 11, 12, 120000), (1, 12, 11, 120000)],
        "query_id long, a long, b long, sim_micro long",
    )
    got = [
        r.doc for r in mmr_rerank(cands, sims, k=3).orderBy("step").collect()
    ]
    assert got == [10, 12, 11]


def test_mmr_no_sims_falls_back_to_relevance_order(spark):
    cands = spark.createDataFrame(
        [(1, d, 1000 - d) for d in range(4)],
        "query_id long, doc long, rel_micro long",
    )
    sims = spark.createDataFrame(
        [], "query_id long, a long, b long, sim_micro long"
    )
    got = [
        r.doc for r in mmr_rerank(cands, sims, k=4).orderBy("step").collect()
    ]
    assert got == [0, 1, 2, 3]


def test_mmr_no_cache_leftovers_and_large_k_lineage(spark):
    """Cache hygiene of BOTH impls (r5 VERDICT item 4). The loop
    impl must release its persisted inputs before returning, the
    returned frame must survive that release (checkpoint, not
    lineage), and k > checkpoint interval must run (the periodic
    localCheckpoint bounds the union/anti-join chain). The default
    HOF impl must register NOTHING — the whole greedy chain is one
    expression, no persisted state at all."""
    from alstom_spark_cassandra_spark.operators import (
        free_local_checkpoints,
    )

    free_local_checkpoints(spark)
    n = 12  # > the 5-step checkpoint interval, forces 2 mid-loop cuts
    cands = spark.createDataFrame(
        [(1, d, 1000 - d) for d in range(n)],
        "query_id long, doc long, rel_micro long",
    )
    sims = spark.createDataFrame(
        [], "query_id long, a long, b long, sim_micro long"
    )
    jsc = spark.sparkContext._jsc.sc()

    out = mmr_rerank(cands, sims, k=n, impl="loop")
    # inputs released AND mid-loop checkpoints released once the
    # final one materialized: ONLY the returned frame stays
    assert jsc.getPersistentRDDs().size() == 1
    got = [r.doc for r in out.orderBy("step").collect()]
    assert got == list(range(n))  # usable after release, full k steps
    free_local_checkpoints(spark)
    assert jsc.getPersistentRDDs().size() == 0

    out_hof = mmr_rerank(cands, sims, k=n)
    assert jsc.getPersistentRDDs().size() == 0  # nothing registered
    got_hof = [r.doc for r in out_hof.orderBy("step").collect()]
    assert got_hof == list(range(n))


def test_mmr_hof_equals_loop_impl(spark):
    """Differential contract: the one-expression HOF greedy and the
    k-step DataFrame loop are the SAME algorithm — equal output on
    an adversarial mix (missing sim rows, asymmetric relevance ties
    broken by doc id, k exceeding one query's candidate count)."""
    cands = spark.createDataFrame(
        [(1, 10, 900), (1, 11, 900), (1, 12, 880), (1, 13, 700),
         (2, 20, 500), (2, 21, 400)],
        "query_id long, doc long, rel_micro long",
    )
    sims = spark.createDataFrame(
        [(1, 10, 11, 950), (1, 11, 10, 950), (1, 10, 12, 100),
         (1, 12, 10, 100), (1, 11, 12, 990), (1, 12, 11, 990)],
        "query_id long, a long, b long, sim_micro long",
    )
    hof = sorted(
        map(tuple, mmr_rerank(cands, sims, k=3, impl="hof").collect())
    )
    loop = sorted(
        map(tuple, mmr_rerank(cands, sims, k=3, impl="loop").collect())
    )
    assert hof == loop
    assert len(hof) == 5  # query 2 exhausts at 2 of k=3


def test_mmr_selects_per_query_independently(spark):
    cands = spark.createDataFrame(
        [(1, 10, 500), (1, 11, 400), (2, 20, 300), (2, 21, 200)],
        "query_id long, doc long, rel_micro long",
    )
    sims = spark.createDataFrame(
        [], "query_id long, a long, b long, sim_micro long"
    )
    got = {
        (r.query_id, r.step): r.doc
        for r in mmr_rerank(cands, sims, k=2).collect()
    }
    assert got == {(1, 1): 10, (1, 2): 11, (2, 1): 20, (2, 2): 21}


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

from alstom_spark_cassandra_spark.operators.retrieval import (  # noqa: E402
    build_positional_postings,
    phrase_search,
)


def test_phrase_counts_and_adjacency(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),     # "big data" twice
            (2, "data big"),                  # reversed: no match
            (3, "big x data"),                # gap: no match
            (4, "BIG DATA"),                  # case-folded: one match
        ],
        "doc_id long, text string",
    )
    p = build_positional_postings(docs)
    got = {r.doc: r.n_matches for r in phrase_search(p, "big data").collect()}
    assert got == {1: 2, 4: 1}


def test_phrase_three_terms_and_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a")], "doc_id long, text string"
    )
    p = build_positional_postings(docs)
    got = {r.doc: r.n_matches for r in phrase_search(p, "a a a").collect()}
    assert got == {1: 2}  # positions 1-3 and 2-4 (overlapping counted)


def test_phrase_single_term_is_term_frequency(spark):
    docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
    p = build_positional_postings(docs)
    got = {r.doc: r.n_matches for r in phrase_search(p, "x").collect()}
    assert got == {1: 2}


def test_positional_index_roundtrip_and_pruning(spark, tmp_path):
    """Persisted bucketed positional index: disk results are
    bit-identical to the inline path, and every phrase term's bucket
    reaches the postings scan as a PartitionFilter (only the phrase
    terms' bucket directories are read — the bm25_persisted layout
    proven for the phrase index, r5 VERDICT item 2)."""
    import pytest

    from alstom_spark_cassandra_spark.operators.retrieval import (
        PositionalIndex,
        build_positional_index,
        read_positional_index,
        write_positional_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),
            (2, "data big"),
            (3, "big x data"),
            (4, "BIG DATA"),
        ],
        "doc_id long, text string",
    )
    inline = {
        r.doc: r.n_matches
        for r in phrase_search(
            build_positional_postings(docs), "big data"
        ).collect()
    }

    # the constructor rejects the inconsistency it can detect:
    # unbucketed postings with a claimed bucket count (and vice versa)
    with pytest.raises(ValueError, match="build_positional_index"):
        PositionalIndex(build_positional_postings(docs), n_buckets=8)
    with pytest.raises(ValueError, match="build_positional_index"):
        PositionalIndex(
            build_positional_postings(docs, n_buckets=8), n_buckets=0
        )

    path = str(tmp_path / "posidx")
    write_positional_index(build_positional_index(docs, n_buckets=8), path)
    idx = read_positional_index(spark, path)
    assert idx.n_buckets == 8
    out = phrase_search(idx, "big data")
    got = {r.doc: r.n_matches for r in out.collect()}
    assert got == inline == {1: 2, 4: 1}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]


def test_bm25_append_equals_rebuild(spark, tmp_path):
    """The exact-merge contract, pinned at the INDEX level (stronger
    than search equality): after appending a batch, postings,
    doc_len and the merged one-row stats are content-identical to an
    index rebuilt over the union — BM25's global statistics are
    plain sums, so ingest has no staleness window at all."""
    from alstom_spark_cassandra_spark.operators.retrieval import (
        append_bm25_index,
        build_bm25_index,
        write_bm25_index,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    p_app = str(tmp_path / "bm25_app")
    write_bm25_index(
        build_bm25_index(
            docs.filter(F.col("doc_id") % 3 != 0),
            "text",
            "doc_id",
            n_buckets=8,
        ),
        p_app,
    )
    append_bm25_index(spark, docs.filter(F.col("doc_id") % 3 == 0), p_app)
    p_full = str(tmp_path / "bm25_full")
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=8), p_full
    )
    for table in ("postings", "doc_len", "stats"):
        a = {
            tuple(r)
            for r in spark.read.parquet(f"{p_app}/{table}")
            .select(*sorted(spark.read.parquet(f"{p_app}/{table}").columns))
            .collect()
        }
        b = {
            tuple(r)
            for r in spark.read.parquet(f"{p_full}/{table}")
            .select(*sorted(spark.read.parquet(f"{p_full}/{table}").columns))
            .collect()
        }
        assert a == b, table
        assert len(a) > 0, table


def test_positional_append_equals_rebuild(spark, tmp_path):
    """No global stats, so the phrase-index append is trivially
    exact: appended postings == rebuild over the union, and a phrase
    spanning both generations matches."""
    from alstom_spark_cassandra_spark.operators.retrieval import (
        append_positional_index,
        build_positional_index,
        phrase_search,
        read_positional_index,
        write_positional_index,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    p_app = str(tmp_path / "pos_app")
    write_positional_index(
        build_positional_index(
            docs.filter(F.col("doc_id") % 3 != 0), "text", "doc_id",
            n_buckets=8,
        ),
        p_app,
    )
    append_positional_index(
        spark, docs.filter(F.col("doc_id") % 3 == 0), p_app
    )
    p_full = str(tmp_path / "pos_full")
    write_positional_index(
        build_positional_index(docs, "text", "doc_id", n_buckets=8),
        p_full,
    )
    a = {
        tuple(r)
        for r in spark.read.parquet(f"{p_app}/postings")
        .select("doc", "pos", "term", "bucket")
        .collect()
    }
    b = {
        tuple(r)
        for r in spark.read.parquet(f"{p_full}/postings")
        .select("doc", "pos", "term", "bucket")
        .collect()
    }
    assert a == b and len(a) > 0
    # a real phrase query over the appended index: take the first two
    # tokens of an APPENDED doc and expect that doc among the matches
    first_doc = docs.filter(F.col("doc_id") % 3 == 0).orderBy("doc_id").first()
    phrase = " ".join(first_doc["text"].lower().split()[:2])
    idx = read_positional_index(spark, p_app)
    hits = {r["doc"] for r in phrase_search(idx, phrase).collect()}
    assert first_doc["doc_id"] in hits


def test_bm25_append_empty_batch_is_a_noop(spark, tmp_path):
    """An appended batch with no postings (empty, or all-empty
    texts) must short-circuit BEFORE any write: the stats sum over
    zero rows is NULL, and the old behavior crashed on int(None)
    AFTER the postings/doc_len appends had committed — so a retry
    double-appended.  Now: no crash, no write, index bit-identical."""
    from alstom_spark_cassandra_spark.operators.retrieval import (
        append_bm25_index,
        build_bm25_index,
        write_bm25_index,
    )

    docs = _corpus(spark)
    path = str(tmp_path / "bm25_empty")
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4), path
    )
    before = {
        t: {tuple(r) for r in spark.read.parquet(f"{path}/{t}").collect()}
        for t in ("postings", "doc_len", "stats")
    }
    # all-empty texts → zero postings; twice, to pin retry safety
    empty = spark.createDataFrame(
        [(100, ""), (101, "   ")], "doc_id long, text string"
    )
    append_bm25_index(spark, empty, path)
    append_bm25_index(spark, empty.limit(0), path)
    after = {
        t: {tuple(r) for r in spark.read.parquet(f"{path}/{t}").collect()}
        for t in ("postings", "doc_len", "stats")
    }
    assert after == before


def test_bm25_append_crash_recovery_is_the_idempotent_rebuild(
    spark, tmp_path
):
    """append_bm25_index's three writes are sequential, not atomic
    (postings, doc_len, then stats — documented in the docstring).
    This pins the RECOVERY story instead of just documenting it: a
    crash between the data appends and the stats write leaves new
    docs underweighted (stale n_docs/avgdl), and re-running the
    idempotent BUILD over the full corpus restores the index to the
    clean rebuilt state exactly — every table, bit for bit."""
    from alstom_spark_cassandra_spark.operators.retrieval import (
        build_bm25_index,
        build_postings,
        write_bm25_index,
    )

    docs = _corpus(spark)
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "bm25_crash")
    write_bm25_index(
        build_bm25_index(base, "text", "doc_id", n_buckets=4), path
    )
    # simulate the mid-append crash: postings and doc_len land,
    # stats never updates (the exact window the docstring owns)
    p = build_postings(batch, "text", "doc_id").withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(4)).cast("int")
    )
    p.write.mode("append").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    p.groupBy("doc").agg(F.sum("tf").alias("dl")).write.mode(
        "append"
    ).parquet(f"{path}/doc_len")
    stale = spark.read.parquet(f"{path}/stats").first()
    assert int(stale["n_docs"]) == base.filter(
        F.trim("text") != ""
    ).count()  # the crash left stats stale

    # recovery: the build is idempotent — re-run it over the corpus
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4), path
    )
    clean = str(tmp_path / "bm25_clean")
    write_bm25_index(
        build_bm25_index(docs, "text", "doc_id", n_buckets=4), clean
    )
    for table in ("postings", "doc_len", "stats"):
        a = {
            tuple(r)
            for r in spark.read.parquet(f"{path}/{table}").collect()
        }
        b = {
            tuple(r)
            for r in spark.read.parquet(f"{clean}/{table}").collect()
        }
        assert a == b, table
