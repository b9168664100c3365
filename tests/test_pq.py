"""Product-quantization ANN (operators/pq.py)."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.pq import pq_build, pq_topk


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _init_from(df, n):
    return df.filter(F.col("vec_id") < n).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )


def test_degenerate_pq_equals_exact_l2(spark):
    """m_sub=1, every vector its own seed, zero iterations → codes
    are identity and ADC distance IS the exact quantized squared-L2,
    so PQ top-k must equal brute force."""
    import itertools

    rows = [
        (i, [float(x) / 7.0 for x in v])
        for i, v in enumerate(
            itertools.islice(itertools.product(range(4), repeat=4), 8)
        )
    ]
    df = _vecs(spark, rows)
    codes, books = pq_build(df, _init_from(df, 8), m_sub=1, n_iters=0)
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = [
        (r["vec_id"], r["adist"])
        for r in pq_topk(codes, books, queries, k=8)
        .orderBy("rank")
        .collect()
    ]
    q = rows[0][1]

    def qd(v):
        qq = [round(x * 1e6) for x in v]
        qv = [round(x * 1e6) for x in q]
        return sum((a - b) ** 2 for a, b in zip(qq, qv))

    want = sorted(((i, qd(v)) for i, v in rows), key=lambda t: (t[1], t[0]))
    assert got == want


def test_codes_shape_and_range(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(20)]
    df = _vecs(spark, rows)
    codes, books = pq_build(df, _init_from(df, 4), m_sub=2, n_iters=1)
    c = codes.collect()
    assert len(c) == 20 * 2  # m_sub rows per vector
    assert {r["sub"] for r in c} == {0, 1}
    assert all(0 <= r["code"] < 4 for r in c)
    # codebooks: m_sub x k x (dim/m_sub) long-format rows
    assert books.count() == 2 * 4 * 4


def test_partition_invariant(spark):
    rows = [
        (i, [float((i * 13 + j * 3) % 11) / 11.0 for j in range(8)])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    queries_rows = [(0, rows[5][1]), (1, rows[17][1])]
    queries = spark.createDataFrame(
        queries_rows, "query_id long, query_vec array<double>"
    )

    def run(d):
        codes, books = pq_build(d, _init_from(d, 4), m_sub=4, n_iters=2)
        return sorted(
            map(tuple, pq_topk(codes, books, queries, k=5).collect())
        )

    assert run(df.repartition(7)) == run(df.coalesce(1))


def test_adc_table_is_broadcast_no_cartesian(spark):
    rows = [(i, [float((i + j) % 3) for j in range(8)]) for i in range(12)]
    df = _vecs(spark, rows)
    codes, books = pq_build(df, _init_from(df, 3), m_sub=2, n_iters=1)
    queries = df.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = (
        pq_topk(codes, books, queries, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_rerank_with_full_shortlist_equals_brute_force(spark):
    """shortlist >= corpus: the ADC stage prunes nothing, so the
    refine stage IS brute force — pq_rerank_topk must equal
    cosine_topk row-for-row (the degenerate end of the accuracy
    knob, like the IVF nprobe=k contract)."""
    from alstom_spark_cassandra_spark.operators.pq import pq_rerank_topk
    from alstom_spark_cassandra_spark.operators.similarity import (
        cosine_topk,
    )

    rows = [
        (i, [float((i * 13 + j * 3) % 11) / 11.0 for j in range(8)])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    queries = spark.createDataFrame(
        [(0, rows[5][1]), (1, rows[17][1])],
        "query_id long, query_vec array<double>",
    )
    codes, books = pq_build(df, _init_from(df, 4), m_sub=4, n_iters=2)
    got = sorted(
        map(
            tuple,
            pq_rerank_topk(
                codes, books, queries, df, k=5, shortlist=100
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            cosine_topk(df, queries, k=5)
            .select("query_id", "vec_id", "cosine", "rank")
            .collect(),
        )
    )
    assert got == want


def test_rerank_candidates_come_from_adc_shortlist(spark):
    """with a tight shortlist every refined row's id must appear in
    the ADC shortlist for that query, ranks are 1..k dense per query,
    and cosine is non-increasing with rank."""
    from alstom_spark_cassandra_spark.operators.pq import pq_rerank_topk

    rows = [
        (i, [float((i * 7 + j * 5) % 13) / 13.0 for j in range(8)])
        for i in range(40)
    ]
    df = _vecs(spark, rows)
    queries = spark.createDataFrame(
        [(0, rows[3][1])], "query_id long, query_vec array<double>"
    )
    codes, books = pq_build(df, _init_from(df, 4), m_sub=2, n_iters=1)
    short_ids = {
        r["vec_id"]
        for r in pq_topk(codes, books, queries, k=8).collect()
    }
    out = pq_rerank_topk(
        codes, books, queries, df, k=5, shortlist=8
    ).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5
    ]
    assert all(r["vec_id"] in short_ids for r in out)
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert all(
        by_rank[i]["cosine"] >= by_rank[i + 1]["cosine"]
        for i in range(len(by_rank) - 1)
    )


def test_rerank_plan_broadcasts_shortlist_no_cartesian(spark):
    """the raw-vector table is touched through a broadcast equi-join
    against the bounded shortlist — never a cartesian."""
    from alstom_spark_cassandra_spark.operators.pq import pq_rerank_topk

    rows = [(i, [float((i + j) % 3) for j in range(8)]) for i in range(12)]
    df = _vecs(spark, rows)
    codes, books = pq_build(df, _init_from(df, 3), m_sub=2, n_iters=1)
    queries = df.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    plan = (
        pq_rerank_topk(codes, books, queries, df, k=3, shortlist=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_recall_eval_refine_dominates_adc(spark):
    """The pq_recall_eval invariants: hits are bounded by k=10,
    recall micro-units are hits * 100000 exactly, and REFINE recall
    >= ADC recall per query — a truth member inside the shortlist
    always survives an exact-cosine rerank (global top-10 members
    beat every non-member under (cos DESC, id ASC), within any
    candidate subset), while pure ADC can rank it below quantization
    noise. Also pins that the harness measures something real here:
    the 4x8 codebook at dim 64 is coarse, so ADC alone must NOT be
    perfect while refine must strictly improve at least one query at
    this testdata scale."""
    from alstom_spark_cassandra_spark.workloads import q_pq_recall_eval

    rows = q_pq_recall_eval(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    assert any(r.n_hits_rerank > r.n_hits_adc for r in rows)
    assert any(r.n_hits_adc < 10 for r in rows)
    for r in rows:
        assert 0 <= r.n_hits_adc <= 10
        assert r.n_hits_adc <= r.n_hits_rerank <= 10
        assert r.recall_adc_micro == r.n_hits_adc * 100000
        assert r.recall_rerank_micro == r.n_hits_rerank * 100000
        assert r.n_corpus == 500


def test_pq_persisted_roundtrip_and_append(spark, tmp_path):
    """The compressed-domain steady state: (a) a persisted PQ index
    searched after a disk round-trip reproduces the inline ADC
    ranking bit-for-bit, and (b) appending a batch encoded against
    the FROZEN persisted books leaves the codes table
    content-identical to encoding the union against the same books —
    every persisted index in the engine appends instead of
    rebuilding."""
    from alstom_spark_cassandra_spark.operators.pq import (
        _pq_assign,
        append_pq_index,
        pq_build,
        pq_topk,
        read_pq_index,
        write_pq_index,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    init = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    base = emb.filter(F.col("vec_id") % 3 != 0)
    codes, books = pq_build(base, init, m_sub=4, n_iters=2)
    path = str(tmp_path / "pq_idx")
    write_pq_index(codes, books, path)

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    inline = {
        (r.query_id, r.vec_id, r.adist, r.rank)
        for r in pq_topk(codes, books, queries, k=10).collect()
    }
    rc, rb = read_pq_index(spark, path)
    stored = {
        (r.query_id, r.vec_id, r.adist, r.rank)
        for r in pq_topk(rc, rb, queries, k=10).collect()
    }
    assert stored == inline and len(stored) == 30

    append_pq_index(spark, emb.filter(F.col("vec_id") % 3 == 0), path)
    appended = {
        (r.vec_id, r.sub, r.code)
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    # reference: encode the WHOLE corpus against the persisted books
    book_rows = rb.orderBy("sub", "cid", "pos").collect()
    cents = []
    for r in book_rows:
        while len(cents) <= int(r["sub"]):
            cents.append({})
        cents[int(r["sub"])].setdefault(int(r["cid"]), []).append(
            int(r["qc"])
        )
    expected = {
        (r.vec_id, r.sub, r.cid)
        for r in _pq_assign(emb, cents, "embedding", "vec_id", 6)
        .collect()
    }
    assert appended == expected and len(appended) == emb.count() * 4


def test_pq_append_reads_scale_from_index_meta(spark, tmp_path):
    """The quantization grid is an index property, not a caller
    argument: an index written with a non-default scale must be
    appended on that SAME grid even when the caller passes nothing —
    otherwise every appended vector gets nearest-code assignments
    computed on a different integer lattice, silently."""
    from alstom_spark_cassandra_spark.operators.pq import (
        _pq_assign,
        append_pq_index,
        pq_build,
        write_pq_index,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    init = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    base = emb.filter(F.col("vec_id") % 3 != 0)
    codes, books = pq_build(base, init, m_sub=4, n_iters=1, scale=4)
    path = str(tmp_path / "pq_scaled")
    write_pq_index(codes, books, path, scale=4)
    meta = spark.read.parquet(f"{path}/meta").first()
    assert (meta["scale"], meta["m_sub"]) == (4, 4)

    # append with NO scale argument: must encode on the index's grid
    append_pq_index(spark, emb.filter(F.col("vec_id") % 3 == 0), path)
    appended = {
        (r.vec_id, r.sub, r.code)
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    book_rows = (
        spark.read.parquet(f"{path}/codebooks")
        .orderBy("sub", "cid", "pos")
        .collect()
    )
    cents = []
    for r in book_rows:
        while len(cents) <= int(r["sub"]):
            cents.append({})
        cents[int(r["sub"])].setdefault(int(r["cid"]), []).append(
            int(r["qc"])
        )
    expected = {
        (r.vec_id, r.sub, r.cid)
        for r in _pq_assign(emb, cents, "embedding", "vec_id", 4)
        .collect()
    }
    assert appended == expected
