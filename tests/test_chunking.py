"""Chunking coverage/overlap invariants + repetition scoring."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.chunking import (
    chunk_documents,
    repetition_scores,
)


@pytest.fixture(scope="module")
def docs(spark):
    long_text = " ".join(f"w{i}" for i in range(1000))
    return spark.createDataFrame(
        [
            (1, long_text),
            (2, "tiny doc"),
            (3, " ".join(f"t{i}" for i in range(512))),  # exactly one chunk
            (4, " ".join(f"u{i}" for i in range(513))),  # just past: two
        ],
        "doc_id long, text string",
    )


def test_chunk_coverage_and_overlap(spark, docs):
    out = chunk_documents(docs, chunk_tokens=512, overlap=64)
    rows = sorted(
        [r for r in out.collect() if r.doc_id == 1],
        key=lambda r: r.chunk_id,
    )
    # 1000 tokens, step 448 -> ceil(936/448) = 3 chunks
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in rows] == [512, 512, 104]
    # consecutive chunks share exactly `overlap` tokens
    c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert c0[-64:] == c1[:64]
    # every token covered, in order
    merged = c0 + c1[64:] + rows[2].chunk_text.split()[64:]
    assert merged == [f"w{i}" for i in range(1000)]


def test_chunk_short_and_exact_docs(spark, docs):
    out = chunk_documents(docs, chunk_tokens=512, overlap=64)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 512
    assert len(by_doc[4]) == 2
    assert sorted(r.n_chunk_tokens for r in by_doc[4]) == [65, 512]


def test_chunk_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=64, overlap=64)


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 trigram positions, 3 distinct
            (2, "x y z w v u"),          # all distinct
            (3, "one two"),              # shorter than n: zero grams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_scores(df, n=3).collect()}
    assert rows[1].n_grams == 7 and rows[1].n_distinct_grams == 3
    assert rows[1].dup_frac == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert rows[2].dup_frac == 0.0 and rows[2].n_grams == 4
    assert rows[3].n_grams == 0 and rows[3].dup_frac == 0.0


def test_chunking_no_shuffle(spark, docs):
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_dedup_flags_later_occurrences(spark):
    from alstom_spark_cassandra_spark.operators.chunking import chunk_dedup

    chunks = spark.createDataFrame(
        [
            (1, 0, "alpha beta"),
            (1, 1, "gamma delta"),
            (2, 0, "alpha beta"),   # dup of (1,0)
            (2, 1, "unique text"),
            (3, 0, "gamma delta"),  # dup of (1,1)
        ],
        "doc_id long, chunk_id long, chunk_text string",
    )
    out = {(r.doc_id, r.chunk_id): r.is_dup for r in chunk_dedup(chunks).collect()}
    assert out == {
        (1, 0): False, (1, 1): False,
        (2, 0): True, (2, 1): False,
        (3, 0): True,
    }
    # text must not survive into the shuffled output
    assert "chunk_text" not in chunk_dedup(chunks).columns


def test_chunk_dedup_skew_safe_path_agrees(spark):
    from alstom_spark_cassandra_spark.operators.chunking import chunk_dedup

    chunks = spark.createDataFrame(
        [(d, c, f"t{(d * 7 + c) % 5}") for d in range(10) for c in range(4)],
        "doc_id long, chunk_id long, chunk_text string",
    )
    fast = {(r.doc_id, r.chunk_id): r.is_dup for r in chunk_dedup(chunks).collect()}
    safe = {
        (r.doc_id, r.chunk_id): r.is_dup
        for r in chunk_dedup(chunks, skew_safe=True).collect()
    }
    assert fast == safe
    assert sum(fast.values()) == 40 - 5  # 5 distinct texts are canonical
