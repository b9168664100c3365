"""Cross-document passage-level dedup (sliding k-token windows)."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.chunking import (
    passage_dup_stats,
    strip_duplicate_passages,
)

DOCS = [
    # d1/d2 share the 8-token passage "a b c d e f g h" at different
    # alignments
    (1, "a b c d e f g h unique1 unique2"),
    (2, "x y a b c d e f g h z"),
    # no duplication; exactly one window
    (3, "totally different words here only seven six eight"),
    # shorter than k -> no windows at all
    (4, "short doc"),
    # d5/d6 share a 9-token passage -> two OVERLAPPING dup windows
    # whose token union is 9, not 16
    (5, "p q r s t u v w x tail5"),
    (6, "head6 p q r s t u v w x"),
]


def _stats(spark, hashed):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in passage_dup_stats(
            docs, k=8, min_docs=2, hashed=hashed
        ).collect()
    }


def test_passage_dup_stats_finds_shared_spans(spark):
    got = _stats(spark, hashed=True)
    # d1: 10 tokens, 3 windows, the pos-0 window is shared with d2
    assert (got[1].n_tokens, got[1].n_windows) == (10, 3)
    assert (got[1].n_dup_windows, got[1].n_dup_tokens) == (1, 8)
    assert got[1].dup_token_ratio == 0.8
    # d2: same passage found at pos 2 despite different alignment
    assert (got[2].n_dup_windows, got[2].n_dup_tokens) == (1, 8)
    assert got[2].dup_token_ratio == 0.727273  # floor(8/11*1e6+.5)/1e6
    # d3: one window, no duplication
    assert (got[3].n_windows, got[3].n_dup_windows) == (1, 0)
    assert got[3].dup_token_ratio == 0.0
    # d4: too short for any window
    assert (got[4].n_tokens, got[4].n_windows, got[4].n_dup_windows) == (
        2,
        0,
        0,
    )


def test_passage_overlapping_windows_union_not_sum(spark):
    got = _stats(spark, hashed=True)
    # d5/d6 share 9 tokens -> 2 overlapping dup windows each; the
    # token count is the interval UNION (9), never 2*k
    assert (got[5].n_dup_windows, got[5].n_dup_tokens) == (2, 9)
    assert got[5].dup_token_ratio == 0.9
    assert (got[6].n_dup_windows, got[6].n_dup_tokens) == (2, 9)


def test_passage_hashed_and_portable_keys_agree(spark):
    a = _stats(spark, hashed=True)
    b = _stats(spark, hashed=False)
    for d in a:
        assert tuple(a[d]) == tuple(b[d]), d


def test_strip_duplicate_passages(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in strip_duplicate_passages(docs, k=8, min_docs=2).collect()
    }
    assert got[1] == "unique1 unique2"
    assert got[2] == "x y z"
    assert got[3] == DOCS[2][1]  # untouched
    assert got[4] == "short doc"
    assert got[5] == "tail5"
    assert got[6] == "head6"


def test_strip_keeps_all_rows_and_schema(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = strip_duplicate_passages(docs, k=8, min_docs=2)
    assert out.columns == ["doc_id", "text"]
    assert out.count() == len(DOCS)
