"""Repeated-span stats: hand-computed coverage incl. overlapping and
within-document repeats, short/empty docs, a Python brute force, and
parameter validation."""

import pytest

from alstom_spark_cassandra_spark.operators.spans import (
    repeated_span_stats,
)


def _stats(df):
    return {
        r[0]: (r["n_chars"], r["n_grams"], r["n_repeated_pos"],
               r["covered_chars"])
        for r in df.collect()
    }


def _brute(texts, L):
    import re
    from collections import Counter

    norm = {i: re.sub(r"\s+", " ", (t or "").lower()).strip()
            for i, t in texts.items()}
    c = Counter()
    for s in norm.values():
        for i in range(len(s) - L + 1):
            c[s[i:i + L]] += 1
    out = {}
    for i, s in norm.items():
        n = max(len(s) - L + 1, 0)
        reps = [p for p in range(n) if c[s[p:p + L]] >= 2]
        covered = set()
        for p in reps:
            covered.update(range(p, p + L))
        out[i] = (len(s), n, len(reps), len(covered))
    return out


def test_cross_doc_repeat_and_coverage(spark):
    a = "the quick brown fox jumps over the lazy dog tonight"
    b = "prefix text then the quick brown fox jumps over the lazy dog"
    c = "completely unrelated content about spark physical plans here"
    texts = {1: a, 2: b, 3: c}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = _stats(repeated_span_stats(df, "doc_id", "text", min_len=20))
    assert got == _brute(texts, 20)
    # the shared sentence is > 20 chars: both carriers covered, doc 3 not
    assert got[1][3] > 0 and got[2][3] > 0 and got[3][3] == 0


def test_within_doc_repeat_counts(spark):
    spam = ("buy cheap widgets now " * 4).strip()  # self-repeating
    df = spark.createDataFrame([(1, spam)], "doc_id long, text string")
    got = _stats(repeated_span_stats(df, "doc_id", "text", min_len=20))
    assert got == _brute({1: spam}, 20)
    n_chars, _, _, covered = got[1]
    assert covered == n_chars  # a loop is repeated wall-to-wall


def test_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, None), (4, "x" * 25), (5, "x" * 25)],
        "doc_id long, text string",
    )
    got = _stats(repeated_span_stats(df, "doc_id", "text", min_len=20))
    assert got[1] == (4, 0, 0, 0)
    assert got[2] == (0, 0, 0, 0)
    assert got[3] == (0, 0, 0, 0)
    # docs 4 and 5 are identical: every position repeats, full coverage
    assert got[4] == (25, 6, 6, 25)
    assert got[5] == got[4]


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        repeated_span_stats(df, "doc_id", "text", min_len=0)
    with pytest.raises(ValueError):
        repeated_span_stats(df, "doc_id", "text", min_count=1)
