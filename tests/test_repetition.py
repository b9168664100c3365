"""Repetition stats: hand-computed run-length cases, the pathological
repeated-sentence document, equality with a Python brute force, and
the map-only plan."""

from collections import Counter

import pytest

from alstom_spark_cassandra_spark.operators.repetition import (
    repetition_stats,
)


def _stats(df):
    return {
        r[0]: (r["n_grams"], r["top_gram"], r["dup_grams"])
        for r in df.collect()
    }


def _brute(text, n):
    toks = text.lower().split()
    grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return (0, 0, 0)
    c = Counter(grams)
    return (
        len(grams),
        max(c.values()),
        sum(v for v in c.values() if v >= 2),
    )


def test_hand_cases(spark):
    rows = [
        (1, "a b a b a b"),        # "a b" x3, "b a" x2 -> all 5 dup
        (2, "all tokens here are unique now"),  # no repeats
        (3, "x"),                  # fewer than n tokens
        (4, ""),                   # empty
        (5, None),                 # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _stats(repetition_stats(df, "doc_id", "text", n=2))
    assert got[1] == (5, 3, 5)
    assert got[2] == (5, 1, 0)
    assert got[3] == (0, 0, 0)
    assert got[4] == (0, 0, 0)
    assert got[5] == (0, 0, 0)


def test_repeated_sentence_spam(spark):
    # the document Gopher's filter exists for: one sentence looped
    spam = " ".join(["buy cheap widgets now"] * 50)
    clean = "a genuinely varied sentence with mostly distinct words here"
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], "doc_id long, text string"
    )
    got = _stats(repetition_stats(df, "doc_id", "text", n=3))
    n1, top1, dup1 = got[1]
    assert dup1 == n1              # every 3-gram of the loop repeats
    assert top1 == 50              # the wrap-around grams repeat 49x
    n2, top2, dup2 = got[2]
    assert (top2, dup2) == (1, 0)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_matches_brute_force(spark, n):
    texts = [
        "the cat sat on the mat the cat sat again",
        "a a a a a",
        "b",
        "  spaced   out   tokens  a b a ",
        "Mixed CASE mixed case MIXED case",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = _stats(repetition_stats(df, "doc_id", "text", n=n))
    for i, t in enumerate(texts):
        assert got[i] == _brute(" ".join(t.split()), n), (n, t)


def test_bad_n_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        repetition_stats(df, "doc_id", "text", n=0)


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df, "doc_id", "text")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
