"""Bigram-LM quality scoring tests: hand-computed smoothed
probabilities on a tiny corpus, unseen/context-less transitions,
short-document retention, and the broadcast plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.lm_score import (
    bigram_nll,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def lm(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    return train_bigram_lm(train, "text")


def test_trained_counts(lm):
    bigs = {r["bg"]: r["c12"] for r in lm.bigrams.collect()}
    assert bigs == {"a b": 2, "b a": 1, "a c": 1}
    ctx = {r["w1"]: r["c1"] for r in lm.contexts.collect()}
    # context counts = transitions OUT of the token: the final 'b' of
    # doc 1 and the final 'c' of doc 2 are not contexts
    assert ctx == {"a": 3, "b": 1}
    assert lm.vocab.collect()[0]["v"] == 3


def test_scores_hand_computed(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "z z"), (12, "hello"), (13, "  ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_nll(docs, "doc_id", "text", lm).collect()}
    # "a b": -ln((2+1)/(3+3)) = ln 2 ; "b c": unseen, -ln(1/(1+3)) = ln 4
    r = out[10]
    assert (r["n_bigrams"], r["n_unseen"]) == (2, 1)
    assert r["avg_nll"] == pytest.approx((math.log(2) + math.log(4)) / 2)
    # unseen context: c1 = 0 -> -ln(1/(0+3)) = ln 3
    r = out[11]
    assert (r["n_bigrams"], r["n_unseen"]) == (1, 1)
    assert r["avg_nll"] == pytest.approx(math.log(3))
    # fewer than two tokens: retained with zero evidence, NULL score
    for short_id in (12, 13):
        r = out[short_id]
        assert (r["n_bigrams"], r["n_unseen"]) == (0, 0)
        assert r["avg_nll"] is None


def test_repetition_scores_worse_than_training_text(spark, lm):
    # sequence-awareness: the bag-of-words profile of "a a a a" is
    # all-common tokens, but its transitions were never observed
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a a a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["avg_nll"] for r in bigram_nll(docs, "doc_id", "text", lm).collect()}
    assert out[2] > out[1]


def test_case_and_whitespace_normalized(spark, lm):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "  A   B ")], "doc_id long, text string"
    )
    out = bigram_nll(docs, "doc_id", "text", lm).collect()
    vals = {r["doc_id"]: r["avg_nll"] for r in out}
    assert vals[1] == vals[2]


def test_broadcast_plan_shape(spark, lm):
    docs = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    plan = bigram_nll(docs, "doc_id", "text", lm)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # model joins are broadcast by default: the exploded corpus side
    # never shuffles before scoring
    assert plan.count("BroadcastHashJoin") >= 2
