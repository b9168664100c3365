"""Hashed linear quality classifier: weight-table equivalence, bias,
empty docs."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.functions.quality_model import (
    MIX,
    SPAN,
    feature_bucket,
    hashed_logit_milli,
    pseudo_weight_milli,
    score_with_weights,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the the the"),
            (3, ""),
            (4, "   "),
        ],
        "doc_id long, text string",
    )


def test_empty_docs_score_bias_only(spark):
    out = {
        r.id: r.logit_milli
        for r in hashed_logit_milli(_docs(spark), bias_milli=7).collect()
    }
    assert out[3] == 7 and out[4] == 7
    assert len(out) == 4  # token-less docs keep their row


def test_repeated_token_counts_per_occurrence(spark):
    out = {
        r.id: r.logit_milli for r in hashed_logit_milli(_docs(spark)).collect()
    }
    single = spark.createDataFrame([(9, "the")], "doc_id long, text string")
    w_the = hashed_logit_milli(single).collect()[0].logit_milli
    assert out[2] == 3 * w_the


def test_weight_table_path_matches_closed_form(spark):
    """score_with_weights over a table materializing the pseudo
    weights for every bucket must equal hashed_logit_milli — the
    trained-weights deployment path shares the scoring plan."""
    n_buckets = 512
    weights = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        pseudo_weight_milli(F.col("id")).alias("weight_milli"),
    )
    docs = _docs(spark)
    a = {
        r.id: r.logit_milli
        for r in hashed_logit_milli(docs, n_buckets=n_buckets).collect()
    }
    b = {
        r.id: r.logit_milli
        for r in score_with_weights(docs, weights, n_buckets=n_buckets).collect()
    }
    assert a == b


def test_pseudo_weight_range_and_mix(spark):
    rows = (
        spark.range(4096)
        .select(pseudo_weight_milli(F.col("id")).alias("w"))
        .agg(
            F.min("w").alias("lo"),
            F.max("w").alias("hi"),
            F.countDistinct("w").alias("nd"),
        )
        .collect()[0]
    )
    assert -(SPAN // 2) <= rows.lo and rows.hi <= SPAN // 2
    assert rows.nd > 1000  # the mix constant actually spreads
    # spot-check the closed form
    got = (
        spark.range(5, 6)
        .select(pseudo_weight_milli(F.col("id")).alias("w"))
        .collect()[0]
        .w
    )
    assert got == (5 * MIX) % SPAN - SPAN // 2
