"""Deletion-neighborhood fuzzy pairing: hand cases for every edit
type, losslessness vs the brute-force cross join, d=2, and the
equi-join plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_pairs,
)


def _pairs(df):
    return {(r.a, r.b): r.dist for r in df.collect()}


def test_variants_d1(spark):
    row = spark.createDataFrame([("abc",)], "s string").select(
        F.expr(deletion_variants("s", 1)).alias("v")
    ).collect()[0]
    assert set(row.v) == {"abc", "bc", "ac", "ab"}


def test_each_edit_type_found(spark):
    df = spark.createDataFrame(
        [
            (1, "martha"),
            (2, "marhta"),   # two substitutions away -> NOT at d=1
            (3, "marth"),    # deletion
            (4, "marthas"),  # insertion
            (5, "msrtha"),   # substitution
            (6, "martha"),   # exact duplicate
        ],
        "id long, s string",
    )
    got = _pairs(fuzzy_pairs(df, "id", "s", max_dist=1))
    assert got[(1, 3)] == 1 and got[(1, 4)] == 1 and got[(1, 5)] == 1
    assert got[(1, 6)] == 0
    assert (1, 2) not in got
    # d=2 additionally reaches the transposition-as-two-substitutions
    got2 = _pairs(fuzzy_pairs(df, "id", "s", max_dist=2))
    assert got2[(1, 2)] == 2


@pytest.mark.parametrize("d", [1, 2])
def test_lossless_vs_brute_force(spark, d):
    # a crowded neighborhood: short strings over a 2-letter alphabet
    words = ["".join(w) for w in itertools.product("ab", repeat=3)]
    words += ["ab", "ba", "abab", "aaab", ""]
    df = spark.createDataFrame(
        list(enumerate(words)), "id long, s string"
    )
    got = _pairs(fuzzy_pairs(df, "id", "s", max_dist=d))
    brute = (
        df.alias("l")
        .crossJoin(df.alias("r"))
        .filter(F.col("l.id") < F.col("r.id"))
        .withColumn("dist", F.levenshtein("l.s", "r.s"))
        .filter(F.col("dist") <= d)
    )
    want = {
        (r["a"], r["b"]): r["dist"]
        for r in brute.select(
            F.col("l.id").alias("a"), F.col("r.id").alias("b"), "dist"
        ).collect()
    }
    assert got == want


def test_bad_dist_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    for d in (0, 3):
        with pytest.raises(ValueError):
            fuzzy_pairs(df, "id", "s", max_dist=d)


def test_plan_is_equi_join_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(20)], "id long, s string"
    )
    plan = fuzzy_pairs(df, "id", "s")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "Python" not in plan
