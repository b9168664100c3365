"""Salted join (operators/skew.py) and bloom prefilter
(operators/sketches.bloom_build/bloom_prefilter)."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
)
from alstom_spark_cassandra_spark.operators.skew import salted_join


def _skewed_fact(spark):
    # key 1 is the hot key (90 rows), keys 2..10 one row each, plus
    # a null key and a dangling key 99 with no dim row
    rows = [(1, i) for i in range(90)]
    rows += [(k, 1000 + k) for k in range(2, 11)]
    rows += [(None, 5000), (99, 6000)]
    return spark.createDataFrame(rows, "k int, payload int")


def _dim(spark):
    return spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 11)], "k int, attr string"
    )


def test_salted_join_inner_equals_plain(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = sorted(
        map(tuple, fact.join(dim, ["k"], "inner").collect())
    )
    salted = sorted(
        map(tuple, salted_join(fact, dim, ["k"], n_salts=8).collect())
    )
    assert salted == plain and len(plain) == 99


def test_salted_join_left_keeps_unmatched_and_nulls(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = sorted(
        map(tuple, fact.join(dim, ["k"], "left").collect()),
        key=str,
    )
    salted = sorted(
        map(tuple, salted_join(fact, dim, ["k"], n_salts=4, how="left").collect()),
        key=str,
    )
    assert salted == plain
    # null-key and dangling rows appear exactly once
    assert sum(1 for r in plain if r[1] in (5000, 6000)) == 2


def test_salted_join_spreads_hot_key(spark):
    """The point of the salt: the hot key's rows must land in more
    than one (key, salt) group."""
    fact = _skewed_fact(spark)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)
    ).cast("int")
    n_groups = (
        fact.filter(F.col("k") == 1)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_groups >= 4  # 90 rows over 8 salts: all 8 w.h.p., >=4 surely


def test_salted_join_rejects_right_joins(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(fact, dim, ["k"], how="right")


def test_salted_join_plan_no_cartesian(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    out = salted_join(fact, dim, ["k"], n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__salt" in plan  # the join really runs on (key, salt)


def test_bloom_no_false_negatives_and_prunes(spark):
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 100, 7)], "key string"
    )
    fact = spark.createDataFrame(
        [(f"k{i}", i) for i in range(100)], "key string, v int"
    )
    bloom = bloom_build(keys, "key", depth=4, width=2048)
    cand = bloom_prefilter(fact, bloom, "key", depth=4, width=2048)
    cand_keys = {r.key for r in cand.collect()}
    true_keys = {r.key for r in keys.collect()}
    assert true_keys <= cand_keys  # never drops a real member
    # with 15 keys in 4x2048 bits, false positives are rare: the
    # candidate set must actually prune (not pass everything)
    assert len(cand_keys) < 50


def test_bloom_filter_is_pure_map(spark):
    """The membership test must ride into the scan as a predicate:
    no join, no exchange in the filtered plan."""
    keys = spark.createDataFrame([("a",), ("b",)], "key string")
    fact = spark.createDataFrame(
        [(c, 1) for c in "abcdefgh"], "key string, v int"
    )
    bloom = bloom_build(keys, "key", depth=4, width=256)
    out = bloom_prefilter(fact, bloom, "key", depth=4, width=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_bloom_high_bit_words_no_false_negative(spark):
    """width=64 packs every bucket into ONE word, so bits 0..63 —
    including the sign bit 63, which forces the signed-literal
    encoding — are all exercised; every member must still pass."""
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(200)], "key string"
    )
    bloom = bloom_build(keys, "key", depth=4, width=64)
    # most of the 4x64 cells are set with 200 keys (243 measured),
    # so high word bits — including sign bit 63 — are exercised
    assert bloom.count() > 200
    cand = bloom_prefilter(keys, bloom, "key", depth=4, width=64)
    assert cand.count() == 200  # no member dropped


def test_bloom_fast_path_no_false_negatives(spark):
    """portable=False (xxhash64, the production hash) keeps the
    no-false-negative guarantee and the pure-map plan; only the
    cross-engine oracle needs md5."""
    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 100, 7)], "key string"
    )
    fact = spark.createDataFrame(
        [(f"k{i}", i) for i in range(100)], "key string, v int"
    )
    bloom = bloom_build(keys, "key", depth=4, width=2048, portable=False)
    cand = bloom_prefilter(
        fact, bloom, "key", depth=4, width=2048, portable=False
    )
    cand_keys = {r.key for r in cand.collect()}
    assert {r.key for r in keys.collect()} <= cand_keys
    assert len(cand_keys) < 50
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_null_keys_dropped_both_paths(spark):
    """NULL keys must neither crash the mask compiler (the portable
    path's concat-with-NULL used to emit NULL-bucket cells) nor pass
    the filter — a NULL can never match an equi-join."""
    keys = spark.createDataFrame([("a",), (None,)], "key string")
    fact = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "key string, v int"
    )
    for portable in (True, False):
        bloom = bloom_build(keys, "key", 4, 256, portable=portable)
        got = {
            r.v
            for r in bloom_prefilter(
                fact, bloom, "key", 4, 256, portable=portable
            ).collect()
        }
        assert 1 in got and 2 not in got


def test_bloom_merge_is_union_distinct(spark):
    a = spark.createDataFrame([("x",), ("y",)], "key string")
    b = spark.createDataFrame([("y",), ("z",)], "key string")
    merged = (
        bloom_build(a, "key", 4, 256)
        .unionByName(bloom_build(b, "key", 4, 256))
        .distinct()
    )
    direct = bloom_build(a.unionByName(b), "key", 4, 256)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
