"""Deterministic sampling/split tests."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"document number {i} with some content") for i in range(500)]
    rows += [(900, rows[3][1])]  # exact duplicate of doc 3's text
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hash_split_deterministic_and_leakproof(corpus):
    a = {r.doc_id: r.split for r in hash_split(corpus, "text").collect()}
    b = {r.doc_id: r.split for r in hash_split(corpus, "text").collect()}
    assert a == b
    # duplicates go to the same side: no train/eval leakage via copies
    assert a[3] == a[900]
    # roughly 90/10 (binomial slack on 501 docs)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.82 <= train / len(a) <= 0.97


def test_hash_split_salt_redraws(corpus):
    a = {r.doc_id: r.split for r in hash_split(corpus, "text").collect()}
    c = {r.doc_id: r.split for r in hash_split(corpus, "text", salt="v2").collect()}
    assert a != c


def test_hash_split_frac_one_all_train(corpus):
    assert (
        hash_split(corpus, "text", train_frac=1.0)
        .filter(F.col("split") == "eval")
        .count()
        == 0
    )


def test_hash_sample_nested(corpus):
    big = {r.doc_id for r in hash_sample(corpus, "text", 0.5).collect()}
    small = {r.doc_id for r in hash_sample(corpus, "text", 0.1).collect()}
    assert small <= big
    assert 0.35 <= len(big) / 501 <= 0.65
    assert len(small) < len(big)


def test_hash_sample_rejects_bad_rate(corpus):
    with pytest.raises(ValueError):
        hash_sample(corpus, "text", 1.5)


def test_stratified_hash_sample(spark):
    rows = [(i, f"doc {i}", "en" if i % 5 else "fr") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_hash_sample(
        df, "text", "lang", {"en": 0.2}, default_rate=1.0
    )
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["fr"] == 100          # default rate 1.0 keeps all
    assert 40 <= by_lang["en"] <= 125    # ~0.2 of 400, binomial slack
    # per-stratum sample is the same rows as the global hash_sample
    en_global = {
        r.doc_id
        for r in hash_sample(df.filter(F.col("lang") == "en"), "text", 0.2).collect()
    }
    en_strat = {r.doc_id for r in out.filter(F.col("lang") == "en").collect()}
    assert en_strat == en_global


def test_cap_per_group_keeps_topn_and_prelimits(spark):
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(s, i, 100 - i) for s in ("a", "b") for i in range(20)],
        "source string, doc_id long, score long",
    )
    out = cap_per_group(df, ["source"], [F.col("score").desc(), "doc_id"], 3)
    rows = out.collect()
    assert len(rows) == 6
    assert {r.score for r in rows} == {100, 99, 98}
    # WindowGroupLimit = losers dropped before the exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_deterministic_shuffle_is_stable_and_sharded(spark):
    from alstom_spark_cassandra_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = deterministic_shuffle(df, "doc_id").collect()
    b = deterministic_shuffle(df, "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-stable
    order_a = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.pos))]
    assert order_a != sorted(order_a)  # actually permuted
    # a different salt re-draws the permutation
    c = deterministic_shuffle(df, "doc_id", salt="epoch-2").collect()
    order_c = [r.doc_id for r in sorted(c, key=lambda r: (r.shard, r.pos))]
    assert order_a != order_c
    # positions are contiguous within each shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r.shard].append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_mixture_sample_exact_counts_and_determinism(spark):
    from collections import Counter

    from alstom_spark_cassandra_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(300)], "source string, doc_id long"
    )
    recipe = {"s0": 10, "s1": 5, "s2": 100}
    out = mixture_sample(df, "source", recipe, "doc_id")
    rows = out.collect()
    c = Counter(r.source for r in rows)
    assert c == {"s0": 10, "s1": 5, "s2": 100}
    # deterministic across reruns and partitionings
    again = mixture_sample(df.repartition(7), "source", recipe, "doc_id")
    assert sorted((r.source, r.doc_id) for r in again.collect()) == sorted(
        (r.source, r.doc_id) for r in rows
    )
    # stratum smaller than its cap -> whole stratum
    tiny = spark.createDataFrame([("s0", 1), ("s0", 2)], "source string, doc_id long")
    assert mixture_sample(tiny, "source", {"s0": 99}, "doc_id").count() == 2
    # pre-shuffle limit active
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_cluster_keyed_split_moves_near_dups_together(spark):
    """Near-duplicate docs (differing by one word — distinct text
    hashes) must land in ONE split when the split key is the dedup
    cluster id; a text-hash split can straddle them (the leakage the
    cluster key exists to prevent)."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from alstom_spark_cassandra_spark.operators.sampling import hash_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    variants = [
        (i, base + f" v{i}") for i in range(40)  # 40 near-dups of one doc
    ]
    docs = spark.createDataFrame(variants, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=1, threshold=0.8)
    comp = connected_components(pairs, vertices=docs, vertex_col="doc_id")
    labeled = docs.join(
        comp.select(F.col("v").alias("doc_id"), "cluster"), "doc_id"
    ).withColumn("ckey", F.col("cluster").cast("string"))

    by_cluster = (
        hash_split(labeled, "ckey")
        .groupBy("cluster")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r.n_splits == 1 for r in by_cluster)

    # the text-hash split DOES straddle this cluster (40 distinct
    # texts ~ certain to hit both sides of a 90/10 cut)
    text_splits = (
        hash_split(labeled, "text").select("split").distinct().count()
    )
    assert text_splits == 2


def test_temperature_quotas_sum_to_budget_and_flatten(spark):
    """Quotas sum exactly to the budget for any group sizes, and
    alpha = 1/2 flattens: a 100x bigger group gets only ~10x the
    quota, never 100x."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.sampling import (
        temperature_quotas,
    )

    rows = (
        [("big", i) for i in range(10_000)]
        + [("mid", i) for i in range(400)]
        + [("tiny", i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "src string, x long")
    got = {
        r.group: (r.n, r.quota)
        for r in temperature_quotas(df, "src", budget=111).collect()
    }
    assert sum(q for _, q in got.values()) == 111
    big_q, tiny_q = got["big"][1], got["tiny"][1]
    # raw proportions would give big 100x tiny; sqrt gives ~10x
    assert 5 <= big_q / max(tiny_q, 1) <= 15


def test_temperature_quotas_match_python_largest_remainder(spark):
    import math

    from alstom_spark_cassandra_spark.operators.sampling import (
        temperature_quotas,
    )

    sizes = {"a": 7, "b": 13, "c": 29, "d": 1}
    rows = [(g, i) for g, n in sizes.items() for i in range(n)]
    df = spark.createDataFrame(rows, "src string, x long")
    budget = 17
    s = {g: int(math.sqrt(n) * 1e6 + 0.5) for g, n in sizes.items()}
    S = sum(s.values())
    base = {g: (v * budget) // S for g, v in s.items()}
    rem = {g: v * budget - base[g] * S for g, v in s.items()}
    leftover = budget - sum(base.values())
    order = sorted(s, key=lambda g: (-rem[g], g))
    expect = {
        g: base[g] + (1 if order.index(g) < leftover else 0) for g in s
    }
    got = {
        r.group: r.quota
        for r in temperature_quotas(df, "src", budget=budget).collect()
    }
    assert got == expect
