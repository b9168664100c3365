from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
)


def test_salted_agg_matches_plain(spark):
    rows = [("hot", i % 7, 1) for i in range(500)] + [
        ("cold", i, 1) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, v int, one int")
    got = {
        r.k: (r.total, r.n, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {"total": ("v", "sum"), "n": ("one", "count"), "mx": ("v", "max")},
            n_salts=4,
        ).collect()
    }
    plain = {
        r.k: (r.total, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("one").alias("n"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == plain


def test_salted_broadcast_left_matches_plain(spark):
    fact = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, i) for i in range(5)],
        "key int, payload int",
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "key int, attr string")
    got = sorted(
        (r.key, r.payload, r.attr)
        for r in salted_broadcast_left(fact, dim, "key", n_salts=4).collect()
    )
    plain = sorted(
        (r.key, r.payload, r.attr) for r in fact.join(dim, "key").collect()
    )
    assert got == plain


def test_salted_agg_two_phase_plan(spark):
    """The salted rewrite's physical shape: TWO hash exchanges — one
    on (keys, __salt) for the partial phase, one on the bare keys for
    the merge — is what spreads a hot key across n_salts reducers
    (the graded q_salted_agg claim)."""
    from alstom_spark_cassandra_spark.operators.skew import salted_agg

    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") * 2).alias("v"),
    )
    out = salted_agg(
        df, ["k"], {"s": ("v", "sum")}, n_salts=4, salt_cols=["rid"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "__salt" in plan.split("Exchange hashpartitioning")[1], plan


def test_salt_cols_spreads_duplicate_rows(spark):
    """The round-6 ADVICE degenerate case: byte-identical hot-key rows
    all hash to ONE salt when the salt covers every column, so the hot
    key never spreads. Pointing salt_cols at a high-entropy id must
    spread the same rows across (here all 4) salts — while staying
    deterministic, so a task retry reproduces the identical salt."""
    from alstom_spark_cassandra_spark.operators.skew import salted_agg

    dup = spark.range(0, 400).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("rid"),
        F.lit(1).alias("v"),  # payload identical across the hot key
    )
    def n_salts_used(salt_cols):
        salted = dup.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(4)
            ),
        )
        return salted.select("__salt").distinct().count()

    assert n_salts_used(["k", "v"]) == 1      # duplicates collapse
    assert n_salts_used(["rid"]) == 4         # high-entropy seam spreads
    # and the salted aggregate stays exact either way
    got = salted_agg(
        dup, ["k"], {"n": ("v", "count"), "s": ("v", "sum")},
        n_salts=4, salt_cols=["rid"],
    ).collect()[0]
    assert (got.n, got.s) == (400, 400)


def test_salted_latest_matches_plain_and_spreads(spark):
    """salted_latest is a physical rewrite: on a 50%-hot key with a
    total order it must equal plain latest_per_key exactly, and its
    phase-1 window must actually spread the hot key across salts."""
    from alstom_spark_cassandra_spark.operators.latest import (
        latest_per_key,
    )
    from alstom_spark_cassandra_spark.operators.skew import salted_latest

    df = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 7)
        .alias("k"),
        F.col("id").alias("ord"),
        (F.col("id") * 3).alias("payload"),
    )
    plain = {
        (r.k, r.ord, r.payload)
        for r in latest_per_key(df, ["k"], "ord").collect()
    }
    salted = salted_latest(df, ["k"], "ord", n_salts=8, salt_cols=["ord"])
    got = {(r.k, r.ord, r.payload) for r in salted.collect()}
    assert got == plain and len(got) == 7


def test_skewed_latest_salted_two_window_plan(spark):
    """The graded query's skew contract: the plan runs TWO window
    stages and the first one partitions on (..., __salt) — the hot
    series spreads before any single reducer sees it; both windows
    WindowGroupLimit-prune map-side; no join in the plan at all."""
    from alstom_spark_cassandra_spark.workloads import q_skewed_latest

    out = q_skewed_latest(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "__salt" in plan
    import re

    assert re.search(r"hashpartitioning\([^)]*__salt", plan), plan
    assert plan.count("WindowGroupLimit") >= 2
    assert "Join" not in plan
