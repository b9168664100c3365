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
