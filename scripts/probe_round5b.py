"""Round-5 scale probes, part 2: Gram/power-iteration PCA and the
one-scan expectations gate at millions of rows (local[32]).

Usage: python scripts/probe_round5b.py [rows_millions ...]
Prints one JSON line per measurement; writes nothing.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.expectations import check_rules
from alstom_spark_cassandra_spark.operators.pca import (
    gram_matrix,
    power_iteration,
)
from alstom_spark_cassandra_spark.session import get_spark


def emit(**kw):
    print(json.dumps(kw), flush=True)


def probe_pca(spark, n_rows: int, dim: int):
    vecs = spark.range(n_rows).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), 2000) - 1000
            ).cast("double")
            / 1000.0,
        ).alias("embedding")
    )
    t0 = time.time()
    g = gram_matrix(vecs, "embedding").persist()
    cells = g.count()  # build + cache the d^2 cells
    gram_s = time.time() - t0
    t0 = time.time()
    n = power_iteration(g, dim=dim, n_iters=3).count()
    power_s = time.time() - t0
    g.unpersist()
    emit(
        probe="pca",
        rows=n_rows,
        dim=dim,
        gram_cells=cells,
        gram_sec=round(gram_s, 2),
        power_sec=round(power_s, 2),
        out_rows=n,
    )


def probe_expectations(spark, n_rows: int):
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("v"),
        F.when(F.pmod(F.xxhash64("id", F.lit(3)), 100) < 99, F.col("id"))
        .otherwise(F.lit(None))
        .alias("maybe_null"),
    )
    rules = {
        "v_nonneg": F.col("v") >= 0,
        "v_below_cap": F.col("v") < 95.0,
        "k_positive": F.col("k") >= 0,
        "not_null": F.col("maybe_null").isNotNull(),
        "v_precision": (F.col("v") * 10 % 1) == 0,
        "k_small": F.col("k") < n_rows,
        "v_range2": F.col("v").between(0, 100),
        "parity": F.pmod(F.col("k"), 2) >= 0,
    }
    t0 = time.time()
    out = check_rules(df, rules).collect()
    emit(
        probe="expectations_8_rules_one_scan",
        rows=n_rows,
        sec=round(time.time() - t0, 2),
        sample={r.rule: r.violations for r in out[:3]},
    )


def probe_funnel(spark, n_rows: int, n_users: int):
    """Chained conditional window-mins (the funnel plan) at scale:
    one user-key exchange carries all three stages."""
    from pyspark.sql import Window

    ev = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
        F.element_at(
            F.array(F.lit("signup"), F.lit("click"), F.lit("purchase"),
                    F.lit("view")),
            (F.pmod(F.xxhash64("id", F.lit(1)), 4) + 1).cast("int"),
        ).alias("event_type"),
        F.pmod(F.xxhash64("id", F.lit(2)), 10_000_000_000).alias("ts_ms"),
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts_ms"))).over(w)
    s1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts_ms") > F.col("t1"))
            & (F.col("ts_ms") <= F.col("t1") + 86_400_000),
            F.col("ts_ms"),
        )
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_ms") > F.col("t2"))
            & (F.col("ts_ms") <= F.col("t2") + 3_600_000),
            F.col("ts_ms"),
        )
    ).over(w)
    per_user = (
        s2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"),
             F.max("t3").alias("t3"))
    )
    t0 = time.time()
    row = per_user.agg(
        F.count(F.lit(1)).alias("users"),
        F.count("t1").alias("s1"),
        F.count("t2").alias("s2"),
        F.count("t3").alias("s3"),
    ).collect()[0]
    emit(
        probe="funnel_3stage_one_exchange",
        rows=n_rows,
        users=row.users,
        stages=[row.s1, row.s2, row.s3],
        sec=round(time.time() - t0, 2),
    )


def probe_pagerank(spark, n_edges: int, n_verts: int):
    from alstom_spark_cassandra_spark.operators.graph import pagerank

    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), n_verts).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), n_verts).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    verts = spark.range(n_verts).select(F.col("id").alias("v"))
    t0 = time.time()
    n = pagerank(edges, verts, "v", n_iters=3).count()
    emit(
        probe="pagerank_3_rounds",
        edges=n_edges,
        vertices=n_verts,
        out_rows=n,
        sec=round(time.time() - t0, 2),
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10, 50]
    spark = get_spark(app_name="probe_round5b", cpus=32)
    for m in sizes:
        n = m * 1_000_000
        probe_pca(spark, max(n // 10, 1), 16)
        probe_expectations(spark, n)
        probe_funnel(spark, n, 1_000_000)
    # one wide-dim PCA point: 64 dims (the registry shape)
    probe_pca(spark, 200_000, 64)
    probe_pagerank(spark, 20_000_000, 2_000_000)
    spark.stop()


if __name__ == "__main__":
    main()
