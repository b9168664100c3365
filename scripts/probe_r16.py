"""Round-16 A/B probes (min-of-3 interleaved, noop sink, one session).

  probe_r16.py q4        — tpch_q4 semi-join vs pre-aggregated lineitem
  probe_r16.py ann       — cosine_topk per-pair norms vs precomputed
  probe_r16.py uh        — update_history_dense: construction vs
                           execution split, memo vs fresh build
  probe_r16.py mmr       — mmr_rerank first-call (cold codegen) timing

Every variant's result multiset is compared against the current
declared query so an A/B can never silently change semantics.
"""

from __future__ import annotations

import sys
import time
from collections import Counter

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from alstom_spark_cassandra_spark.operators import (  # noqa: E402
    free_local_checkpoints,
)
from alstom_spark_cassandra_spark.session import get_spark  # noqa: E402
from alstom_spark_cassandra_spark.sources.loader import load_table  # noqa: E402
from alstom_spark_cassandra_spark.workloads import SPARK_QUERIES  # noqa: E402

SF = "/root/testdata/sf0.1"


def timed(spark, label, build, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
        spark.catalog.clearCache()
        free_local_checkpoints(spark)
    print(f"  {label}: min-of-{n} {best:.3f}s")
    return best


def rows_multiset(df):
    cols = sorted(df.columns)
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def q4_alt(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    # EXISTS(l: l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
    # ⟺ max(l_shipdate) per orderkey > o_orderdate; and since
    # o_orderdate >= 1996-07-01, qualifying lineitems have
    # l_shipdate > 1996-07-01 — pushable date filter on the fact scan.
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp_ntz")
    )
    lagg = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("__maxship")
    )
    return (
        orders.join(lagg, orders.o_orderkey == lagg.l_orderkey)
        .filter(F.col("__maxship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def probe_q4(spark):
    cur = SPARK_QUERIES["tpch_q4"]
    print("tpch_q4: multiset check current vs pre-agg alt ...")
    assert rows_multiset(cur(spark, SF)) == rows_multiset(q4_alt(spark, SF)), \
        "ALT RESULT DIFFERS"
    print("  identical multisets")
    for _ in range(3):
        timed(spark, "current(semi-join)", lambda: cur(spark, SF), n=1)
        timed(spark, "alt(pre-agg)", lambda: q4_alt(spark, SF), n=1)


def probe_ann(spark):
    from alstom_spark_cassandra_spark.operators.similarity import (
        cosine, cosine_topk,
    )
    from alstom_spark_cassandra_spark.workloads import half_up

    emb = load_table(spark, SF, "embeddings")

    def old_form():
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        c = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("__cv")
        )
        q = queries.select(
            "query_id", F.col("query_vec").cast("array<double>").alias("__qv")
        )
        from pyspark.sql import Window

        scored = c.join(F.broadcast(q)).select(
            "query_id", "vec_id",
            cosine(F.col("__cv"), F.col("__qv")).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .orderBy("query_id", "rank")
        )
        return out.select(
            "query_id", "vec_id",
            half_up(F.col("cosine"), 6).alias("cosine"), "rank",
        )

    cur = SPARK_QUERIES["ann_cosine_topk"]
    print("ann_cosine_topk: multiset check old per-pair-norm form ...")
    assert rows_multiset(cur(spark, SF)) == rows_multiset(old_form()), \
        "FORMS DIFFER"
    print("  identical multisets")
    for _ in range(3):
        timed(spark, "old(per-pair norms)", old_form, n=1)
        timed(spark, "new(precomputed norms)", lambda: cur(spark, SF), n=1)

    # per-stage decomposition (VERDICT item 2): where do the ~0.6 s go?
    def scored_only():
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        from alstom_spark_cassandra_spark.operators.similarity import (
            dot, l2_norm,
        )

        c = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("__cv")
        ).withColumn("__cn", l2_norm(F.col("__cv")))
        qn = q.select(
            "query_id",
            F.col("query_vec").cast("array<double>").alias("__qv"),
        ).withColumn("__qn", l2_norm(F.col("__qv")))
        return c.join(F.broadcast(qn)).select(
            "query_id", "vec_id",
            F.try_divide(
                dot(F.col("__cv"), F.col("__qv")),
                F.col("__cn") * F.col("__qn"),
            ).alias("cosine"),
        )

    def scan_only():
        return emb.select("vec_id", "embedding")

    print("  decomposition (each stage min-of-3 noop):")
    timed(spark, "stage A: bare scan", scan_only)
    timed(spark, "stage B: scan+broadcast+cosine project", scored_only)
    timed(spark, "stage C: full query (B + partial/final top-k window)",
          lambda: cur(spark, SF))


def probe_uh(spark):
    from alstom_spark_cassandra_spark.sources.loader import refresh_tables

    name = "update_history_dense"
    fn = SPARK_QUERIES[name]
    for i in range(4):
        t0 = time.time()
        df = fn(spark, SF)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        print(
            f"  call {i}: construct {t1 - t0:.3f}s execute {t2 - t1:.3f}s "
            f"total {t2 - t0:.3f}s"
        )
        spark.catalog.clearCache()
        free_local_checkpoints(spark)
    refresh_tables()
    t0 = time.time()
    df = fn(spark, SF)
    t1 = time.time()
    print(f"  after refresh_tables: construct {t1 - t0:.3f}s (fresh build)")


def probe_mmr(spark):
    sf = "/root/testdata/sf0.001"
    fn = SPARK_QUERIES["mmr_rerank"]
    for i in range(3):
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        print(f"  call {i}: {time.time() - t0:.3f}s")
        spark.catalog.clearCache()
        free_local_checkpoints(spark)


def main():
    which = sys.argv[1:] or ["q4", "ann", "uh", "mmr"]
    spark = get_spark(app_name="probe_r16")
    # session warmup (JIT/codegen) so probe 1 isn't charged for it
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, SF, "lineitem").limit(1).collect()
    for w in which:
        print(f"== {w} ==")
        {"q4": probe_q4, "ann": probe_ann, "uh": probe_uh,
         "mmr": probe_mmr}[w](spark)
    spark.stop()


if __name__ == "__main__":
    main()
