"""PQ scale probe: codebook training, corpus encoding, and ADC
search cost vs corpus size, against brute-force cosine as the
reference point.

The claims under test (operators/pq.py): encoding reduces the corpus
to (id, sub, code) longs, so ADC search scans codes instead of raw
vectors (~dim*8 / (m_sub*~8) bytes per vector less I/O), and both
encode and search are single-scan / broadcast-join plans whose cost
grows linearly with corpus size with no shuffle of raw vectors.

Usage: python scripts/probe_pq.py [vecs_millions ...]
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.pq import pq_build, pq_topk
from alstom_spark_cassandra_spark.operators.similarity import cosine_topk
from alstom_spark_cassandra_spark.session import get_spark

DIM = 64
M_SUB = 4
K_CB = 64       # centroids per subspace
N_ITERS = 1
N_QUERIES = 20


def synth_vecs(spark, n: int):
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), 2000) / 1000.0 - 1.0
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comp.alias("embedding")
    )


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 2)


def main():
    sizes_m = [float(x) for x in sys.argv[1:]] or [1, 5]
    spark = get_spark(app_name="probe_pq")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    for m in sizes_m:
        n = int(m * 1_000_000)
        vecs = synth_vecs(spark, n).cache()
        vecs.count()
        init = vecs.filter(F.col("vec_id") < K_CB).select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        t0 = time.time()
        codes, books = pq_build(
            vecs, init, m_sub=M_SUB, n_iters=N_ITERS
        )
        codes = codes.cache()
        n_codes = codes.count()
        t_build = round(time.time() - t0, 2)

        t_adc = timed(pq_topk(codes, books, queries, k=10))
        t_brute = timed(
            cosine_topk(
                vecs,
                queries.select(
                    "query_id", F.col("query_vec").alias("query_vec")
                ),
                k=10,
            )
        )

        print(
            json.dumps(
                {
                    "vecs_millions": m,
                    "n_codes": n_codes,
                    "train_encode_s": t_build,
                    "adc_topk20q_s": t_adc,
                    "brute_cosine20q_s": t_brute,
                }
            )
        )
        codes.unpersist()
        vecs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
