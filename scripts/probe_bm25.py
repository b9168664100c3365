"""BM25 scale probe: postings build + query-batch cost vs corpus size.

The claim under test (operators/retrieval.py): retrieval cost tracks
the posting lists of the QUERY terms, not corpus size — so querying
against a persisted index should be roughly flat as the corpus grows,
while the one-time index build grows linearly.

Usage: python scripts/probe_bm25.py [docs_millions ...]
Prints one JSON line per corpus size.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.retrieval import (
    bm25_topk,
    build_bm25_index,
    read_bm25_index,
    write_bm25_index,
)
from alstom_spark_cassandra_spark.session import get_spark

DOC_TOKENS = 12
VOCAB = 200_000  # ~zipf-free uniform vocab; posting list ~ n_docs*12/V
N_QUERIES = 100


def synth_docs(spark, n_docs: int):
    """Deterministic ~12-token docs over a 200k-term vocab."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), i), VOCAB).cast("string"),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )


def timed(df) -> float:
    """Best-of-2 noop materialization (JIT/page-cache noise floor)."""
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return round(best, 2)


def main():
    sizes_m = [float(x) for x in sys.argv[1:]] or [1, 5]
    spark = get_spark(app_name="probe_bm25")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    for m in sizes_m:
        n = int(m * 1_000_000)
        docs = synth_docs(spark, n).cache()
        docs.count()
        queries = docs.filter(F.col("doc_id") < N_QUERIES).select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        )

        t0 = time.time()
        idx = build_bm25_index(docs, "text", "doc_id")
        idx.postings.cache()
        idx.doc_len.cache()
        idx.stats.cache()
        n_postings = idx.postings.count()  # materialize = index build
        idx.doc_len.count()
        idx.stats.count()
        t_build = round(time.time() - t0, 2)

        t_query = timed(bm25_topk(docs, queries, k=10, index=idx))
        t_inline = timed(bm25_topk(docs, queries, k=10))

        print(
            json.dumps(
                {
                    "docs_millions": m,
                    "n_postings": n_postings,
                    "index_build_s": t_build,
                    "query_100_persisted_s": t_query,
                    "query_100_inline_s": t_inline,
                }
            )
        )
        # disk-bucketed index: a SMALL query batch (1 query, 12
        # distinct terms) should read only its terms' bucket
        # directories — compare against the same small batch on the
        # cached (unprunable) index
        small_q = queries.limit(1)
        t_small_cached = timed(bm25_topk(docs, small_q, k=10, index=idx))

        bidx = build_bm25_index(docs, "text", "doc_id", n_buckets=256)
        t0 = time.time()
        path = "/tmp/probe_bm25_index"
        write_bm25_index(bidx, path)
        t_write = round(time.time() - t0, 2)
        disk = read_bm25_index(spark, path)
        t_small_disk = timed(bm25_topk(docs, small_q, k=10, index=disk))

        print(
            json.dumps(
                {
                    "docs_millions": m,
                    "index_write_bucketed_s": t_write,
                    "query_1_cached_s": t_small_cached,
                    "query_1_disk_pruned_s": t_small_disk,
                }
            )
        )

        idx.postings.unpersist()
        idx.doc_len.unpersist()
        idx.stats.unpersist()
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
