"""Probe: decompose term_frequency's per-query wall into FIXED cost
(scheduling, codegen, exchange setup) and DATA cost — the r14
verdict flagged three rounds of monotone bench drift (0.502 s r1 →
0.889 s r14 = 1.77x) on UNCHANGED code and asked for the
distinctive_terms treatment: a recorded quiet-box decomposition
proving where the wall lives.

Method: the SAME plan shape (documents scan → explode(tokens) →
groupBy(term){countDistinct(doc_id), count} → top-50) is timed
min-of-N interleaved on three inputs —

  empty : documents filtered to zero rows BEFORE the explode (the
          filter is a parquet-pushable doc_id < 0, so the scan, the
          two-phase aggregation machinery, the sort and the limit
          all still plan and run; only the data is gone)
  sf    : the real corpus (what bench.py times)
  x10   : the corpus with each row replicated 10x by exploding a
          10-element literal array before tokenization (10x the
          explode/aggregate work on the same 594 KB scan)

If wall(sf) - wall(empty) is small relative to wall(sf), the bench
number is dominated by fixed cost at this input size and the drift
is environment (JVM/host state), not plan; wall(x10) then bounds the
true data-cost slope.  Prints one JSON line.

Usage: python scripts/probe_term_frequency.py [n_passes]
Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.functions.text_funcs import tokens
from alstom_spark_cassandra_spark.session import get_spark
from alstom_spark_cassandra_spark.sources.loader import load_table


def _plan(docs):
    term = F.explode(tokens(F.lower(F.col("text")))).alias("term")
    return (
        docs.select("doc_id", term)
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("term_freq"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(50)
    )


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="probe_term_frequency")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = load_table(spark, sf_dir, "documents")
    arms = {
        "empty": _plan(docs.filter(F.col("doc_id") < 0)),
        "sf": _plan(docs),
        "x10": _plan(
            docs.select(
                "text",
                F.explode(
                    F.array(*[F.lit(i) for i in range(10)])
                ).alias("rep"),
            ).select(
                (F.col("rep").cast("long") * 1_000_000_000
                 + F.monotonically_increasing_id()).alias("doc_id"),
                "text",
            )
        ),
    }
    samples: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(n_passes):
        for name, df in arms.items():
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
    mins = {k: min(v) for k, v in samples.items()}
    print(
        json.dumps(
            {
                "probe": "term_frequency_decomposition",
                "sf_dir": sf_dir,
                "n_passes": n_passes,
                "min_wall_s": mins,
                "samples": samples,
                "fixed_cost_share": round(
                    mins["empty"] / mins["sf"], 3
                ),
                "data_cost_slope_x10": round(
                    (mins["x10"] - mins["empty"])
                    / max(mins["sf"] - mins["empty"], 1e-9),
                    2,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
