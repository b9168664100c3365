"""Round-5 scale probes: CMS sketch, hashed classifier, z-order
layout at tens of millions of rows (local[32]).

Local mode cannot prove cluster behavior, but it can falsify it:
superlinear growth, sketch size growing with input, or a z-order
layout whose per-file extents degrade would all show here first.

Usage: python scripts/probe_round5.py [rows_millions ...]
Writes only under /tmp; prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.functions.quality_model import (
    hashed_logit_milli,
)
from alstom_spark_cassandra_spark.operators.layout import zorder_repartition
from alstom_spark_cassandra_spark.operators.sketches import (
    cms_build,
    cms_lookup,
)
from alstom_spark_cassandra_spark.session import get_spark


def emit(**kw):
    print(json.dumps(kw), flush=True)


def synth_terms(spark, n_rows: int, n_distinct: int):
    """Zipf-ish term stream: term rank r = hash mod spread, skewed so
    low ranks are hot (r = min of two draws)."""
    return spark.range(n_rows).select(
        F.concat(
            F.lit("t"),
            F.least(
                F.pmod(F.xxhash64("id"), n_distinct),
                F.pmod(F.xxhash64("id", F.lit(1)), n_distinct),
            ).cast("string"),
        ).alias("term")
    )


def probe_cms(spark, n_rows: int):
    terms = synth_terms(spark, n_rows, 1_000_000)
    t0 = time.time()
    sketch = cms_build(terms, "term", depth=4, width=1024)
    cells = sketch.count()
    build_s = time.time() - t0
    emit(
        probe="cms_build",
        rows=n_rows,
        cells=cells,
        max_cells=4 * 1024,
        sec=round(build_s, 2),
    )
    # probe 100k distinct values against the broadcast sketch
    sketch = sketch.cache()
    sketch.count()
    probes = spark.range(100_000).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("term")
    )
    t0 = time.time()
    n = cms_lookup(sketch, probes, "term", depth=4, width=1024).count()
    emit(probe="cms_lookup", probes=n, sec=round(time.time() - t0, 2))
    sketch.unpersist()


def probe_classifier(spark, n_rows: int):
    # n_rows docs x 16 tokens each
    docs = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(F.col("id"), i), 50_000).cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    t0 = time.time()
    out = hashed_logit_milli(docs, n_buckets=4096)
    kept = out.filter(F.col("logit_milli") >= 0).count()
    emit(
        probe="quality_classifier",
        docs=n_rows,
        tokens=n_rows * 16,
        kept=kept,
        sec=round(time.time() - t0, 2),
    )


def probe_zorder(spark, n_rows: int):
    grid = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), 65536).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(7)), 65536).alias("b"),
    )
    out = f"{tempfile.gettempdir()}/zorder_probe"
    t0 = time.time()
    zorder_repartition(grid, "a", "b", bits=16, num_partitions=64).write.mode(
        "overwrite"
    ).parquet(out)
    write_s = time.time() - t0
    # compare: how much of the data does a 1/16 slice on EACH dim read?
    back = spark.read.parquet(out)
    t0 = time.time()
    na = back.filter(F.col("a") < 4096).count()
    nb = back.filter(F.col("b") < 4096).count()
    scan_s = time.time() - t0
    emit(
        probe="zorder_repartition",
        rows=n_rows,
        write_sec=round(write_s, 2),
        slice_scan_sec=round(scan_s, 2),
        a_slice_rows=na,
        b_slice_rows=nb,
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10, 50]
    spark = get_spark(app_name="probe_round5", cpus=32)
    for m in sizes:
        n = m * 1_000_000
        probe_cms(spark, n)
        probe_classifier(spark, max(n // 16, 1))
        probe_zorder(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
