"""Probe: routed vs flat shard assignment in the SemDeDup steady
state, as k grows with the corpus.

The r11 verdict's remaining perf quibble: the incremental path — the
one that runs forever in production — assigned shards with the FLAT
O(n·k·d) fold, while the batch path already had the O(n·(c+bucket)·d)
routed escape (measured 4.9x at k=1024). Round 12 shipped
routed_incremental_semantic_dedup; this probe measures the same
shard-assignment economics on the steady-state path: a base corpus of
N vectors is indexed once, a shard of N/4 arrives, and both
incremental twins are timed end-to-end (assignment + prune vs the
same bucketed kept index, checksum aggregate so Catalyst can't prune
either arm's fold — see probe_incremental_semdedup's methodology
note).  The arms' outputs differ only through routing (the eval row
routed_incremental_eval grades that agreement exactly); here each arm
reports its own checksum.

Usage: python scripts/probe_routed_incremental.py [n_base_thousands ...]
Defaults to 50 100 150.  n_coarse = isqrt(k) (the routed design
point).  Writes only under /tmp; prints one JSON line per size.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.similarity import (
    build_semantic_index,
    incremental_semantic_dedup,
    routed_incremental_semantic_dedup,
)
from alstom_spark_cassandra_spark.session import get_spark

DIM = 32
CLUSTER = 250  # rows per cluster: k scales with n (SemDeDup's design)


def synth_vectors(spark, n: int, id_offset: int = 0):
    """Same deterministic synthetic recipe as
    probe_incremental_semdedup — JVM-side, no Python loop."""
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), p -> "
            "round(cast((id % 97) * 37 + p * 101 as double) / 29.0 % 7.0 "
            "+ cast((id * 13 + p * 7) % 211 as double) / 100.0, 6))"
        ).alias("embedding"),
    )


def checksum(df):
    """count+cid+kept sums: forces both arms to evaluate the full
    assignment fold AND the kept-flag join (count() alone lets
    Catalyst drop the left join and the fold with it)."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cid").cast("long")).alias("c"),
        F.sum(F.col("kept").cast("long")).alias("kc"),
    ).collect()[0]


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50, 100, 150]
    spark = get_spark(app_name="probe_routed_incremental")
    # warmup: pay JIT/codegen once (methodology as the sibling probe)
    wbase = synth_vectors(spark, 2000)
    winit = wbase.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    wpath = f"{tempfile.gettempdir()}/probe_ridx_warm"
    shutil.rmtree(wpath, ignore_errors=True)
    build_semantic_index(wbase, winit, wpath, threshold=0.95)
    checksum(incremental_semantic_dedup(spark, wbase, wpath, threshold=0.95))
    checksum(
        routed_incremental_semantic_dedup(
            spark, wbase, wpath, n_coarse=2, threshold=0.95
        )
    )
    shutil.rmtree(wpath, ignore_errors=True)
    for n_k in sizes:
        n_base = n_k * 1000
        n_shard = n_base // 4
        k = max(8, n_base // CLUSTER)
        n_coarse = max(2, math.isqrt(k))
        base = synth_vectors(spark, n_base)
        shard = synth_vectors(spark, n_shard, id_offset=n_base)
        init = base.filter(F.col("vec_id") < k).select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        path = f"{tempfile.gettempdir()}/probe_ridx_{n_k}"
        shutil.rmtree(path, ignore_errors=True)

        t0 = time.time()
        build_semantic_index(base, init, path, threshold=0.95)
        t_build = time.time() - t0

        t0 = time.time()
        r_flat = checksum(
            incremental_semantic_dedup(spark, shard, path, threshold=0.95)
        )
        t_flat = time.time() - t0

        t0 = time.time()
        r_routed = checksum(
            routed_incremental_semantic_dedup(
                spark, shard, path, n_coarse=n_coarse, threshold=0.95
            )
        )
        t_routed = time.time() - t0

        print(
            json.dumps(
                {
                    "n_base": n_base,
                    "n_shard": n_shard,
                    "k": k,
                    "n_coarse": n_coarse,
                    "dim": DIM,
                    "build_sec": round(t_build, 2),
                    "flat_sec": round(t_flat, 2),
                    "routed_sec": round(t_routed, 2),
                    "speedup": round(t_flat / t_routed, 2),
                    "kept_flat": r_flat["kc"],
                    "kept_routed": r_routed["kc"],
                    "rows": r_flat["n"],
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
