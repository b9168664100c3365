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

Steady-state mode (round-13 verdict task 5):

  python scripts/probe_routed_incremental.py --steady \
      [n_base_thousands] [n_shards]

indexes a base corpus once, then ingests n_shards (default 8)
SEQUENTIAL shards with survivor write-back (update_index=True),
runs compact_semantic_index once mid-sequence, and prints one JSON
line per shard: wall, shard rows, survivors appended, cumulative
kept rows, and the kept table's file count (total + max per
bucket).  The claim under test: per-shard wall is bounded by shard
size x survivors-per-matched-cluster — independent of how many
shards were already ingested — and compaction folds the
accumulated one-file-per-append-per-bucket generations back to one
file per bucket without touching any result.
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


def synth_vectors(spark, n: int, id_offset: int = 0, novel: bool = False):
    """Same deterministic synthetic recipe as
    probe_incremental_semdedup — JVM-side, no Python loop.  By
    default the embedding derives from the RAW 0..n id, so a shard
    with an id_offset duplicates the base's vectors exactly (the
    dedup-work measurement of the routed-vs-flat probe).  With
    novel=True the embedding derives from the OFFSET id instead, so
    each shard carries genuinely new patterns alongside re-crawls —
    the steady-state probe needs survivors to actually append."""
    src = "(id + {o})".format(o=id_offset) if novel else "id"
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), p -> "
            f"round(cast(({src} % 97) * 37 + p * 101 as double) / 29.0 % 7.0 "
            f"+ cast(({src} * 13 + p * 7) % 211 as double) / 100.0, 6))"
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


def kept_file_stats(path: str):
    """(n_files, max_files_per_bucket) of the kept table's data
    files; the bucket id is the _NNNNN suffix Spark encodes in every
    bucketed file name."""
    import os
    import re
    from collections import Counter

    per_bucket: Counter = Counter()
    for f in os.listdir(f"{path}/kept"):
        m = re.search(r"_(\d{5})(?:\.|$|c)", f)
        if f.startswith("part-") and m:
            per_bucket[int(m.group(1))] += 1
    n = sum(per_bucket.values())
    return n, (max(per_bucket.values()) if per_bucket else 0)


def steady_state(spark, n_base_k: int, n_shards: int):
    from alstom_spark_cassandra_spark.operators.similarity import (
        compact_semantic_index,
    )

    n_base = n_base_k * 1000
    n_shard = max(1000, n_base // 8)
    k = max(8, n_base // CLUSTER)
    n_coarse = max(2, math.isqrt(k))
    base = synth_vectors(spark, n_base)
    init = base.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    path = f"{tempfile.gettempdir()}/probe_steady_{n_base_k}"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    build_semantic_index(base, init, path, threshold=0.95)
    n_files, maxb = kept_file_stats(path)
    print(
        json.dumps(
            {
                "phase": "build",
                "n_base": n_base,
                "k": k,
                "n_coarse": n_coarse,
                "wall_sec": round(time.time() - t0, 2),
                "kept_files": n_files,
                "max_files_per_bucket": maxb,
            }
        ),
        flush=True,
    )
    kept_prev = spark.read.parquet(f"{path}/kept").count()
    for i in range(n_shards):
        shard = synth_vectors(
            spark, n_shard, id_offset=n_base + i * n_shard, novel=True
        )
        t0 = time.time()
        r = checksum(
            routed_incremental_semantic_dedup(
                spark,
                shard,
                path,
                n_coarse=n_coarse,
                threshold=0.95,
                update_index=True,
            )
        )
        wall = time.time() - t0
        kept_now = spark.read.parquet(f"{path}/kept").count()
        n_files, maxb = kept_file_stats(path)
        print(
            json.dumps(
                {
                    "phase": "shard",
                    "shard": i + 1,
                    "rows": n_shard,
                    "wall_sec": round(wall, 2),
                    "survivors_appended": kept_now - kept_prev,
                    "kept_total": kept_now,
                    "kept_files": n_files,
                    "max_files_per_bucket": maxb,
                }
            ),
            flush=True,
        )
        kept_prev = kept_now
        if i + 1 == n_shards // 2:
            t0 = time.time()
            compact_semantic_index(spark, path)
            n_files, maxb = kept_file_stats(path)
            kept_after = spark.read.parquet(f"{path}/kept").count()
            print(
                json.dumps(
                    {
                        "phase": "compact",
                        "after_shard": i + 1,
                        "wall_sec": round(time.time() - t0, 2),
                        "kept_files": n_files,
                        "max_files_per_bucket": maxb,
                        "kept_rows_unchanged": kept_after == kept_now,
                    }
                ),
                flush=True,
            )
            assert kept_after == kept_now
    shutil.rmtree(path, ignore_errors=True)


def main():
    if sys.argv[1:2] == ["--steady"]:
        n_base_k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        spark = get_spark(app_name="probe_append_steady_state")
        steady_state(spark, n_base_k, n_shards)
        spark.stop()
        return
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
