"""Probe: incremental SemDeDup vs full re-dedup as the corpus grows.

The incremental_dedup (MinHash) row earned its keep with a measured
3.8x at 1M docs; this probe does the same honest measurement for the
round-11 semantic member. Setup: a base corpus of N vectors is
indexed once (build_semantic_index — flat assignment + prune, kept
survivors persisted bucketed by cid); then a shard of N/4 new vectors
arrives and we measure

  full   = semantic_dedup over base ∪ shard with fixed centroids
           (what a non-incremental pipeline re-runs per shard)
  incr   = incremental_semantic_dedup of the shard against the index

Both produce the shard verdicts; `full` also re-produces all base
verdicts nobody asked for — that waste is the point being measured.
(The two contracts differ on rows similar only to DROPPED base rows —
documented in SCALE.md — so outputs are not compared here; each has
its own exact oracle in the registry.)

Usage: python scripts/probe_incremental_semdedup.py [n_base_thousands ...]
Defaults to 50 100 150. Writes only under /tmp; prints one JSON
line per measurement.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.similarity import (
    build_semantic_index,
    incremental_semantic_dedup,
    semantic_dedup,
)
from alstom_spark_cassandra_spark.session import get_spark

DIM = 32
CLUSTER = 250  # target rows per cluster: k scales with n (SemDeDup's
# own design — cluster size stays bounded as the corpus grows, which
# is what keeps the within-cluster quadratic term linear overall)


def synth_vectors(spark, n: int, id_offset: int = 0):
    """Deterministic synthetic embeddings: DIM pseudo-random-ish
    components from integer mixes of (id, pos) — same recipe family
    as tests' _routed_fixture, JVM-side, no Python loop."""
    return spark.range(n).select(
        (F.col("id") + id_offset).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), p -> "
            "round(cast((id % 97) * 37 + p * 101 as double) / 29.0 % 7.0 "
            "+ cast((id * 13 + p * 7) % 211 as double) / 100.0, 6))"
        ).alias("embedding"),
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [50, 100, 150]
    spark = get_spark(app_name="probe_incr_semdedup")
    # warmup: pay JIT/codegen once so the first measured arm isn't
    # charged for it (the first draft charged it all to build_sec)
    wbase = synth_vectors(spark, 2000)
    winit = wbase.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    semantic_dedup(wbase, winit, threshold=0.95, n_iters=0).count()
    for n_k in sizes:
        n_base = n_k * 1000
        n_shard = n_base // 4
        k = max(8, n_base // CLUSTER)
        base = synth_vectors(spark, n_base)
        shard = synth_vectors(spark, n_shard, id_offset=n_base)
        init = base.filter(F.col("vec_id") < k).select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        path = f"{tempfile.gettempdir()}/probe_semidx_{n_k}"
        shutil.rmtree(path, ignore_errors=True)

        t0 = time.time()
        build_semantic_index(base, init, path, threshold=0.95)
        t_build = time.time() - t0

        # checksum agg, NOT count(): count() lets Catalyst drop the
        # kept-flag left join and prune the assignment fold entirely
        # (a left join never changes cardinality), which made the
        # first draft's "full" arm measure almost nothing while the
        # incremental arm's eager checkpoint still paid its fold —
        # the checksum forces both arms to evaluate cid AND kept
        def checksum(df):
            return df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("cid").cast("long")).alias("c"),
                F.sum(F.col("kept").cast("long")).alias("kc"),
            ).collect()[0]

        t0 = time.time()
        r_full = checksum(
            semantic_dedup(
                base.unionByName(shard), init, threshold=0.95, n_iters=0
            ).filter(F.col("vec_id") >= n_base)
        )
        t_full = time.time() - t0

        t0 = time.time()
        r_incr = checksum(
            incremental_semantic_dedup(spark, shard, path, threshold=0.95)
        )
        t_incr = time.time() - t0

        print(
            json.dumps(
                {
                    "n_base": n_base,
                    "n_shard": n_shard,
                    "k": k,
                    "dim": DIM,
                    "build_sec": round(t_build, 2),
                    "incr_sec": round(t_incr, 2),
                    "full_sec": round(t_full, 2),
                    "speedup": round(t_full / t_incr, 2),
                    "rows_incr": r_incr["n"],
                    "rows_full": r_full["n"],
                    "kept_incr": r_incr["kc"],
                    "kept_full": r_full["kc"],
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
