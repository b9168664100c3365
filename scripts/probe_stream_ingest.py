"""Probe: long-horizon steady state of the STREAMING index ingest
loop (streaming/live_state.foreach_batch_incremental_ingest).

Round-13 measured the batch steady state (8 sequential shards,
per-shard wall flat — probe_routed_incremental --steady); round 14
made the ingest loop family-agnostic and drivable by Structured
Streaming, so this probe measures the same economics THROUGH the
stream: a base index is built once over the corpus, then N shard
re-crawls arrive as mtime-pinned files consumed one per trigger
(availableNow), each micro-batch deduping against the persisted
index and appending itself (update_index=True).  The claim under
test: per-trigger wall is bounded by batch size × matched buckets —
independent of how many batches were already ingested — because the
candidate join reads only the batch's band/bucket directories, never
the index's history.  Per-batch walls come from the stream's own
progress events (triggerExecution), so scheduling and sink commit
are included — the number a production operator would see.

Usage:
  python scripts/probe_stream_ingest.py [family] [n_batches] [--compact]
family = minhash (default) | simhash; n_batches defaults to 8.
--compact runs the full production maintenance cycle after the first
drain: fold the per-trigger pairs dirs into one baseline (union must
be unchanged), then drain a SECOND stream of fresh shards landing
beside the baseline and verify the reader sees baseline + tail.
Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01); writes
only under /tmp; prints one JSON line per trigger plus a summary.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.dedup import (
    build_minhash_index,
    build_simhash_index,
)
from alstom_spark_cassandra_spark.operators.retrieval import (
    build_bm25_index,
    write_bm25_index,
)
from alstom_spark_cassandra_spark.session import get_spark
from alstom_spark_cassandra_spark.sources.loader import load_table
from alstom_spark_cassandra_spark.streaming.live_state import (
    foreach_batch_bm25_ingest,
    foreach_batch_index_ingest,
    foreach_batch_simhash_ingest,
    read_index_ingest_pairs,
)


def _stage_batches(shard, src_dir, base_dir, ids, tag=""):
    """Write one mtime-pinned single-file parquet per batch index in
    `ids` so maxFilesPerTrigger=1 consumes them in order."""
    for k in ids:
        b = shard.select(
            (F.col("doc_id") + (k + 1) * 10_000_000).alias("doc_id"),
            "text",
        )
        stage = f"{base_dir}/stage{tag}{k}"
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k:03d}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)


def _stage_vec_batches(shard, src_dir, base_dir, ids, tag=""):
    """_stage_batches for the embeddings-shaped semantic family."""
    for k in ids:
        b = shard.select(
            (F.col("vec_id") + (k + 1) * 10_000_000).alias("vec_id"),
            "embedding",
        )
        stage = f"{base_dir}/stage{tag}{k}"
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{src_dir}/batch{k:03d}.parquet"
        shutil.copyfile(part, dst)
        os.utime(dst, (1_000_000_000 + 60 * k,) * 2)


def _drain(spark, sink, src_dir, ckpt, schema="doc_id long, text string"):
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1800):
        q.stop()
        raise SystemExit("stream did not drain in 1800s")
    return q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "family", nargs="?", default="minhash",
        choices=["minhash", "simhash", "bm25", "winnow", "semantic"],
    )
    ap.add_argument("n_batches", nargs="?", type=int, default=8)
    ap.add_argument(
        "--compact", action="store_true",
        help="after the drain: compact pairs, then drain a second "
        "stream beside the baseline (the full maintenance cycle)",
    )
    args = ap.parse_args()
    family, n_batches = args.family, args.n_batches
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark(app_name=f"probe_stream_ingest_{family}")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    base_dir = tempfile.mkdtemp(prefix=f"probe_stream_{family}_")
    index_path = f"{base_dir}/index"
    pairs_sink = f"{base_dir}/pairs"
    src_dir = f"{base_dir}/src"
    os.makedirs(pairs_sink)
    os.makedirs(src_dir)
    if family == "minhash":
        build_minhash_index(docs, index_path, "text", "doc_id")
        sink = foreach_batch_index_ingest(
            index_path, pairs_sink, threshold=1.0
        )
    elif family == "bm25":
        # the index-output member: per-trigger work = the batch's
        # append (postings in matched buckets + doc_len + stats
        # merge) + one started-marker mkdirs — the flat claim here
        # is that trigger wall never grows with the postings already
        # ingested
        write_bm25_index(
            build_bm25_index(docs, "text", "doc_id", n_buckets=16),
            index_path,
        )
        sink = foreach_batch_bm25_ingest(index_path, pairs_sink)
    elif family == "winnow":
        # r15-build-tail member (VERDICT r15 item 8): per-trigger
        # work = the batch's fingerprints vs the index's MATCHED
        # buckets only + its own append
        from alstom_spark_cassandra_spark.operators.winnow import (
            build_winnow_index,
        )
        from alstom_spark_cassandra_spark.streaming.live_state import (
            foreach_batch_winnow_ingest,
        )

        build_winnow_index(docs, index_path, "text", "doc_id")
        sink = foreach_batch_winnow_ingest(index_path, pairs_sink)
    elif family == "semantic":
        # the verdict-shaped member: per-trigger work = assign the
        # batch on the frozen centroid grid, prune vs the CUMULATIVE
        # kept table (bucketed by cid — only matched cells read) and
        # vs itself, append survivors
        from alstom_spark_cassandra_spark.operators.similarity import (
            build_semantic_index,
            incremental_semantic_dedup,
        )
        from alstom_spark_cassandra_spark.streaming.live_state import (
            foreach_batch_incremental_ingest,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        base = emb.filter(F.col("vec_id") % 5 != 0)
        init = (
            base.orderBy("vec_id")
            .limit(8)
            .select(
                F.col("vec_id").cast("int").alias("cid"),
                F.col("embedding").cast("array<double>").alias("cv"),
            )
        )
        build_semantic_index(base, init, index_path, threshold=0.4)

        def _sem_fn(spark_, batch_df, path):
            return incremental_semantic_dedup(
                spark_, batch_df, path, threshold=0.4,
                update_index=True,
            )

        sink = foreach_batch_incremental_ingest(
            index_path, pairs_sink, _sem_fn, pair_cols=("vec_id",)
        )
    else:
        build_simhash_index(docs, index_path, "text", "doc_id")
        sink = foreach_batch_simhash_ingest(index_path, pairs_sink)

    # N shard re-crawls (doc_id % 5 = 0), ids offset per batch so
    # every batch pairs against the base AND every earlier batch —
    # the candidate set per batch GROWS linearly in batches ingested,
    # which is exactly why flat wall is the claim worth testing
    if family == "semantic":
        shard = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 5 == 0)
        )
        _stage_vec_batches(shard, src_dir, base_dir, range(n_batches))
    else:
        shard = docs.filter(F.col("doc_id") % 5 == 0)
        _stage_batches(shard, src_dir, base_dir, range(n_batches))
    q = _drain(
        spark, sink, src_dir, f"{base_dir}/ckpt",
        schema=(
            "vec_id long, embedding array<float>"
            if family == "semantic"
            else "doc_id long, text string"
        ),
    )
    if args.compact:
        # maintenance between streams: fold the per-trigger pairs
        # dirs to one baseline, assert the drained union unchanged,
        # then drain a SECOND stream of fresh shards beside the
        # baseline — the full production cycle
        from alstom_spark_cassandra_spark.streaming.live_state import (
            compact_ingest_pairs,
        )

        import time as _time

        before = read_index_ingest_pairs(spark, pairs_sink).count()
        t0 = _time.time()
        folded = compact_ingest_pairs(spark, pairs_sink)
        wall = round(_time.time() - t0, 2)
        after = read_index_ingest_pairs(spark, pairs_sink).count()
        assert after == before, (before, after)
        print(
            json.dumps(
                {
                    "compacted_batches": len(folded),
                    "compact_wall_s": wall,
                    "pairs_before": before,
                    "pairs_after": after,
                }
            )
        )
        # second drain: 2 fresh shard batches land in the SAME source
        # dir and the stream restarts on the SAME checkpoint, so
        # Structured Streaming continues the batch-id sequence past
        # the baseline cutoff (a fresh checkpoint would reuse ids
        # 0..1, which the committed done markers rightly no-op); the
        # reader must then see baseline + tail
        stager = (
            _stage_vec_batches if family == "semantic" else _stage_batches
        )
        stager(
            shard, src_dir, base_dir,
            range(n_batches, n_batches + 2), tag="b",
        )
        _drain(spark, sink, src_dir, f"{base_dir}/ckpt")
        post = read_index_ingest_pairs(spark, pairs_sink).count()
        assert post > after, (after, post)
        print(
            json.dumps(
                {
                    "second_stream_batches": 2,
                    "pairs_after_second_stream": post,
                }
            )
        )
    walls = []
    for p in q.recentProgress:
        if p is None or p["numInputRows"] == 0:
            continue
        walls.append(
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "trigger_ms": p["durationMs"]["triggerExecution"],
            }
        )
        print(json.dumps(walls[-1]))
    n_pairs = read_index_ingest_pairs(spark, pairs_sink).count()
    ms = [w["trigger_ms"] for w in walls]
    print(
        json.dumps(
            {
                "family": family,
                "n_batches": len(ms),
                "first_ms": ms[0] if ms else None,
                "last_ms": ms[-1] if ms else None,
                "max_over_min": (
                    round(max(ms) / min(ms), 2) if ms else None
                ),
                "total_pairs": n_pairs,
                "sf_dir": sf_dir,
            }
        )
    )
    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
