"""Scale probe: synthesize multi-million-row inputs and measure how
the core operators scale (wall time vs rows, plain vs salted under
skew). Local[N] cannot prove cluster behavior, but it can falsify it:
superlinear growth or skew collapse would show here first.

Usage: python scripts/scale_probe.py [rows_millions ...]
Writes nothing outside /tmp; prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.latest import latest_per_key
from alstom_spark_cassandra_spark.operators.locf import locf
from alstom_spark_cassandra_spark.operators.setops import symmetric_diff_rows
from alstom_spark_cassandra_spark.operators.skew import salted_agg
from alstom_spark_cassandra_spark.session import get_spark


def synth_events(spark, n_rows: int, n_users: int, skew: bool = False):
    """Deterministic synthetic change log; `skew=True` sends ~50% of
    rows to one hot user."""
    df = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (
            F.when(F.pmod(F.xxhash64("id"), 2) == 0, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("id", F.lit(1)), n_users)
            )
            if skew
            else F.pmod(F.xxhash64("id"), n_users)
        ).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ["click", "view", "purchase", "signup", "error"]]),
            (F.pmod(F.xxhash64("id", F.lit(2)), 5) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 100000) / 100.0).alias("value"),
    )
    return df


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main():
    sizes_m = [float(x) for x in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark(app_name="scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    for m in sizes_m:
        n = int(m * 1_000_000)
        ev = synth_events(spark, n, n_users=max(1000, n // 1000)).cache()
        ev.count()  # materialize input so operator timing excludes synth

        res = {
            "rows_millions": m,
            "latest_per_key": timed(
                latest_per_key(ev, ["user_id", "event_type"], "event_id")
            ),
            "locf": timed(
                locf(
                    ev.select(
                        "user_id",
                        "event_id",
                        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
                    ),
                    ["user_id"],
                    "event_id",
                    "pv",
                )
            ),
            "snapshot_diff": timed(
                symmetric_diff_rows(
                    latest_per_key(
                        ev.filter(F.col("event_id") <= n // 2),
                        ["user_id", "event_type"],
                        "event_id",
                    ).select("user_id", "event_type", "value"),
                    latest_per_key(ev, ["user_id", "event_type"], "event_id").select(
                        "user_id", "event_type", "value"
                    ),
                    ["user_id", "event_type", "value"],
                )
            ),
            "groupby_agg": timed(
                ev.groupBy("user_id", "event_type").agg(
                    F.sum("value"), F.count(F.lit(1))
                )
            ),
        }
        print(json.dumps(res))
        ev.unpersist()

    # exact-sum probe at the largest size: order-independent exact
    # aggregation via DECIMAL(28,6) (boxed BigDecimal buffer) vs the
    # split-long formulation (two codegen long sums) vs plain double
    # (inexact; the floor)
    n = int(sizes_m[-1] * 1_000_000)
    ex = synth_events(spark, n, n_users=1000).cache()
    ex.count()
    keys = ["user_id", "event_type"]
    dec = timed(
        ex.groupBy(*keys).agg(F.sum(F.col("value").cast("decimal(28,6)")))
    )
    # the engine's own formulation — import, don't copy, so the probe
    # keeps measuring what the engine actually runs
    from alstom_spark_cassandra_spark.workloads import _dsum_parts

    split = timed(ex.groupBy(*keys).agg(_dsum_parts(F.col("value"))))
    dbl = timed(ex.groupBy(*keys).agg(F.sum("value")))
    print(
        json.dumps(
            {
                "exact_sum_rows_millions": sizes_m[-1],
                "decimal_28_6": dec,
                "split_long": split,
                "plain_double": dbl,
            }
        )
    )
    ex.unpersist()

    # skew probe at the largest size: plain vs salted aggregation over
    # a key distribution where one user owns half the rows
    n = int(sizes_m[-1] * 1_000_000)
    sk = synth_events(spark, n, n_users=1000, skew=True).cache()
    sk.count()
    plain = timed(
        sk.groupBy("user_id").agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    salted = timed(
        salted_agg(sk, ["user_id"], {"s": ("value", "sum"), "n": ("value", "count")}, n_salts=32)
    )
    print(json.dumps({"skew_rows_millions": sizes_m[-1], "plain_agg": plain, "salted_agg": salted}))

    # interval-join probe: points into global (un-keyed) intervals.
    # The bucketed strategy's cost knob is avg(span/width): ~1-2
    # exploded rows per interval at width≈span, ~10 at width=span/10.
    from alstom_spark_cassandra_spark.operators.range_join import interval_join

    n = int(sizes_m[-1] * 1_000_000)
    span = 500_000
    pts = spark.range(n).select((F.col("id") * 1000).alias("ts")).cache()
    pts.count()
    n_iv = max(64, n // 10_000)
    step = n * 1000 // n_iv
    iv = (
        spark.range(n_iv)
        .select(
            (F.col("id") * step).alias("lo"),
            (F.col("id") * step + span).alias("hi"),
            F.col("id").alias("iid"),
        )
        .cache()
    )
    iv.count()
    wide = timed(
        interval_join(pts, iv, "ts", "lo", "hi", bucket_width=span)
        .groupBy("iid")
        .count()
    )
    narrow = timed(
        interval_join(pts, iv, "ts", "lo", "hi", bucket_width=span // 10)
        .groupBy("iid")
        .count()
    )
    print(
        json.dumps(
            {
                "interval_join_points_millions": sizes_m[-1],
                "n_intervals": n_iv,
                "bucket_eq_span": wide,
                "bucket_tenth_span": narrow,
            }
        )
    )
    pts.unpersist()
    iv.unpersist()

    # sketch probe: distinct users per type, HLL vs exact. The exact
    # path shuffles every distinct (type, user) pair; the sketch path
    # shuffles one ~2.5 KB sketch per (type, partition).
    from alstom_spark_cassandra_spark.operators.sketches import approx_distinct

    hi_card = synth_events(spark, n, n_users=max(1000, n // 10)).cache()
    hi_card.count()
    hll_t = timed(approx_distinct(hi_card, ["event_type"], "user_id"))
    exact_t = timed(
        hi_card.groupBy("event_type").agg(F.count_distinct("user_id"))
    )
    print(
        json.dumps(
            {
                "distinct_rows_millions": sizes_m[-1],
                "hll_sketch": hll_t,
                "exact_count_distinct": exact_t,
            }
        )
    )
    hi_card.unpersist()

    # round-4 ops: domain cap, deterministic shuffle, chunk dedup —
    # all on a synthetic doc corpus (text stays tiny so the probe
    # times the operator shape, not string materialization)
    from alstom_spark_cassandra_spark.operators.chunking import chunk_dedup
    from alstom_spark_cassandra_spark.operators.sampling import (
        cap_per_group,
        deterministic_shuffle,
    )

    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64("id"), 1000).alias("source"),
            F.pmod(F.xxhash64("id", F.lit(5)), 100000).alias("n_chars"),
            # ~10% duplicated chunk texts via modulo collapse
            F.concat(
                F.lit("chunk "), (F.col("id") % (n // 10 or 1)).cast("string")
            ).alias("chunk_text"),
            (F.col("id") % 100).alias("chunk_id"),
        )
        .cache()
    )
    docs.count()
    cap_t = timed(
        cap_per_group(
            docs, ["source"], [F.col("n_chars").desc(), "doc_id"], 100
        )
    )
    shuf_t = timed(
        deterministic_shuffle(docs.select("doc_id"), "doc_id", shard_hex_chars=3)
    )
    dedup_t = timed(chunk_dedup(docs, "chunk_text", "doc_id", "chunk_id"))
    print(
        json.dumps(
            {
                "corpus_rows_millions": sizes_m[-1],
                "cap_per_group": cap_t,
                "deterministic_shuffle_4096_shards": shuf_t,
                "chunk_dedup": dedup_t,
            }
        )
    )
    docs.unpersist()

    # round-6 ops --------------------------------------------------

    # salted JOIN under forced-shuffle skew (the shape AQE's skew
    # split cannot reach): one key owns half the fact; broadcast and
    # AQE skew-join disabled for both runs so they compare the same
    # physical family. n_salts=8 keeps the replicated dim well under
    # the fact (the 32-salt oversalting loss is documented in
    # SCALE.md).
    from alstom_spark_cassandra_spark.operators.skew import salted_join

    fact = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.pmod(F.xxhash64("id"), 1_000_000))
            .cast("long")
            .alias("k"),
            F.col("id").alias("payload"),
        )
        .cache()
    )
    fact.count()
    dim = (
        spark.range(1_000_000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))
        .cache()
    )
    dim.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    salted_t = timed(
        salted_join(fact, dim, ["k"], n_salts=8).select("payload", "attr")
    )
    plain_t = timed(fact.join(dim, ["k"]).select("payload", "attr"))
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(
        json.dumps(
            {
                "salted_join_rows_millions": sizes_m[-1],
                "plain_join_no_aqe_skew": plain_t,
                "salted_join_8_salts": salted_t,
            }
        )
    )
    fact.unpersist()
    dim.unpersist()

    # bloom prefilter: member keys -> md5/xxhash filter -> pure-map
    # candidate pass over the fact, vs the plain semi-join floor
    from alstom_spark_cassandra_spark.operators.sketches import (
        bloom_build,
        bloom_prefilter,
    )

    bf = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), 1_000_000).cast("string").alias("key"),
            F.col("id").alias("v"),
        )
        .cache()
    )
    bf.count()
    bkeys = (
        spark.range(10_000)
        .select((F.col("id") * 97 % 1_000_000).cast("string").alias("key"))
        .distinct()
        .cache()
    )
    bkeys.count()
    res = {"bloom_rows_millions": sizes_m[-1]}
    for portable, tag in ((True, "md5_portable"), (False, "xxhash64")):
        t0 = time.time()
        bl = bloom_build(bkeys, "key", depth=4, width=65536,
                         portable=portable)
        n_cand = bloom_prefilter(
            bf, bl, "key", depth=4, width=65536, portable=portable
        ).count()
        res[tag] = round(time.time() - t0, 2)
        res[f"{tag}_candidates"] = n_cand
    t0 = time.time()
    res["exact_semijoin_members"] = bf.join(bkeys, "key", "left_semi").count()
    res["exact_semijoin"] = round(time.time() - t0, 2)
    print(json.dumps(res))
    bf.unpersist()
    bkeys.unpersist()

    # persisted positional index: phrase query from the bucketed disk
    # layout (reads only its terms' bucket dirs) vs inline rebuild
    from alstom_spark_cassandra_spark.operators.retrieval import (
        PositionalIndex,
        build_positional_postings,
        phrase_search,
        read_positional_index,
        write_positional_index,
    )

    pdocs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id") * 31 + i), F.lit(5000)),
                    )
                    for i in range(10)
                ],
                F.when(F.col("id") % 200 == 0, F.lit("w3 w17")).otherwise(
                    F.lit("w8 w9")
                ),
            ).alias("text"),
        )
        .cache()
    )
    pdocs.count()
    t0 = time.time()
    n_inline = phrase_search(
        build_positional_postings(pdocs), "w3 w17"
    ).count()
    t_inline = round(time.time() - t0, 2)
    ppath = "/tmp/scale_probe_pos_idx"
    t0 = time.time()
    write_positional_index(
        PositionalIndex(
            build_positional_postings(pdocs, n_buckets=64), 64
        ),
        ppath,
    )
    t_build = round(time.time() - t0, 2)
    idx = read_positional_index(spark, ppath)
    t0 = time.time()
    n_disk = phrase_search(idx, "w3 w17").count()
    t_disk = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "phrase_docs_millions": sizes_m[-1],
                "inline_build_and_search": t_inline,
                "index_build_write_once": t_build,
                "disk_bucket_pruned_search": t_disk,
                "matches_equal": n_inline == n_disk,
            }
        )
    )
    pdocs.unpersist()

    # IVF recall vs nprobe on a CLUSTERED corpus (the workload IVF
    # exists for — the registry's ivf_eval measures the same numbers
    # on the driver's unstructured random vectors)
    from alstom_spark_cassandra_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    k_cent, n_q, dim = 16, 20, 32
    centers = spark.range(k_cent).select(
        F.col("id").alias("c"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.cos(F.col("id") * i.cast("double") * 2.39996),
        ).alias("cv"),
    )
    vecs = (
        spark.range(n)
        .withColumn("c", F.pmod(F.col("id"), F.lit(k_cent)))
        .join(F.broadcast(centers), "c")
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                "cv", lambda x: x + (F.rand(seed=7) - F.lit(0.5)) * F.lit(0.2)
            ).alias("embedding"),
        )
        .cache()
    )
    vecs.count()
    qs = vecs.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    ).cache()
    qs.count()
    truth = cosine_topk(vecs, qs, k=10).select("query_id", "vec_id").cache()
    n_truth = truth.count()
    recalls = {}
    for nprobe in (1, 2, 4, 8, 16):
        hits = (
            ivf_topk(vecs, qs, k=10, n_centroids=k_cent, nprobe=nprobe)
            .select("query_id", "vec_id")
            .join(truth, ["query_id", "vec_id"], "left_semi")
            .count()
        )
        recalls[f"recall_at_10_nprobe_{nprobe}"] = round(hits / n_truth, 3)
    print(
        json.dumps(
            {"ivf_clustered_vecs_millions": sizes_m[-1], **recalls}
        )
    )
    vecs.unpersist()
    qs.unpersist()
    truth.unpersist()

    # bucketed-layout join (round 7, the q_bucketed_join_persisted
    # claim measured): two fact tables bucketed identically on the
    # join key joined straight from disk (no exchange on either side)
    # vs the same parquet unbucketed (full shuffle of both sides).
    # The write is the amortized cost: pay one layout shuffle at
    # ingest, then EVERY subsequent co-keyed join/agg skips its own.
    import shutil
    import tempfile

    from alstom_spark_cassandra_spark.sources.sinks import write_bucketed

    n = int(sizes_m[-1] * 1_000_000)
    buckets = 32
    base = f"{tempfile.gettempdir()}/probe_bucketed"
    shutil.rmtree(base, ignore_errors=True)
    left = spark.range(n).select(
        F.pmod(F.xxhash64("id"), n // 4).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(9)), n // 4).alias("k"),
        (F.col("id") * 3).alias("attr"),
    )
    for name, df in (("pl", left), ("pr", right)):
        df.write.mode("overwrite").parquet(f"{base}/{name}")
    t0 = time.time()
    for name, df in (("bl", left), ("br", right)):
        write_bucketed(df, f"probe_{name}", ["k"], buckets,
                       path=f"{base}/{name}")
        spark.sql(f"REFRESH TABLE probe_{name}")
    t_layout = round(time.time() - t0, 2)
    plain_l = spark.read.parquet(f"{base}/pl")
    plain_r = spark.read.parquet(f"{base}/pr")
    t_plain = timed(
        plain_l.join(plain_r.hint("merge"), "k").select("payload", "attr")
    )
    t_bucketed = timed(
        spark.table("probe_bl")
        .join(spark.table("probe_br").hint("merge"), "k")
        .select("payload", "attr")
    )
    # the layout also carries co-keyed aggregation for free
    t_bucketed_agg = timed(
        spark.table("probe_bl").groupBy("k").agg(F.sum("payload"))
    )
    t_plain_agg = timed(plain_l.groupBy("k").agg(F.sum("payload")))
    print(
        json.dumps(
            {
                "bucketed_join_rows_millions": sizes_m[-1],
                "n_buckets": buckets,
                "layout_write_once": t_layout,
                "plain_shuffle_join": t_plain,
                "bucketed_join": t_bucketed,
                "plain_agg": t_plain_agg,
                "bucketed_agg": t_bucketed_agg,
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS probe_bl")
    spark.sql("DROP TABLE IF EXISTS probe_br")

    # --- round 8: MERGE economics (daily-feed case) ----------------
    # base 10M keys vs 100k-change feed: the full-outer shuffle form
    # moves the whole base; the broadcast form scans it twice but
    # moves only the minimized feed. Locally shuffles are memory
    # copies, so the delta understates the cluster-scale win — the
    # plan shapes (pinned in tests) carry the claim; this records
    # that the broadcast form is not a local regression.
    from alstom_spark_cassandra_spark.operators import (
        apply_changes,
        apply_changes_broadcast,
    )

    n_base = int(sizes_m[-1] * 1_000_000)
    mbase = spark.range(n_base).select(
        F.col("id").alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 9973).alias("v"),
    ).cache()
    mbase.count()
    feed = spark.range(n_base, n_base + 100_000).select(
        (F.col("id") % (n_base + 50_000)).alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 997).alias("v"),
        F.when(F.col("id") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    ).cache()
    feed.count()
    t_shuffle = timed(
        apply_changes(mbase, feed, ["k"], "event_id", ["v"])
    )
    t_broadcast = timed(
        apply_changes_broadcast(mbase, feed, ["k"], "event_id", ["v"])
    )
    print(
        json.dumps(
            {
                "merge_base_rows_millions": sizes_m[-1],
                "merge_feed_rows": 100_000,
                "merge_shuffle_form": t_shuffle,
                "merge_broadcast_form": t_broadcast,
            }
        )
    )
    mbase.unpersist()
    feed.unpersist()

    # --- round-8: incremental aggregate maintenance ---------------------
    from alstom_spark_cassandra_spark.operators.ivm import (
        agg_state,
        merge_agg_deltas,
    )

    ivm_base = spark.range(int(sizes_m[-1] * 1_000_000)).select(
        (F.col("id") % 1_000_000).alias("k"),
        (F.col("id") % 9973).alias("v"),
    )
    snap = agg_state(ivm_base, ["k"], "v").cache()
    snap.count()
    ivm_deltas = spark.range(100_000).select(
        (F.col("id") * 7 % 1_000_000).alias("k"),
        (F.col("id") % 8887).alias("v"),
        F.when(F.col("id") % 11 == 0, -1).otherwise(1).alias("mult"),
    )
    t_fold = timed(merge_agg_deltas(snap, ivm_deltas, ["k"], "v"))
    print(
        json.dumps(
            {
                "ivm_base_rows_millions": sizes_m[-1],
                "ivm_snapshot_keys": 1_000_000,
                "ivm_delta_rows": 100_000,
                "ivm_fold_sec": t_fold,
            }
        )
    )
    snap.unpersist()

    # --- round-8: deletion-neighborhood fuzzy join ----------------------
    from alstom_spark_cassandra_spark.operators.fuzzy import fuzzy_pairs

    names = spark.range(1_000_000).select(
        F.col("id"),
        F.concat(F.lit("n"), (F.col("id") * 997).cast("string")).alias("s"),
    )
    t_fuzzy = timed(fuzzy_pairs(names, "id", "s", max_dist=1))
    print(
        json.dumps(
            {"fuzzy_rows_millions": 1.0, "fuzzy_d1_pairs_sec": t_fuzzy}
        )
    )

    # --- round-8: row-local text profiles (repetition, winnowing) ------
    from alstom_spark_cassandra_spark.operators.repetition import (
        repetition_stats,
    )
    from alstom_spark_cassandra_spark.operators.winnow import (
        winnow_fingerprints,
    )

    synth_docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), "
            "i -> concat('w', cast((id * 31 + i * i) % 5000 as string))))"
        ).alias("text"),
    )
    t_rep = timed(repetition_stats(synth_docs, "doc_id", "text", n=2))
    t_win = timed(
        winnow_fingerprints(
            synth_docs.filter(F.col("doc_id") < 200_000),
            "text",
            "doc_id",
        ).select(F.size("fps"))
    )
    print(
        json.dumps(
            {
                "repetition_docs_millions": 1.0,
                "repetition_sec": t_rep,
                "winnow_docs_millions": 0.2,
                "winnow_fingerprints_sec": t_win,
            }
        )
    )

    # --- round-9: language identification + composed quality filter ----
    from alstom_spark_cassandra_spark.operators.langid import (
        classify_language,
        train_char_profiles,
    )
    from alstom_spark_cassandra_spark.operators.lm_score import (
        train_bigram_lm,
    )
    from alstom_spark_cassandra_spark.operators.quality_pipeline import (
        quality_filter,
    )

    # five pseudo-languages via shifted character windows (the probe
    # times the operator shape; accuracy is the graded query's job)
    ldocs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("L"), (F.col("id") % 5).cast("string")).alias("lang"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 12), i -> "
            "substring('abcdefghijklmnopqrstuvwxyzabcd', "
            "cast((id * 7 + i * i) % 21 as int) "
            "+ cast(id % 5 as int) + 1, 4)))"
        ).alias("text"),
    )
    model = train_char_profiles(
        ldocs.filter(F.col("doc_id") % 10 == 0), "text", "lang", n=2
    )
    t_lang = timed(classify_language(ldocs, "doc_id", "text", model))
    qdocs = synth_docs.filter(F.col("doc_id") < 200_000)
    lm = train_bigram_lm(qdocs.filter(F.col("doc_id") % 10 == 0), "text")
    t_q = timed(quality_filter(qdocs, "doc_id", "text", lm))
    print(
        json.dumps(
            {
                "langid_docs_millions": 1.0,
                "langid_train_100k_classify_1m_sec": t_lang,
                "quality_filter_docs_millions": 0.2,
                "quality_filter_sec": t_q,
            }
        )
    )

    # --- round-10: salted window argmax under 50% skew ---------------
    # the window analog of the salted_agg probe above: AQE splits
    # oversized JOIN partitions but never WINDOW partitions, so a
    # 50%-hot key funnels into one reducer under the plain argmax.
    from alstom_spark_cassandra_spark.operators.skew import salted_latest

    n = int(sizes_m[-1] * 1_000_000)
    skw = synth_events(spark, n, n_users=1000, skew=True).cache()
    skw.count()
    t_plain = timed(latest_per_key(skw, ["user_id"], "event_id"))
    t_salted = timed(
        salted_latest(skw, ["user_id"], "event_id", salt_cols=["event_id"])
    )
    print(
        json.dumps(
            {
                "skew_rows_millions": sizes_m[-1],
                "plain_latest": t_plain,
                "salted_latest": t_salted,
            }
        )
    )
    skw.unpersist()

    # --- round-10: SemDeDup at two corpus sizes, cluster size fixed --
    # the paper's scaling contract: k grows with the corpus so the
    # within-cluster quadratic term stays bounded (~200 vectors per
    # cluster here). Doubling the corpus at fixed cluster size should
    # grow wall near-linearly; superlinear growth would falsify the
    # cluster-confinement claim.
    from alstom_spark_cassandra_spark.operators.similarity import (
        semantic_dedup,
    )

    def synth_emb(n_vecs: int, k: int):
        emb = spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, 15), p -> "
                f"round(cast((id % {k}) * 37 + p * 101 as double) "
                f"/ 29.0 % 7.0 "
                f"+ cast((id * 13 + p * 7) % 11 as double) / 1000.0, 6))"
            ).alias("embedding"),
        )
        init = spark.range(k).select(
            F.col("id").cast("int").alias("cid"),
            F.expr(
                "transform(sequence(0, 15), p -> "
                "round(cast(id * 37 + p * 101 as double) / 29.0 % 7.0, 6))"
            ).alias("cv"),
        )
        return emb, init

    sem = {}
    for n_vecs, k in ((100_000, 512), (200_000, 1024)):
        emb, init = synth_emb(n_vecs, k)
        emb = emb.cache()
        emb.count()
        sem[f"semantic_dedup_{n_vecs // 1000}k_k{k}"] = timed(
            semantic_dedup(emb, init, threshold=0.99, n_iters=2)
        )
        emb.unpersist()
    print(json.dumps(sem))

    # coarse-routed assignment vs flat at the same fixed centroids
    # (n_iters=0 isolates assignment+prune): flat folds k=1024
    # centroid distances per row, routed folds c + k/c ≈ 64 — the
    # O(n·√k·d) path semantic_dedup_routed grades.
    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_semantic_dedup,
    )

    emb, init = synth_emb(200_000, 1024)
    emb = emb.cache()
    emb.count()
    t_flat0 = timed(semantic_dedup(emb, init, threshold=0.99, n_iters=0))
    t_routed = timed(
        routed_semantic_dedup(emb, init, n_coarse=32, threshold=0.99)
    )
    print(
        json.dumps(
            {
                "routed_vecs": 200_000,
                "k_fine": 1024,
                "n_coarse": 32,
                "flat_assign_prune": t_flat0,
                "routed_assign_prune": t_routed,
            }
        )
    )
    emb.unpersist()

    # --- round-10: fused curation pipeline (corpus_pipeline.curate) --
    # same 200k-doc shape as the quality_filter probe above, plus a
    # 5-language label for the lang-id stage; the delta over the bare
    # quality_filter number is the cost of lang-id + dedup + split
    # riding the fused three-scan plan.
    from alstom_spark_cassandra_spark.operators.corpus_pipeline import curate

    cdocs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("L"), (F.col("id") % 5).cast("string")).alias(
            "lang"
        ),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), i -> "
            "substring('abcdefghijklmnopqrstuvwxyzabcd', "
            "cast((id * 7 + i * i) % 21 as int) "
            "+ cast(id % 5 as int) + 1, 4)))"
        ).alias("text"),
    ).cache()
    cdocs.count()
    nb = train_char_profiles(
        cdocs.filter(F.col("doc_id") % 10 == 0), "text", "lang", n=2
    )
    clm = train_bigram_lm(cdocs.filter(F.col("doc_id") % 10 == 0), "text")
    t_cur = timed(curate(cdocs, "doc_id", "text", nb, clm, "L0"))
    print(
        json.dumps(
            {"curate_docs_millions": 0.2, "curate_sec": t_cur}
        )
    )
    cdocs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
