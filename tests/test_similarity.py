"""Similarity search tests: brute force exactness + IVF recall."""

import math
import random

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk,
    ivf_topk,
    search_ivf_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)
    ]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _brute_py(rows, qv, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    scored = sorted(((cos(v, qv), i) for i, v in rows), key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_cosine_topk_exact(spark, corpus):
    rows, df = corpus
    qv = rows[7][1]
    q = spark.createDataFrame([(0, qv)], "query_id long, query_vec array<double>")
    out = cosine_topk(df, q, k=5)
    got = [r.vec_id for r in out.collect()]
    assert got == _brute_py(rows, qv, 5)
    assert got[0] == 7  # self-match first


def test_ivf_topk_recall(spark, corpus):
    rows, df = corpus
    queries = [(qi, rows[qi * 13][1]) for qi in range(5)]
    q = spark.createDataFrame(queries, "query_id long, query_vec array<double>")
    exact = {qi: set(_brute_py(rows, qv, 10)) for qi, qv in queries}
    out = ivf_topk(df, q, k=10, n_centroids=8, nprobe=4)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(got.get(qi, set()) & exact[qi]) / 10 for qi, _ in queries]
    assert sum(recalls) / len(recalls) >= 0.6  # nprobe=4/8 of a gaussian ball


def test_ivf_topk_high_probe_recall_gate(spark, corpus):
    """Recall gate: recall@10 >= 0.9 vs the exact brute force at
    nprobe=6/8, and exactly 1.0 when every centroid is probed (full
    probing degenerates to the exact scan)."""
    rows, df = corpus
    queries = [(qi, rows[qi * 7][1]) for qi in range(8)]
    q = spark.createDataFrame(queries, "query_id long, query_vec array<double>")
    exact = {qi: set(_brute_py(rows, qv, 10)) for qi, qv in queries}

    out = ivf_topk(df, q, k=10, n_centroids=8, nprobe=6)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(got.get(qi, set()) & exact[qi]) / 10 for qi, _ in queries]
    assert sum(recalls) / len(recalls) >= 0.9

    full = ivf_topk(df, q, k=10, n_centroids=8, nprobe=8)
    got_full: dict[int, set] = {}
    for r in full.collect():
        got_full.setdefault(r.query_id, set()).add(r.vec_id)
    assert all(got_full[qi] == exact[qi] for qi, _ in queries)


def test_persisted_ivf_index_matches_inline(spark, corpus, tmp_path):
    rows, df = corpus
    path = str(tmp_path / "ivf")
    build_ivf_index(df, path, n_centroids=8)
    q = spark.createDataFrame(
        [(0, rows[42][1])], "query_id long, query_vec array<double>"
    )
    stored = {
        (r.query_id, r.vec_id, r.rank)
        for r in search_ivf_index(spark, path, q, k=10, nprobe=4).collect()
    }
    inline = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(df, q, k=10, n_centroids=8, nprobe=4).collect()
    }
    assert stored == inline
    # partition pruning: probing must not read every cid partition
    plan = (
        spark.read.parquet(f"{path}/assignment")
        .filter("cid = 3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def test_mean_pool_exact_and_partition_free(spark):
    from alstom_spark_cassandra_spark.operators.similarity import mean_pool
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, [1.0, -2.0]), (0, [3.0, 4.0]), (1, [0.5, 0.5])],
        "label int, embedding array<double>",
    )
    got = {
        (r.label, r.pos): r.mean_val
        for r in mean_pool(df, ["label"], "embedding").collect()
    }
    assert got[(0, 0)] == 2.0 and got[(0, 1)] == 1.0
    assert got[(1, 0)] == 0.5 and got[(1, 1)] == 0.5
    # repartitioning must not change a single bit (order-free long sums)
    got2 = {
        (r.label, r.pos): r.mean_val
        for r in mean_pool(
            df.repartition(7), ["label"], "embedding"
        ).collect()
    }
    assert got == got2


def test_kmeans_clusters_and_centroids(spark):
    from alstom_spark_cassandra_spark.operators.similarity import kmeans

    pts = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.2, 0.0]),
            (3, [10.0, 10.0]),
            (4, [10.0, 9.8]),
        ],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "cid int, cv array<double>"
    )
    assign, cents = kmeans(pts, init, n_iters=2)
    got = {r.vec_id: r.cid for r in assign.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}
    c = {(r.cid, r.pos): r.qc for r in cents.collect()}
    # centroid = quantized mean at scale 1e6
    assert c[(0, 0)] == 100_000 and c[(0, 1)] == 0
    assert c[(1, 0)] == 10_000_000 and c[(1, 1)] == 9_900_000


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from alstom_spark_cassandra_spark.operators.similarity import kmeans

    pts = spark.createDataFrame(
        [(1, [0.0]), (2, [0.4])], "vec_id long, embedding array<double>"
    )
    init = spark.createDataFrame(
        [(0, [0.1]), (1, [100.0])], "cid int, cv array<double>"
    )
    assign, cents = kmeans(pts, init, n_iters=3)
    assert {r.cid for r in assign.collect()} == {0}
    c = {r.cid: r.qc for r in cents.collect()}
    assert c[1] == 100_000_000  # never updated, never dropped
    assert c[0] == 200_000  # mean(0, 0.4) quantized


def test_kmeans_moves_points_across_iterations(spark):
    """A point initially nearer centroid A must migrate when the
    update pulls B's centroid toward it (the behavior a single
    assign-once pass cannot produce)."""
    from alstom_spark_cassandra_spark.operators.similarity import kmeans

    # line: cluster {0, 1, 2} and {7, 8, 9}; centroid B starts at 12
    pts = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate([0, 1, 2, 7, 8, 9])],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, [3.0]), (1, [12.0])], "cid int, cv array<double>"
    )
    one, _ = kmeans(pts, init, n_iters=0)
    # with the raw init, 7 sits nearer centroid 0 (dist 4 vs 5)
    assert {r.vec_id: r.cid for r in one.collect()}[3] == 0
    assign, _ = kmeans(pts, init, n_iters=2)
    got = {r.vec_id: r.cid for r in assign.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


# ---------------------------------------------------------------------------
# metadata-filtered top-k
# ---------------------------------------------------------------------------

from alstom_spark_cassandra_spark.operators.similarity import (  # noqa: E402
    cosine_topk_filtered,
)


def test_filtered_topk_respects_attribute(spark):
    """Results only ever come from the query's own label, and a rare
    label is NOT starved (post-filtering a global top-k would be)."""
    import math

    rows = []
    for i in range(50):
        ang = i * 0.1
        rows.append((i, [math.cos(ang), math.sin(ang)], 1 if i < 48 else 2))
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    queries = spark.createDataFrame(
        [(48, [1.0, 0.0], 2)],
        "query_id long, query_vec array<double>, label int",
    )
    got = cosine_topk_filtered(corpus, queries, "label", k=10).collect()
    assert {r.vec_id for r in got} == {48, 49}  # only label-2 vectors
    assert all(r.query_id == 48 for r in got)


def test_filtered_topk_plans_equi_join(spark):
    """The attribute filter must be an equi-join (BroadcastHashJoin),
    never a nested-loop with a post-filter."""
    import math

    corpus = spark.createDataFrame(
        [(i, [math.cos(i * 0.3), math.sin(i * 0.3)], i % 3) for i in range(30)],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)],
        "query_id long, query_vec array<double>, label int",
    )
    out = cosine_topk_filtered(corpus, queries, "label", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_drops_within_cluster_keep_lowest_id(spark):
    """Two tight groups, far apart: the kmeans step separates them,
    then within each cluster every vector similar (cos >= t) to a
    lower-id one is dropped — the lowest id of each duplicate group
    survives. Cross-cluster similarity is never consulted."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        semantic_dedup,
    )

    pts = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.01]),   # ~same direction as 1 -> dropped
            (3, [0.99, 0.02]),  # ~same direction as 1 -> dropped
            (4, [0.0, 5.0]),
            (5, [0.0, 4.0]),    # same direction as 4 -> dropped
        ],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 5.0])], "cid int, cv array<double>"
    )
    out = semantic_dedup(pts, init, threshold=0.95, n_iters=1)
    kept = {r.vec_id: r.kept for r in out.collect()}
    assert kept == {1: True, 2: False, 3: False, 4: True, 5: False}


def test_semantic_dedup_keeps_dissimilar_cluster_mates(spark):
    """Sharing a cluster is not enough — the cosine test decides.
    Orthogonal-ish vectors forced into one cluster all survive."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        semantic_dedup,
    )

    pts = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, [0.5, 0.5])], "cid int, cv array<double>"
    )
    out = semantic_dedup(pts, init, threshold=0.95, n_iters=1)
    assert all(r.kept for r in out.collect())
    # drop the threshold below cos(45 deg): 3 is similar to 1 -> only
    # the chain rule's "lower id exists" drops 2 and 3 (2~3 also hit)
    out2 = semantic_dedup(pts, init, threshold=0.7, n_iters=1)
    kept = {r.vec_id: r.kept for r in out2.collect()}
    assert kept == {1: True, 2: True, 3: False}


def _routed_fixture(spark):
    from pyspark.sql import functions as F

    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7), p -> "
            "round(cast((id % 8) * 37 + p * 101 as double) / 29.0 % 7.0 "
            "+ cast((id * 13 + p * 7) % 11 as double) / 100.0, 6))"
        ).alias("embedding"),
    )
    init = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    return emb, init


def test_routed_degenerate_ends_equal_flat_argmin(spark):
    """n_coarse=1 (one bucket = all fine centroids) and n_coarse=k
    (each distinct centroid buckets to itself) both reduce routing
    to the flat argmin — routed output must equal semantic_dedup
    with the same FIXED centroids (n_iters=0) row-for-row."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_semantic_dedup,
        semantic_dedup,
    )

    emb, init = _routed_fixture(spark)
    flat = sorted(
        map(
            tuple,
            semantic_dedup(emb, init, threshold=0.9, n_iters=0).collect(),
        )
    )
    for c in (1, 8):
        routed = sorted(
            map(
                tuple,
                routed_semantic_dedup(
                    emb, init, n_coarse=c, threshold=0.9
                ).collect(),
            )
        )
        assert routed == flat


def test_routed_covers_every_row_once(spark):
    """intermediate n_coarse: every input row appears exactly once,
    cid is always a fine-centroid id, and each non-empty cluster
    keeps its lowest surviving id (the SemDeDup keep rule)."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_semantic_dedup,
    )

    emb, init = _routed_fixture(spark)
    out = routed_semantic_dedup(
        emb, init, n_coarse=3, threshold=0.9
    ).collect()
    assert len(out) == 300
    assert len({r.vec_id for r in out}) == 300
    assert {r.cid for r in out} <= set(range(8))
    for cid in {r.cid for r in out}:
        members = [r for r in out if r.cid == cid]
        lowest = min(r.vec_id for r in members)
        assert next(
            r.kept for r in members if r.vec_id == lowest
        ), "lowest id per cluster must survive"


def test_routed_rejects_bad_inputs(spark):
    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_semantic_dedup,
    )
    import pytest

    emb, init = _routed_fixture(spark)
    with pytest.raises(ValueError):
        routed_semantic_dedup(emb, init, n_coarse=0)
    # duplicate centroids that empty a coarse bucket are rejected:
    # fine 0 and 1 identical -> fine 1 routes to coarse 0, coarse
    # bucket 1 is empty
    dup_init = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "cid int, cv array<double>",
    )
    pts = spark.createDataFrame(
        [(1, [1.0, 0.1])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        routed_semantic_dedup(pts, dup_init, n_coarse=2)


def test_routed_eval_degenerate_full_agreement(spark):
    """n_coarse=k makes routing identical to the flat argmin, so
    every agreement counter must equal n_vecs and the kept counts
    must coincide — the eval harness's own calibration point."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_dedup_eval,
    )

    emb, init = _routed_fixture(spark)
    out = routed_dedup_eval(emb, init, n_coarse=8, threshold=0.9).collect()
    assert sum(r.n_vecs for r in out) == 300
    for r in out:
        assert r.n_cid_agree == r.n_vecs
        assert r.n_kept_agree == r.n_vecs
        assert r.n_kept_flat == r.n_kept_routed


def test_routed_eval_counts_match_operator_outputs(spark):
    """Intermediate n_coarse: the eval row's counters must be exactly
    the per-cluster tallies recomputed from the two graded operators'
    own outputs (flat = semantic_dedup with n_iters=0 on the same
    fixed centroids)."""
    from collections import defaultdict

    from alstom_spark_cassandra_spark.operators.similarity import (
        routed_dedup_eval,
        routed_semantic_dedup,
        semantic_dedup,
    )

    emb, init = _routed_fixture(spark)
    flat = {
        r.vec_id: r
        for r in semantic_dedup(
            emb, init, threshold=0.9, n_iters=0
        ).collect()
    }
    routed = {
        r.vec_id: r
        for r in routed_semantic_dedup(
            emb, init, n_coarse=3, threshold=0.9
        ).collect()
    }
    exp = defaultdict(lambda: [0, 0, 0, 0, 0])
    for vid, fr in flat.items():
        rr = routed[vid]
        e = exp[fr.cid]
        e[0] += 1
        e[1] += fr.cid == rr.cid
        e[2] += fr.kept
        e[3] += rr.kept
        e[4] += fr.kept == rr.kept
    got = {
        r.cid: (
            r.n_vecs,
            r.n_cid_agree,
            r.n_kept_flat,
            r.n_kept_routed,
            r.n_kept_agree,
        )
        for r in routed_dedup_eval(
            emb, init, n_coarse=3, threshold=0.9
        ).collect()
    }
    assert got == {cid: tuple(e) for cid, e in exp.items()}


def test_incremental_semantic_dedup_contract(spark, tmp_path):
    """The steady-state contract on a hand-built geometry (threshold
    0.95 ~ 18 degrees): a shard row similar only to a DROPPED base
    row is KEPT (the persisted state is the survivor set — the
    documented difference from re-running the batch over the union),
    a shard row similar to a RETAINED representative drops, and a
    shard row similar to a lower-id shard row drops."""
    import math

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # base: 1 at 0deg keeps, 2 at 17deg drops (sim to 1); 5 keeps
    base = spark.createDataFrame(
        [(1, v(0)), (2, v(17)), (5, [0.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, v(0)), (1, [0.0, 5.0])], "cid int, cv array<double>"
    )
    path = str(tmp_path / "semidx")
    build_semantic_index(base, init, path, threshold=0.95)
    kept_ids = {
        r.id for r in spark.read.parquet(f"{path}/kept").collect()
    }
    assert kept_ids == {1, 5}

    # shard: 10 at 34deg — within 18deg of DROPPED 2, but 34deg from
    # kept 1 (cos 0.829 < 0.95) -> KEPT; 12 at 35deg — 1deg from
    # lower-id shard row 10 -> dropped (new-vs-new, kept or not);
    # 20 along kept 5 -> dropped (new-vs-kept)
    shard = spark.createDataFrame(
        [(10, v(34)), (12, v(35)), (20, [0.0, 4.2])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.cid, r.kept)
        for r in incremental_semantic_dedup(
            spark, shard, path, threshold=0.95
        ).collect()
    }
    assert out == {10: (0, True), 12: (0, False), 20: (1, False)}


def test_incremental_semantic_dedup_plan_no_base_rescan(spark):
    """Steady-state plan contract: after the index is built, the
    incremental query never rescans the base corpus — the shard
    assignment is eagerly checkpointed (ONE shard scan at call time,
    so the steady plan has ZERO embeddings FileScans), the surviving
    base vectors come from the bucketed kept index, and the centroids
    from the persisted grid collected driver-side before planning."""
    from alstom_spark_cassandra_spark.workloads import (
        q_incremental_semantic_dedup,
    )

    out = q_incremental_semantic_dedup(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "embeddings.parquet" in ln
    ]
    assert len(emb_scans) == 0, plan
    assert "semdedup_index" in plan  # the kept index IS in the plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_equals_batch_when_base_is_dup_free(spark, tmp_path):
    """Differential pin of the documented contract boundary: the
    incremental path diverges from batch-over-union ONLY through
    dropped base rows (which batch still uses as drop anchors and the
    survivor index forgets). When the base has NO internal duplicates
    — every base row is retained — and base ids precede shard ids,
    the two must agree row-for-row on the shard: kept-base = all-base
    and the lower-id rule make the candidate sets identical."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
        semantic_dedup,
    )

    # 300 base vectors in 8 tight direction groups, magnitudes spread
    # so within-group cosine ~1 but we keep threshold high enough
    # that only same-group rows collide; base uses one row per
    # (group, magnitude-step) with distinct directions per step so no
    # two BASE rows are similar, while shard rows repeat base
    # directions (cross-hits) and each other (within-shard hits)
    base = spark.range(300).selectExpr(
        "id AS vec_id",
        "array(cast(cos(id * 0.02) as double), "
        "      cast(sin(id * 0.02) as double)) AS embedding",
    )
    # id*0.02 rad steps: adjacent ids are 0.02 rad apart (cos ~0.9998)
    # -> with threshold 0.999999 (~0.0014 rad) no two base rows
    # collide. Shard: even rows sit 0.001 rad from a base direction
    # (cross-hit -> dropped), odd rows 0.01 rad from the nearest base
    # (kept), and a last block repeats kept odd rows 0.0005 rad away
    # (within-shard lower-id hit -> dropped)
    shard = (
        spark.range(50)
        .selectExpr(
            "id * 5 + 1000 AS vec_id",
            "CASE WHEN id < 40 THEN (id * 5) * 0.02"
            "       + IF(id % 2 = 0, 0.001, 0.01)"
            " ELSE ((2 * (id - 40) + 1) * 5) * 0.02 + 0.0105"
            " END AS __ang",
        )
        .selectExpr(
            "vec_id",
            "array(cast(cos(__ang) as double), "
            "      cast(sin(__ang) as double)) AS embedding",
        )
    )
    init = base.filter("vec_id < 8").selectExpr(
        "cast(vec_id as int) AS cid",
        "cast(embedding as array<double>) AS cv",
    )
    thr = 0.999999
    path = str(tmp_path / "semidx_eq")
    build_semantic_index(base, init, path, threshold=thr)
    n_kept = spark.read.parquet(f"{path}/kept").count()
    assert n_kept == 300  # precondition: base is duplicate-free

    incr = {
        r.vec_id: (r.cid, r.kept)
        for r in incremental_semantic_dedup(
            spark, shard, path, threshold=thr
        ).collect()
    }
    batch = {
        r.vec_id: (r.cid, r.kept)
        for r in semantic_dedup(
            base.unionByName(shard), init, threshold=thr, n_iters=0
        )
        .filter("vec_id >= 1000")
        .collect()
    }
    assert incr == batch
    assert len(incr) == 50
    # the test must exercise both fates or it pins nothing
    assert any(k for _, k in incr.values())
    assert any(not k for _, k in incr.values())


def test_update_index_chains_shards(spark, tmp_path):
    """The closed steady-state loop: with update_index=True shard A's
    survivors are appended to the bucketed kept table, so shard B is
    suppressed by an A-survivor WITHOUT any index rebuild — and a B
    row similar only to an A row that was itself dropped stays kept
    (survivors-only state, the same contract boundary as the base
    index)."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    base = spark.createDataFrame(
        [(1, v(0)), (5, [0.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, v(0)), (1, [0.0, 5.0])], "cid int, cv array<double>"
    )
    path = str(tmp_path / "semidx_chain")
    build_semantic_index(base, init, path, threshold=0.95)

    # shard A: 10 at 34deg keeps (far from base 1); 12 at 35deg drops
    # (1deg from lower-id A row 10)
    shard_a = spark.createDataFrame(
        [(10, v(34)), (12, v(35))],
        "vec_id long, embedding array<double>",
    )
    out_a = {
        r.vec_id: r.kept
        for r in incremental_semantic_dedup(
            spark, shard_a, path, threshold=0.95, update_index=True
        ).collect()
    }
    assert out_a == {10: True, 12: False}
    kept_ids = {
        r.id for r in spark.read.parquet(f"{path}/kept").collect()
    }
    assert kept_ids == {1, 5, 10}  # A's survivor appended, 12 not

    # shard B (all unit vectors land in cid 0 — the [0,5] centroid is
    # magnitude-far on squared-L2): 20 at 33deg drops against
    # APPENDED A-survivor 10 (1deg); 22 at 52deg is 18deg from kept
    # 10 (cos(18deg) ~ 0.9511 >= 0.95) -> drops vs 10; 24 at 71deg
    # keeps (19deg from lower-id B row 22, cos(19deg) ~ 0.9455 <
    # 0.95; 37deg from 10; 71deg from base 1)
    shard_b = spark.createDataFrame(
        [(20, v(33)), (22, v(52)), (24, v(71))],
        "vec_id long, embedding array<double>",
    )
    out_b = {
        r.vec_id: r.kept
        for r in incremental_semantic_dedup(
            spark, shard_b, path, threshold=0.95
        ).collect()
    }
    assert out_b == {20: False, 22: False, 24: True}


def test_incremental_replay_after_append_recomputes_same_verdicts(
    spark, tmp_path
):
    """The at-least-once replay guard (_incremental_prune's same-id
    exclusion): a redelivery whose previous attempt crashed AFTER
    the survivor append but BEFORE the sink's done marker re-prunes
    the batch against its own already-appended survivors — without
    the exclusion every survivor self-matches at cosine 1.0 and the
    whole batch's verdicts flip to kept=false, which the marker then
    commits permanently.  Pin: the replayed call returns verdicts
    bit-identical to the first attempt, the double-append costs
    index BYTES only (duplicate survivor rows), and a later shard
    still prunes correctly against the duplicated kept table."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    base = spark.createDataFrame(
        [(1, v(0)), (5, [0.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, v(0)), (1, [0.0, 5.0])], "cid int, cv array<double>"
    )
    path = str(tmp_path / "semidx_replay")
    build_semantic_index(base, init, path, threshold=0.95)

    # 10 at 34deg keeps (far from base 1); 12 at 35deg drops (1deg
    # from lower-id shard row 10); 20 along kept 5 drops
    shard = spark.createDataFrame(
        [(10, v(34)), (12, v(35)), (20, [0.0, 4.2])],
        "vec_id long, embedding array<double>",
    )
    want = {10: True, 12: False, 20: False}
    out1 = {
        r.vec_id: r.kept
        for r in incremental_semantic_dedup(
            spark, shard, path, threshold=0.95, update_index=True
        ).collect()
    }
    assert out1 == want
    # the crash replay: survivor 10 is already IN the kept table;
    # verdicts must not change (10 must NOT self-match and flip)
    out2 = {
        r.vec_id: r.kept
        for r in incremental_semantic_dedup(
            spark, shard, path, threshold=0.95, update_index=True
        ).collect()
    }
    assert out2 == want
    kept = spark.read.parquet(f"{path}/kept")
    assert {r.id for r in kept.collect()} == {1, 5, 10}
    assert kept.filter("id = 10").count() == 2  # bytes, not verdicts
    # a later shard against the duplicated table: 22 at 33deg drops
    # via appended survivor 10 (1deg), exactly as without the dup
    shard_b = spark.createDataFrame(
        [(22, v(33))], "vec_id long, embedding array<double>"
    )
    out_b = {
        r.vec_id: r.kept
        for r in incremental_semantic_dedup(
            spark, shard_b, path, threshold=0.95
        ).collect()
    }
    assert out_b == {22: False}


def test_routed_incremental_degenerate_equals_flat(spark, tmp_path):
    """n_coarse = k (distinct centroids): every coarse bucket is its
    own fine centroid, so the routed shard assignment reduces to the
    flat argmin and the two incremental twins must agree row-for-row
    — the routed_semantic_dedup degenerate-ends pin applied to the
    steady state."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
        routed_incremental_semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    init = (
        base.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    path = str(tmp_path / "semidx_deg")
    build_semantic_index(base, init, path, threshold=0.4)
    shard = emb.filter(F.col("vec_id") % 4 == 0)
    flat = {
        (r.vec_id, r.cid, r.kept)
        for r in incremental_semantic_dedup(
            spark, shard, path, threshold=0.4
        ).collect()
    }
    routed = {
        (r.vec_id, r.cid, r.kept)
        for r in routed_incremental_semantic_dedup(
            spark, shard, path, n_coarse=8, threshold=0.4
        ).collect()
    }
    assert flat == routed
    assert len(flat) > 0


def test_kept_index_bucketed_scan_and_reregister(spark, tmp_path):
    """The kept index is a REAL bucketed table (ADVICE r11): its scan
    reports Bucketed: true (HashPartitioning from the files — the
    ever-growing kept side never re-shuffles at read time), and after
    the catalog forgets the table (fresh-session story) _kept_df
    re-registers the external bucketed table from the index's own
    meta, preserving both results and bucketing."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        _kept_table_name,
        build_semantic_index,
        incremental_semantic_dedup,
        routed_incremental_semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    init = (
        base.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    path = str(tmp_path / "semidx_bkt")
    build_semantic_index(base, init, path, threshold=0.4)
    shard = emb.filter(F.col("vec_id") % 4 == 0)
    out = incremental_semantic_dedup(spark, shard, path, threshold=0.4)
    before = {(r.vec_id, r.cid, r.kept) for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    kept_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and _kept_table_name(path) in ln
    ]
    assert kept_scans and all("Bucketed: true" in ln for ln in kept_scans)

    spark.sql(f"DROP TABLE {_kept_table_name(path)}")
    out2 = routed_incremental_semantic_dedup(
        spark, shard, path, n_coarse=8, threshold=0.4
    )
    after = {(r.vec_id, r.cid, r.kept) for r in out2.collect()}
    assert after == before  # n_coarse=k degenerate + same index
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan2
    emb_scans = [
        ln
        for ln in plan2.splitlines()
        if "FileScan" in ln and "embeddings.parquet" in ln
    ]
    assert len(emb_scans) == 0, plan2
    assert "CartesianProduct" not in plan2
    assert "BatchEvalPython" not in plan2


def test_routed_update_index_appends_same_survivors(spark, tmp_path):
    """update_index parity between the twins at the degenerate point:
    with n_coarse = k the routed twin's verdicts equal flat, so its
    survivor APPEND must leave the index in the identical state —
    pins that _append_survivors is truly shared semantics, not two
    write paths that could drift."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
        routed_incremental_semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 >= 2)
    init = (
        base.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    shard = emb.filter(F.col("vec_id") % 4 == 0)

    p_flat = str(tmp_path / "idx_flat")
    build_semantic_index(base, init, p_flat, threshold=0.4)
    incremental_semantic_dedup(
        spark, shard, p_flat, threshold=0.4, update_index=True
    ).collect()
    flat_state = {
        (r.id, r.cid) for r in spark.read.parquet(f"{p_flat}/kept").collect()
    }

    p_routed = str(tmp_path / "idx_routed")
    build_semantic_index(base, init, p_routed, threshold=0.4)
    routed_incremental_semantic_dedup(
        spark, shard, p_routed, n_coarse=8, threshold=0.4, update_index=True
    ).collect()
    routed_state = {
        (r.id, r.cid)
        for r in spark.read.parquet(f"{p_routed}/kept").collect()
    }
    assert flat_state == routed_state
    assert len(flat_state) > 0


def test_routed_build_degenerate_equals_flat(spark, tmp_path):
    """build_semantic_index(n_coarse=k) must persist the identical
    index as the flat build (every coarse bucket is its own fine
    centroid) — the degenerate-ends pin extended to the BUILD, so the
    routed escape exists end to end (routed build, routed increments)
    without a second write path that could drift."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    init = (
        base.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    p_flat = str(tmp_path / "bidx_flat")
    p_routed = str(tmp_path / "bidx_routed")
    build_semantic_index(base, init, p_flat, threshold=0.4)
    build_semantic_index(base, init, p_routed, threshold=0.4, n_coarse=8)
    flat_state = {
        (r.id, r.cid) for r in spark.read.parquet(f"{p_flat}/kept").collect()
    }
    routed_state = {
        (r.id, r.cid)
        for r in spark.read.parquet(f"{p_routed}/kept").collect()
    }
    assert flat_state == routed_state and len(flat_state) > 0


def test_compact_semantic_index_file_mechanics(spark, tmp_path):
    """The small-files story, pinned end to end: bucket-aligned
    writes land at most ONE file per bucket per write event (build =
    1 generation, append = +1), compaction folds back to one
    generation, and neither contents, bucketing, nor steady-state
    results change across it (physical rewrite only)."""
    import glob

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        compact_semantic_index,
        incremental_semantic_dedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 >= 2)
    init = (
        base.orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    path = str(tmp_path / "cpt_idx")
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    build_semantic_index(base, init, path, threshold=0.4)

    def files():
        return glob.glob(f"{path}/kept/*.parquet")

    n_build = len(files())
    assert 0 < n_build <= n_buckets  # one generation, <=1 per bucket

    shard_a = emb.filter(F.col("vec_id") % 4 == 0)
    incremental_semantic_dedup(
        spark, shard_a, path, threshold=0.4, update_index=True
    ).collect()
    n_appended = len(files())
    assert n_build < n_appended <= 2 * n_buckets  # +1 generation

    pre = {
        (r.id, r.cid) for r in spark.read.parquet(f"{path}/kept").collect()
    }
    compact_semantic_index(spark, path)
    assert len(files()) <= n_buckets  # folded back to one generation
    assert not glob.glob(f"{path}/kept_compact_stage*")  # stage gone
    post = {
        (r.id, r.cid) for r in spark.read.parquet(f"{path}/kept").collect()
    }
    assert pre == post

    # steady state still works and still scans bucketed
    shard_b = emb.filter(F.col("vec_id") % 4 == 1)
    out = incremental_semantic_dedup(spark, shard_b, path, threshold=0.4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert out.count() > 0


def test_ivf_append_found_in_pruned_probe(spark, corpus, tmp_path):
    """Frozen-centroid ingest: a vector appended AFTER the build is
    found by a partial probe (its bucket is the query's own nearest
    centroid, so nprobe=1 must surface the identical appended vector
    at rank 1 with cosine 1), and the pruned probe still reads only
    matching cid partitions after the append."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    rows, df = corpus
    path = str(tmp_path / "ivf_app")
    build_ivf_index(df.filter(F.col("vec_id") % 2 == 0), path, n_centroids=8)
    append_ivf_index(spark, df.filter(F.col("vec_id") % 2 == 1), path)
    # query = an APPENDED (odd-id) vector, verbatim
    q = spark.createDataFrame(
        [(0, rows[41][1])], "query_id long, query_vec array<double>"
    )
    out = search_ivf_index(spark, path, q, k=5, nprobe=1)
    top = out.filter(F.col("rank") == 1).collect()[0]
    assert top.vec_id == 41 and abs(top.cosine - 1.0) < 1e-9

    plan = (
        spark.read.parquet(f"{path}/assignment")
        .filter("cid = 3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan

    # full probe over the appended index == exact brute force over
    # the WHOLE corpus (the graded contract)
    exact = _brute_py(rows, rows[41][1], 5)
    full = search_ivf_index(spark, path, q, k=5, nprobe=8)
    assert [r.vec_id for r in full.collect()] == exact


def test_kept_table_name_distinct_paths_never_collide(spark, tmp_path):
    """/tmp/a.b and /tmp/a_b flatten to the same readable prefix; the
    raw-path hash suffix must keep them distinct catalog entries —
    a collision would prune shards against the WRONG kept set with
    no error.  A quoted path must be rejected before it reaches the
    CREATE TABLE LOCATION string."""
    import pytest

    from alstom_spark_cassandra_spark.operators.similarity import (
        _kept_df,
        _kept_table_name,
    )

    assert _kept_table_name("/tmp/a.b") != _kept_table_name("/tmp/a_b")
    assert _kept_table_name("/x/y") != _kept_table_name("/x_y")
    # deterministic across calls (a later session must reconnect)
    assert _kept_table_name("/tmp/a.b") == _kept_table_name("/tmp/a.b")
    with pytest.raises(ValueError, match="quote"):
        _kept_df(spark, str(tmp_path / "bad'path"))


def test_incremental_semantic_dedup_rejects_mismatched_scale(
    spark, tmp_path
):
    """Kept vectors and the centroid grid are stored QUANTIZED at
    the build scale; an incremental call quantizing new rows on a
    different grid would silently mis-prune every comparison.  The
    meta pins the scale and both incremental twins fail loudly on a
    mismatch (the MinHash/SimHash/PQ params contract)."""
    import pytest

    from alstom_spark_cassandra_spark.operators.similarity import (
        build_semantic_index,
        incremental_semantic_dedup,
        routed_incremental_semantic_dedup,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 64)
    init = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    path = str(tmp_path / "sem_scale")
    build_semantic_index(emb, init, path, threshold=0.95, scale=6)
    meta = spark.read.parquet(f"{path}/meta").first()
    assert int(meta["scale"]) == 6
    shard = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="scale=6"):
        incremental_semantic_dedup(
            spark, shard, path, threshold=0.95, scale=5
        )
    with pytest.raises(ValueError, match="scale=6"):
        routed_incremental_semantic_dedup(
            spark, shard, path, n_coarse=2, threshold=0.95, scale=5
        )
    # the matching scale still works
    out = incremental_semantic_dedup(
        spark, shard, path, threshold=0.95, scale=6
    )
    assert out.count() == 64


def test_kept_df_migrates_old_flat_name_entry(spark, tmp_path):
    """Sessions upgrading across the hash-suffix fix (ADVICE r13): a
    pre-fix catalog entry under the FLAT name, pointing at the same
    kept location, is dropped when _kept_df re-registers — no
    orphaned semidx_* entries; an old-name entry for a DIFFERENT
    location is left alone (it belongs to another index)."""
    from alstom_spark_cassandra_spark.operators.similarity import (
        _kept_df,
        _kept_table_name,
        build_semantic_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    init = (
        base.orderBy("vec_id")
        .limit(4)
        .select(
            F.col("vec_id").cast("int").alias("cid"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
    )
    path = str(tmp_path / "semidx_mig")
    build_semantic_index(base, init, path, threshold=0.4)
    name = _kept_table_name(path)
    flat = "".join(c if c.isalnum() else "_" for c in path)
    old = f"semidx_{flat}"
    # simulate the pre-fix session: old flat-name entry, same files
    spark.sql(f"DROP TABLE {name}")
    spark.sql(
        f"CREATE TABLE {old} USING PARQUET LOCATION '{path}/kept'"
    )
    n = _kept_df(spark, path).count()
    assert n > 0
    assert spark.catalog.tableExists(name)
    assert not spark.catalog.tableExists(old)
    # files survived the migration (external table DROP is
    # entry-only) and a different-location old entry is untouched
    other = str(tmp_path / "otherkept")
    spark.read.parquet(f"{path}/kept").write.parquet(other)
    spark.sql(f"DROP TABLE {name}")
    spark.sql(
        f"CREATE TABLE {old} USING PARQUET LOCATION '{other}'"
    )
    assert _kept_df(spark, path).count() == n
    assert spark.catalog.tableExists(old)
    spark.sql(f"DROP TABLE {old}")
