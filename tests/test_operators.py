"""Unit tests for core operators on tiny in-memory frames (SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators import (
    asof_id_bounds,
    asof_snapshot_pair,
    flatten_json_value,
    latest_per_key,
    locf,
    locf_pivot,
    symmetric_diff_rows,
    unchanged_rows,
)


@pytest.fixture()
def change_log(spark):
    # (field, src, dst, path, msg_id, iteration, new_value)
    rows = [
        (1, 0, 0, "000", 10, 0, 100),
        (1, 0, 0, "000", 20, 0, 200),
        (1, 0, 0, "000", 20, 1, 250),  # tie on msg_id -> iteration wins
        (2, 0, 0, "000", 15, 0, 999),
        (2, 0, 0, "000.001", 16, 0, 55),
        (3, 1, 1, "000", 5, 0, 7),
    ]
    return spark.createDataFrame(
        rows,
        "uevol_field_id int, src_id int, dst_id int, relative_path string,"
        " instance_message_id long, iteration int, new_value long",
    )


def test_latest_per_key_argmax_and_tiebreak(change_log):
    out = latest_per_key(
        change_log,
        ["uevol_field_id", "relative_path"],
        "instance_message_id",
        ["iteration"],
    )
    got = {
        (r.uevol_field_id, r.relative_path): r.new_value for r in out.collect()
    }
    assert got[(1, "000")] == 250  # tie broken by iteration desc
    assert got[(2, "000")] == 999
    assert got[(2, "000.001")] == 55
    assert got[(3, "000")] == 7
    assert out.count() == 4  # exactly one row per key, no dup like ref's join


def test_asof_id_bounds(spark):
    msg = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 300)], "id long, log_time long"
    )
    r = asof_id_bounds(msg, start_time=120, end_time=250).collect()[0]
    assert (r.min_id, r.max_id) == (2, 3)
    # duration path: end = start + duration
    r = asof_id_bounds(msg, start_time=100, duration=60).collect()[0]
    assert (r.min_id, r.max_id) == (1, 2)
    # empty window -> nulls, not an error
    r = asof_id_bounds(msg, start_time=999).collect()[0]
    assert r.min_id is None and r.max_id is None


def test_asof_snapshot_pair(spark):
    idx = spark.createDataFrame(
        [("s0", 0), ("s1", 100), ("s2", 200)],
        "name string, start_instance_message_id long",
    )
    r = asof_snapshot_pair(idx, 150).collect()[0]
    assert (r.snap_min_name, r.snap_max_name) == ("s1", "s2")
    # exactly on a boundary: both sides pick the boundary snapshot
    r = asof_snapshot_pair(idx, 100).collect()[0]
    assert (r.snap_min_name, r.snap_max_name) == ("s1", "s1")
    # beyond the last snapshot -> snap_max is null (single-snapshot branch)
    r = asof_snapshot_pair(idx, 999).collect()[0]
    assert r.snap_min_name == "s2" and r.snap_max_name is None
    # before the first snapshot -> snap_min null, snap_max present
    # (not an empty frame)
    idx2 = spark.createDataFrame(
        [("s1", 100), ("s2", 200)], "name string, start_instance_message_id long"
    )
    r = asof_snapshot_pair(idx2, 50).collect()[0]
    assert r.snap_min_name is None and r.snap_max_name == "s1"


def test_setops_same_diff(spark):
    cols = "uevol_field_id int, json_value string"
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], cols)
    b = spark.createDataFrame([(1, "x"), (2, "Y"), (4, "w")], cols)
    names = ["uevol_field_id", "json_value"]
    same = {tuple(r) for r in unchanged_rows(a, b, names).collect()}
    diff = {tuple(r) for r in symmetric_diff_rows(a, b, names).collect()}
    assert same == {(1, "x")}
    assert diff == {(2, "y"), (2, "Y"), (3, "z"), (4, "w")}


def test_latest_state_sym_diff_equals_two_window_form(spark):
    """The fused one-pass snapshot diff (r15 optimization) must equal
    the composed latest_per_key + symmetric_diff_rows formulation as a
    multiset, including NULL values, NaN (equal to itself under both
    the groupBy-count and the null-safe-compare semantics), keys
    missing from the old snapshot, and keys whose value is unchanged."""
    from alstom_spark_cassandra_spark.operators import latest_state_sym_diff

    rows = [
        # key (k1,a): old latest v=1.0 (id 2), new latest v=2.0 (id 9)
        (1, "a", 1, 0.5), (1, "a", 2, 1.0), (1, "a", 9, 2.0),
        # key (1,b): unchanged between snapshots (latest <= cut is latest)
        (1, "b", 3, 7.0),
        # key (2,a): only after the cut -> new-only row
        (2, "a", 8, 4.0),
        # key (2,b): old latest NULL value, new latest NULL value -> equal
        (2, "b", 1, None), (2, "b", 7, None),
        # key (3,a): old NULL value, new real value -> both rows emitted
        (3, "a", 2, None), (3, "a", 6, 5.0),
        # key (3,b): NaN in both snapshots -> NaN == NaN, no diff
        (3, "b", 4, float("nan")), (3, "b", 6, float("nan")),
    ]
    df = spark.createDataFrame(rows, "k int, s string, clock long, v double")
    cut = spark.createDataFrame([(5,)], "c long")  # old snapshot: clock <= 5

    snap_a = latest_per_key(
        df.filter(F.col("clock") <= 5), ["k", "s"], "clock"
    ).select("k", "s", "v")
    snap_b = latest_per_key(df, ["k", "s"], "clock").select("k", "s", "v")
    want = sorted(
        (r.k, r.s, str(r.v))
        for r in symmetric_diff_rows(snap_a, snap_b, ["k", "s", "v"]).collect()
    )
    got = sorted(
        (r.k, r.s, str(r.v))
        for r in latest_state_sym_diff(df, ["k", "s"], "clock", "v", cut).collect()
    )
    assert got == want
    # the interesting cells are actually exercised
    assert (1, "a", "1.0") in got and (1, "a", "2.0") in got  # changed
    assert (2, "a", "4.0") in got  # new-only key
    assert (3, "a", "None") in got and (3, "a", "5.0") in got  # NULL -> real
    assert not any(k == 3 and s == "b" for k, s, _ in got)  # NaN stable
    # fused plan shape: no window, single keyed aggregation
    plan = latest_state_sym_diff(
        df, ["k", "s"], "clock", "v", cut
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_flatten_json_depths(spark):
    df = spark.createDataFrame(
        [
            (1, '{"000": 7}'),  # depth 1 (scalar field)
            (2, '{"000": {"001": 5, "002": 6}}'),  # depth 2
            (3, '{"000": {"001": {"001": 9}}}'),  # depth 3
            (4, None),  # null json -> no rows
        ],
        "uevol_field_id int, json_value string",
    )
    out = flatten_json_value(df)
    got = {
        (r.uevol_field_id, r.relative_path): r.value for r in out.collect()
    }
    assert got == {
        (1, "000"): 7.0,
        (2, "000.001"): 5.0,
        (2, "000.002"): 6.0,
        (3, "000.001.001"): 9.0,
    }


def test_json_degree(spark):
    from alstom_spark_cassandra_spark.operators.json_flatten import json_degree

    df = spark.createDataFrame(
        [
            (0, None),
            (1, "7"),  # not an object
            (2, '{"000": 7}'),
            (3, '{"000": {"001": 5}}'),
            (4, '{"000": {"001": {"002": 9}}}'),
            # sibling branches reusing relative keys (the reference's
            # normal path encoding) must not crash on map merging
            (5, '{"000": {"002": 1}, "001": {"002": 2}}'),
        ],
        "id int, j string",
    )
    got = {r.id: r.d for r in df.select("id", json_degree(F.col("j")).alias("d")).collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 2}


def test_flatten_non_numeric_leaf_yields_null(spark):
    df = spark.createDataFrame(
        [(1, '{"000": "abc", "001": 5}')], "uevol_field_id int, json_value string"
    )
    got = {
        (r.uevol_field_id, r.relative_path): r.value
        for r in flatten_json_value(df).collect()
    }
    assert got == {(1, "000"): None, (1, "001"): 5.0}


def test_cosine_zero_vector_yields_null(spark):
    from alstom_spark_cassandra_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 2.0])], "id int, a array<double>, b array<double>"
    )
    assert df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c is None


def test_replay_switch_loader(spark, tmp_path):
    from alstom_spark_cassandra_spark.sources.loader import Catalog

    base = str(tmp_path)
    spark.createDataFrame([(1,)], "x int").write.parquet(f"{base}/instance_field.parquet")
    spark.createDataFrame([(2,)], "x int").write.parquet(
        f"{base}/instance_field_replay.parquet"
    )
    live = Catalog(spark, base).instance_field.collect()[0].x
    replay = Catalog(spark, base, replay=True).instance_field.collect()[0].x
    assert (live, replay) == (1, 2)


def test_register_all_sql_path(spark):
    """The SQL API surface: registered views answer spark.sql queries
    with the same plans as the DataFrame path."""
    from alstom_spark_cassandra_spark.sources.loader import register_all

    register_all(spark, "/root/testdata/sf0.001", ["events", "region"])
    out = spark.sql(
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"
    ).collect()
    assert sum(r.n for r in out) == 1000
    assert spark.sql("SELECT count(*) AS c FROM region").collect()[0].c == 5


def test_locf_leading_nulls(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, None),
            ("a", 2, 10.0),
            ("a", 3, None),
            ("a", 4, 20.0),
            ("b", 1, 5.0),
            ("b", 2, None),
        ],
        "k string, t int, value double",
    )
    out = locf(df, ["k"], "t")
    got = {(r.k, r.t): r.value for r in out.collect()}
    assert got[("a", 1)] is None  # leading null stays null
    assert got[("a", 3)] == 10.0
    assert got[("a", 4)] == 20.0
    assert got[("b", 2)] == 5.0


def test_locf_pivot_matrix(spark):
    df = spark.createDataFrame(
        [(1, "s1", 10.0), (2, "s2", 20.0), (3, "s1", 30.0)],
        "t int, series string, value double",
    )
    out = locf_pivot(df, "t", "series", "value", series_values=["s1", "s2"])
    rows = {r.t: (r.s1, r.s2) for r in out.collect()}
    assert rows[1] == (10.0, None)
    assert rows[2] == (10.0, 20.0)
    assert rows[3] == (30.0, 20.0)


def test_locf_pivot_guard_rejects_tall_matrix(spark):
    """The dense matrix fills through ONE partition — the guard must
    refuse to build it above the order-key cap (SURVEY §7.4 trap)."""
    import pytest as _pytest

    df = spark.range(50).selectExpr(
        "id AS t", "'s1' AS series", "CAST(id AS double) AS value"
    )
    with _pytest.raises(ValueError, match="max_order_keys"):
        locf_pivot(
            df, "t", "series", "value",
            series_values=["s1"], max_order_keys=10,
        )
    # under the cap: builds fine
    out = locf_pivot(
        df.filter("t < 5"), "t", "series", "value",
        series_values=["s1"], max_order_keys=10,
    )
    assert out.count() == 5


def test_asof_join_backward_inclusive(spark):
    from alstom_spark_cassandra_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 2), (1, 5), (1, 9), (2, 4)], "k int, t long"
    )
    right = spark.createDataFrame(
        [(1, 1, 10.0), (1, 5, 50.0), (1, 7, 70.0), (3, 1, 99.0)],
        "k int, t long, v double",
    )
    out = asof_join(
        left, right, on=["k"], left_on="t", right_on="t", value_cols=["v"]
    )
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got[(1, 2)] == 10.0   # latest right at-or-before 2
    assert got[(1, 5)] == 50.0   # tie is inclusive
    assert got[(1, 9)] == 70.0
    assert got[(2, 4)] is None   # no right rows for this key
    assert len(got) == 4         # every left row survives


def test_asof_join_tiebreak_deterministic(spark):
    """Two right rows sharing (key, ord): the larger right_tiebreak
    must win, on every run, regardless of shuffle order."""
    from alstom_spark_cassandra_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5), (1, 9)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 5, 1, 10.0), (1, 5, 2, 20.0), (1, 5, 3, 30.0)],
        "k int, t long, seq int, v double",
    ).repartition(8)  # scatter the tied rows across partitions
    for _ in range(3):
        out = asof_join(
            left,
            right,
            on=["k"],
            left_on="t",
            right_on="t",
            value_cols=["v"],
            right_tiebreak="seq",
        )
        got = {(r.k, r.t): r.v for r in out.collect()}
        assert got[(1, 5)] == 30.0  # max seq among the tie
        assert got[(1, 9)] == 30.0
    assert not [c for c in out.columns if c.startswith("__")]  # helpers dropped


def test_asof_join_rejects_column_collision(spark):
    import pytest as _pytest

    from alstom_spark_cassandra_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 2, 3.0)], "k int, t long, v double")
    with _pytest.raises(ValueError):
        asof_join(df, df, on=["k"], left_on="t", right_on="t", value_cols=["v"])


def _merge_fixture(spark):
    base = spark.createDataFrame(
        [
            (1, "a", 10, 100),  # updated by seq 21
            (1, "b", 11, 110),  # deleted (latest change D at seq 23)
            (2, "a", 12, 120),  # no change -> passes through
            (2, "b", 13, 130),  # D then U: latest op wins -> updated
        ],
        "k1 long, k2 string, event_id long, v long",
    )
    changes = spark.createDataFrame(
        [
            (1, "a", 20, 200, "U"),
            (1, "a", 21, 210, "U"),   # latest for (1,a)
            (1, "b", 22, 220, "U"),
            (1, "b", 23, 0, "D"),     # latest for (1,b): tombstone
            (2, "b", 24, 0, "D"),
            (2, "b", 25, 240, "U"),   # revives (2,b) after tombstone
            (3, "a", 26, 260, "U"),   # insert: key absent from base
            (3, "b", 27, 0, "D"),     # tombstone for never-seen key
        ],
        "k1 long, k2 string, event_id long, v long, op string",
    )
    return base, changes


def test_merge_apply_all_five_fates(spark):
    from alstom_spark_cassandra_spark.operators import apply_changes

    base, changes = _merge_fixture(spark)
    out = apply_changes(
        base, changes, ["k1", "k2"], "event_id", ["v"]
    )
    got = {(r.k1, r.k2): (r.event_id, r.v) for r in out.collect()}
    assert got == {
        (1, "a"): (21, 210),  # update
        (2, "a"): (12, 120),  # untouched base row
        (2, "b"): (25, 240),  # tombstone superseded by later upsert
        (3, "a"): (26, 260),  # insert of a new key
        # (1,"b") deleted; (3,"b") tombstone for unseen key is a no-op
    }


def test_merge_latest_changes_minimizes_feed(spark):
    from alstom_spark_cassandra_spark.operators import latest_changes

    _, changes = _merge_fixture(spark)
    lc = latest_changes(changes, ["k1", "k2"], "event_id", ["v"])
    got = {(r.k1, r.k2): (r.event_id, r.v, r.op) for r in lc.collect()}
    assert got[(1, "b")] == (23, 0, "D")
    assert got[(2, "b")] == (25, 240, "U")
    assert len(got) == 5


def test_merge_apply_plan_no_extra_exchange(spark):
    """The minimized change side must reuse its groupBy partitioning
    for the full-outer join (keys identical), so the whole merge
    carries exactly TWO hash exchanges: one per input. A third would
    mean the argmax output is being reshuffled for the join."""
    from alstom_spark_cassandra_spark.operators import apply_changes

    base, changes = _merge_fixture(spark)
    out = apply_changes(
        base, changes, ["k1", "k2"], "event_id", ["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_merge_apply_broadcast_equals_shuffle_form(spark):
    from alstom_spark_cassandra_spark.operators import (
        apply_changes,
        apply_changes_broadcast,
    )

    base, changes = _merge_fixture(spark)
    a = {
        (r.k1, r.k2): (r.event_id, r.v)
        for r in apply_changes(
            base, changes, ["k1", "k2"], "event_id", ["v"]
        ).collect()
    }
    b = {
        (r.k1, r.k2): (r.event_id, r.v)
        for r in apply_changes_broadcast(
            base, changes, ["k1", "k2"], "event_id", ["v"]
        ).collect()
    }
    assert a == b and len(a) == 4


def test_merge_apply_broadcast_plan(spark):
    """The broadcast form must never shuffle or sort-merge the base:
    all three joins are broadcast-hash, and every hash exchange in
    the plan partitions the minimized FEED (the argmax), never the
    base relation."""
    from alstom_spark_cassandra_spark.operators import (
        apply_changes_broadcast,
    )

    base = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).alias("v"),
    )
    changes = spark.range(20_000, 20_100).select(
        (F.col("id") % 120).alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") % 89).alias("v"),
        F.when(F.col("id") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    out = apply_changes_broadcast(
        base, changes, ["k"], "event_id", ["v"]
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE renders initial+final plans, so count joins per rendering:
    # three broadcast-hash joins, and no shuffle join of any kind
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
