"""Testdata contract: every engine assumption about the driver's
parquet layout, asserted in ONE place.

Round 3 regenerated `events.ts` from parquet TIMESTAMP(NANOS) to
timestamp[us] and the breakage surfaced as 14 scattered query-analysis
failures. This file is the early-warning tripwire: if a future
regeneration changes a table's schema or the event-time encoding past
what sources/loader.normalize_event_time adapts to, THIS test fails
with a message naming the drift, instead of half the registry going
red.
"""

import os

import pyarrow.parquet as pq
import pytest

from alstom_spark_cassandra_spark.sources.loader import load_table

SF = "/root/testdata/sf0.001"

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    },
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice",
    },
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}

# encodings normalize_event_time knows how to canonicalize
KNOWN_TS_ENCODINGS = {"timestamp[ns]", "timestamp[us]", "timestamp[ms]", "int64"}

# dtypes the exact-arithmetic layer and the vector ops depend on
# (value drifting double->decimal, or embedding float->double, would
# silently change hashing/oracle behavior — fail loudly here instead)
CRITICAL_DTYPES = {
    "events": {"event_id": "int64", "user_id": "int64", "value": "double",
               "event_type": "string", "props": "string"},
    "lineitem": {"l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double"},
    "orders": {"o_totalprice": "double"},
    "documents": {"doc_id": "int64", "text": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64",
                   "embedding": "list<element: float>"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_table_exists_with_expected_columns(table):
    path = f"{SF}/{table}.parquet"
    assert os.path.exists(path), f"testdata table missing: {path}"
    got = set(pq.read_schema(path).names)
    want = EXPECTED_COLUMNS[table]
    assert want <= got, (
        f"{table}: columns drifted — missing {sorted(want - got)}, "
        f"present {sorted(got)}"
    )


@pytest.mark.parametrize("table", sorted(CRITICAL_DTYPES))
def test_critical_column_dtypes(table):
    schema = pq.read_schema(f"{SF}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    for col, want in CRITICAL_DTYPES[table].items():
        assert got.get(col) == want, (
            f"{table}.{col}: dtype drifted to {got.get(col)!r} "
            f"(engine assumes {want!r})"
        )


def test_embedding_dim_is_64():
    """mean_embedding's oracle and the portable LSH literals are
    generated for dim=64 — a regenerated embedding length must fail
    HERE, not as a silent Spark/oracle divergence."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    lens = {len(v) for v in t.column("embedding").to_pylist()[:50]}
    assert lens == {64}, f"embedding length drifted: {lens}"


def test_events_ts_encoding_is_adaptable():
    """The physical encoding of events.ts must be one the loader
    canonicalizes (long-ns via nanosAsLong, or a parquet timestamp).
    A new encoding here means sources/loader.normalize_event_time
    needs a new branch — fix it THERE, not per query."""
    t = str(pq.read_schema(f"{SF}/events.parquet").field("ts").type)
    assert t in KNOWN_TS_ENCODINGS, (
        f"events.ts regenerated with unrecognized encoding {t!r}; teach "
        "sources/loader.normalize_event_time to canonicalize it"
    )


def test_loaded_ts_is_canonical_epoch_ms(spark):
    """After load_table, ts must be LONG epoch-milliseconds in the
    2024 date range the workload time literals assume."""
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    # 2024-01-01 .. 2025-01-01 in epoch-ms
    assert 1_704_000_000_000 <= lo <= hi <= 1_735_700_000_000, (
        f"canonical ts out of expected epoch-ms range: [{lo}, {hi}] — "
        "encoding drift reached the loader un-adapted"
    )


def test_long_ts_unit_must_be_explicit(spark):
    """Regression (ADVICE r4): a LongType ts column's epoch unit is a
    WRITER property the schema cannot disambiguate (reference
    Cassandra = epoch-ms, driver parquet = nanosAsLong). The Cassandra
    load path passes long_unit=None unless the deployment pins
    spark.alstom.cassandra.tsUnit, and None must raise, not guess."""
    import pytest as _pytest

    from alstom_spark_cassandra_spark.sources.loader import (
        epoch_ms_expr,
        normalize_event_time,
    )

    df = spark.createDataFrame([(1581734409340,)], "ts long")
    with _pytest.raises(ValueError, match="tsUnit"):
        epoch_ms_expr(df, "ts", long_unit=None)
    with _pytest.raises(ValueError, match="unknown epoch unit"):
        epoch_ms_expr(df, "ts", long_unit="days")
    # explicit units convert correctly
    ms = normalize_event_time(df, long_unit="ms").first().ts
    assert ms == 1581734409340
    us = normalize_event_time(
        spark.createDataFrame([(1581734409340000,)], "ts long"), long_unit="us"
    ).first().ts
    assert us == 1581734409340
    ns = normalize_event_time(
        spark.createDataFrame([(1581734409340000000,)], "ts long"), long_unit="ns"
    ).first().ts
    assert ns == 1581734409340
