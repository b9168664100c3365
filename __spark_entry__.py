"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``alstom_spark_cassandra_spark.workloads``;
this file is the thin adapter. NOTE on event time: the loader
canonicalizes whatever physical encoding ``events.ts`` carries
(TIMESTAMP(NANOS)-as-long in older testdata generations,
timestamp[us] since round 3) to long epoch-milliseconds — see
``sources/loader.normalize_event_time``. ``_prepare`` keeps
``nanosAsLong`` set so the old encoding stays readable, and pins the
session to UTC so timestamp output is canonical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from alstom_spark_cassandra_spark.workloads import ORACLE_SQL, SPARK_QUERIES

SF0001 = "/root/testdata/sf0.001"


def _prepare(spark: SparkSession) -> None:
    """Make a driver-provided session able to read any testdata
    generation: nanosAsLong keeps parquet TIMESTAMP(NANOS) readable
    (the loader canonicalizes it, like timestamp[us], to epoch-ms),
    and UTC keeps timestamp output canonical."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest value per
    (user_id, event_type) series — the engine's central argmax
    operator (SURVEY.md J3/J11)."""
    _prepare(spark)
    return SPARK_QUERIES["latest_per_key"](spark, SF0001)


def _wrap(fn: Callable) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _prepare(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+
    pipeline extensions). Each callable takes (spark, sf_dir)."""
    return {name: _wrap(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. EVERY registry query
    carries a hard oracle: the former engine-hash holdouts
    (minhash_signatures, simhash_fingerprints, embedding_dup_pairs)
    graduated in round 4 via portable md5 / literal-hyperplane
    variants, and the approximate operators ship exact companions +
    in-query accuracy verdicts."""
    return dict(ORACLE_SQL)
