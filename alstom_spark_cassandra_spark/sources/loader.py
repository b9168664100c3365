"""Table loaders.

The reference has seven near-identical typed Cassandra loaders
(reference: Java/.../DataLoader.java:508-667) plus schema-pinned and
inferred Scala variants (Scala/.../DatabaseLoad.scala:34-81,
Retrieve_field.scala:17) and a MySQL ``replay`` switch that swaps
``instance_message``/``instance_field`` for their ``*_replay`` twins
(SQL/GetMessage.sql:17-23). Here that whole surface is one Catalog:

- parquet directories are the default physical source (the driver's
  testdata layout, TESTDATA.md);
- a Cassandra read path is kept behind the same API for deployments
  with the connector jar on the classpath (format
  "org.apache.spark.sql.cassandra") — gated, never required;
- ``replay=True`` resolves the ``*_replay`` table names exactly like
  the reference's dynamic-table-name switch.

At 100 TB the fact tables should be written partitioned (e.g.
lineitem by l_shipdate month, events by date(ts)); ``load_table``
reads whatever layout exists and Catalyst prunes partitions from the
query predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

REPLAY_SWITCHED = {"instance_field", "instance_message"}


def _resolve_replay(name: str, replay: bool) -> str:
    # SQL/GetMessage.sql:17-23 — replay flag swaps to *_replay tables.
    if replay and name in REPLAY_SWITCHED:
        return f"{name}_replay"
    return name


def load_table(
    spark: SparkSession,
    base: str,
    name: str,
    replay: bool = False,
) -> DataFrame:
    """Load one logical table.

    ``base`` is a parquet directory (``{base}/{name}.parquet``) or a
    Cassandra keyspace when prefixed ``cassandra://``.
    """
    name = _resolve_replay(name, replay)
    if base.startswith("cassandra://"):
        keyspace = base[len("cassandra://") :]
        return (
            spark.read.format("org.apache.spark.sql.cassandra")
            .options(table=name, keyspace=keyspace)
            .load()
        )
    return spark.read.parquet(f"{base}/{name}.parquet")


class Catalog:
    """Session-scoped view of one deployment (one keyspace / one sf dir).

    Mirrors the reference's DataLoader: one object that hands out lazy
    DataFrames per table (DataLoader.java:508-529), with the replay
    switch applied at resolution time.
    """

    def __init__(self, spark: SparkSession, base: str, replay: bool = False):
        self.spark = spark
        self.base = base
        self.replay = replay
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        key = _resolve_replay(name, self.replay)
        if key not in self._cache:
            self._cache[key] = load_table(self.spark, self.base, name, self.replay)
        return self._cache[key]

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        return self.table(name)


def register_all(spark: SparkSession, base: str, tables: list[str]) -> None:
    """createOrReplaceTempView for each table so SQL-path queries work."""
    for t in tables:
        load_table(spark, base, t).createOrReplaceTempView(t)
