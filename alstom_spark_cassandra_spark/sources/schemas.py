"""Declared schemas.

The reference pins schemas three ways (SURVEY.md §1.3): Java bean
encoders (reference: Java/.../DataLoader.java:508-529), Scala case-class
encoders (Scala/.../DatabaseLoad.scala:5-21), and explicit MySQL DDL
(SQL/GetMessage.sql:451-460). Here each logical table gets one
StructType constant; loaders always pass it so nothing depends on
inference and column pruning starts from a known ReadSchema.

Two families:

- DOMAIN_SCHEMAS: the reference's own data model (change log,
  message log, catalogs, snapshots). Used by the plans/ API and unit
  fixtures.
- TESTDATA_TABLES: the driver-provided TPC-H-ish tables in
  /root/testdata/sf*/ that the e2e queries and benchmarks run on.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference domain model ------------------------------------------------

# Change log: one row per field update (reference: DataLoader.java:52-136;
# Scala DatabaseLoad.scala:5). instance_message_id is the logical clock;
# iteration breaks argmax ties (DataLoader.java:65).
INSTANCE_FIELD = T.StructType(
    [
        T.StructField("uevol_field_id", T.IntegerType(), False),
        T.StructField("uevol_message_id", T.IntegerType(), True),
        T.StructField("instance_message_id", T.LongType(), False),
        T.StructField("instance_message_id_previous", T.LongType(), True),
        T.StructField("src_id", T.IntegerType(), True),
        T.StructField("dst_id", T.IntegerType(), True),
        T.StructField("relative_path", T.StringType(), True),
        T.StructField("iteration", T.IntegerType(), True),
        T.StructField("previous_value", T.LongType(), True),
        T.StructField("new_value", T.LongType(), True),
    ]
)

# Message log: wall-clock <-> message-id clock (DataLoader.java:138-213).
INSTANCE_MESSAGE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("uevol_message_id", T.IntegerType(), True),
        T.StructField("src_ty", T.IntegerType(), True),
        T.StructField("src_id", T.IntegerType(), True),
        T.StructField("dst_ty", T.IntegerType(), True),
        T.StructField("dst_id", T.IntegerType(), True),
        T.StructField("seq_nb", T.IntegerType(), True),
        T.StructField("log_time", T.LongType(), True),
        T.StructField("sync_time", T.LongType(), True),
    ]
)

# Field catalog (DataLoader.java:270-360).
UEVOL_FIELD = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("uevol_message_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("designation", T.StringType(), True),
        T.StructField("indexation", T.IntegerType(), True),
        T.StructField("type", T.IntegerType(), True),
        T.StructField("size", T.IntegerType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("enumerated", T.BooleanType(), True),
        T.StructField("playback_activated", T.BooleanType(), True),
        T.StructField("online_activated", T.BooleanType(), True),
    ]
)

# Message-type catalog (DataLoader.java:362-438).
UEVOL_MESSAGE = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("protocol", T.StringType(), True),
        T.StructField("playback_activated", T.BooleanType(), True),
        T.StructField("online_activated", T.BooleanType(), True),
    ]
)

# Equipment catalog (DataLoader.java:215-268).
UEVOL_EQUIPMENT = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("uevol_subsystem_id", T.IntegerType(), True),
        T.StructField("playback_activated", T.BooleanType(), True),
        T.StructField("online_activated", T.BooleanType(), True),
    ]
)

# Project KV config (DataLoader.java:440-471).
UEVOL_PROJECT = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

# Subsystem catalog (DataLoader.java:473-497).
UEVOL_SUBSYSTEM = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

# Snapshot index + snapshot rows (iter.-3 model, SQL/GetMessage.sql:60-70,
# 96-101). json_value holds the <=3-level nested field state.
SNAPSHOT_INDEX = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("start_instance_message_id", T.LongType(), False),
    ]
)
SNAPSHOT_ROWS = T.StructType(
    [
        T.StructField("uevol_field_id", T.IntegerType(), False),
        T.StructField("src_id", T.IntegerType(), True),
        T.StructField("dst_id", T.IntegerType(), True),
        T.StructField("instance_message_id", T.LongType(), True),
        T.StructField("json_value", T.StringType(), True),
    ]
)

DOMAIN_SCHEMAS: dict[str, T.StructType] = {
    "instance_field": INSTANCE_FIELD,
    "instance_field_replay": INSTANCE_FIELD,
    "instance_message": INSTANCE_MESSAGE,
    "instance_message_replay": INSTANCE_MESSAGE,
    "uevol_field": UEVOL_FIELD,
    "uevol_message": UEVOL_MESSAGE,
    "uevol_equipment": UEVOL_EQUIPMENT,
    "uevol_project": UEVOL_PROJECT,
    "uevol_subsystem": UEVOL_SUBSYSTEM,
    "snapshots": SNAPSHOT_INDEX,
    "snapshot_rows": SNAPSHOT_ROWS,
}

# --- driver testdata tables --------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that are always broadcast-joined.
BROADCAST_TABLES = {"region", "nation", "supplier", "customer", "part"}
