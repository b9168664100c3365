"""JSON field-state flattening: json_value -> (relative_path, value) rows.

The reference stores hierarchical field values as JSON objects keyed
by path segments ("000", "000.001", ... depth <= 3) and flattens them
procedurally: a stored function probes the nesting degree by
extracting canary paths (reference: SQL/GetJsonDegree.sql:8-27), then
per-degree WHILE loops over JSON_KEYS emit one row per leaf
(SQL/GetMessage.sql:271-355 for the diff branch, 478-563 for the
unchanged branch; scalar fallback for flat '{"000": v}' objects at
571-590).

Spark-first: parse once with `from_json` into nested MapTypes, then
`explode` per level and union the leaf levels. No degree probe is
needed — a leaf is simply a non-object value, at whatever depth it
occurs. The whole thing is one narrow (no-shuffle) pipeline of
generate+project operators, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_DEPTH = 3


def json_degree(col, max_depth: int = MAX_DEPTH):
    """Nesting degree of a json_value object: 0 for non-objects/null,
    else 1 + the deepest nested-object level (capped at max_depth).

    Parity with the reference's canary-path probe
    (SQL/GetJsonDegree.sql:8-27), but schema-free: a level exists if
    any value at the previous level re-parses as an object.
    """
    m = T.MapType(T.StringType(), T.StringType())
    parsed = F.from_json(col, m)
    degree = F.when(parsed.isNull(), F.lit(0))
    # each level is an ARRAY of maps (one per surviving subtree) —
    # never merged into one map, because sibling branches legitimately
    # reuse relative keys ('000', '001', ...) and map_concat would
    # throw DUPLICATED_MAP_KEY on them
    level = F.array(parsed)
    for d in range(1, max_depth + 1):
        if d < max_depth:
            # does any value anywhere at this level parse as an object?
            has_child = F.exists(
                level,
                lambda mp: F.exists(
                    F.map_values(mp), lambda v: F.from_json(v, m).isNotNull()
                ),
            )
            degree = degree.when(~has_child, F.lit(d))
            level = F.flatten(
                F.transform(
                    level,
                    lambda mp: F.filter(
                        F.transform(
                            F.map_values(mp), lambda v: F.from_json(v, m)
                        ),
                        lambda x: x.isNotNull(),
                    ),
                )
            )
        else:
            degree = degree.otherwise(F.lit(d))
    return degree


def flatten_json_value(
    df: DataFrame,
    json_col: str = "json_value",
    path_col: str = "relative_path",
    value_col: str = "value",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Explode a JSON object column into (relative_path, value) rows.

    Paths concatenate nested keys with '.' exactly like the reference
    ("000.001.001", SQL/GetJsonDegree.sql:10-22). Values are returned
    as doubles (the reference casts with `+0`,
    SQL/GetMessage.sql:289).
    """
    other = [c for c in df.columns if c != json_col]

    # Parse to map<string,string> per level; a nested object stays a
    # JSON string at the outer level and re-parses one level down.
    levels: list[DataFrame] = []
    cur = df.select(
        *other,
        F.lit("").alias("__prefix"),
        F.from_json(F.col(json_col), T.MapType(T.StringType(), T.StringType())).alias(
            "__obj"
        ),
    )
    for _ in range(max_depth):
        kv = cur.select(
            *other, "__prefix", F.explode_outer("__obj").alias("__k", "__v")
        ).withColumn(
            "__path",
            F.when(F.col("__prefix") == "", F.col("__k")).otherwise(
                F.concat_ws(".", "__prefix", "__k")
            ),
        )
        # Leaf: value does not parse as a JSON object.
        reparsed = kv.withColumn(
            "__child", F.from_json("__v", T.MapType(T.StringType(), T.StringType()))
        )
        leaves = reparsed.filter(
            F.col("__child").isNull() & F.col("__k").isNotNull()
        ).select(
            *other,
            F.col("__path").alias(path_col),
            # try_cast: one malformed/non-numeric leaf in a 100 TB log
            # must yield null, not an ANSI CAST_INVALID_INPUT abort
            F.col("__v").try_cast("double").alias(value_col),
        )
        levels.append(leaves)
        cur = reparsed.filter(F.col("__child").isNotNull()).select(
            *other, F.col("__path").alias("__prefix"), F.col("__child").alias("__obj")
        )

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
