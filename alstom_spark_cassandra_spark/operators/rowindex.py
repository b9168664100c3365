"""Global stable row numbering without the single-partition sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is one of
the classic scale killers: Spark must move EVERY row into one
partition (``Exchange SinglePartition`` in the plan) and sort the
whole table on a single core.  The distributed classic replaces it
with three n-way-parallel steps:

1. ``repartitionByRange`` on the order columns — rows land in
   globally ordered partition ranges (bounds come from a sample);
2. per-partition ``row_number`` (a window PARTITIONED by the frozen
   partition id — parallel, never global);
3. add each partition's prefix-sum offset, computed from the
   per-partition counts (a num_partitions-row collect — the
   sanctioned tiny-collect pattern) and joined back broadcast.

Correctness hinges on one subtlety this module exists to get right:
the range exchange SAMPLES its bounds per execution, so the counts
job and the output job could otherwise see DIFFERENT partition
assignments — the partitioned DataFrame is therefore frozen with an
eager ``localCheckpoint`` (the graph.py precedent) before both
consumers, making the offsets provably consistent with the rows they
offset.  (The final index is independent of WHERE the sampled bounds
fall — any range partitioning yields the same total order — but the
two jobs must agree on the one actually used.)  NOTE: localCheckpoint
trades fault tolerance for speed, as documented in operators/graph.py
— cluster deployments that must survive executor loss should use a
reliable checkpoint dir.

The order must be TOTAL (include a unique tiebreaker column):
``row_number`` over tied rows is otherwise partition-order dependent
and no longer reproducible across engines or runs.

Null ordering is pinned to ASC NULLS LAST on every order column —
the ANSI / DuckDB ``ORDER BY`` default — because Spark's bare
``asc`` defaults to NULLS FIRST; leaving it unpinned would make the
index diverge from a SQL ``row_number() OVER (ORDER BY ...)`` oracle
the moment an order column is nullable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_row_index(
    df: DataFrame,
    order_cols: list,
    index_col: str = "idx",
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """All input columns plus ``index_col`` = the 0-based (or
    ``start``-based) rank of the row under the total order
    ``order_cols`` — exactly ``row_number() OVER (ORDER BY ...) - 1 +
    start``, computed with range partitioning + per-partition offsets
    instead of a single-partition global sort."""
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    cols = df.columns
    clash = {"__pid", "__rn", "__off", index_col} & set(cols)
    if clash:
        raise ValueError(
            f"global_row_index working/output columns {sorted(clash)}"
            " collide with input columns — rename the inputs"
        )
    order = [F.col(c).asc_nulls_last() for c in order_cols]
    ranged = (
        df.repartitionByRange(n, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    offsets, acc = [], start
    for pid, c in sizes:
        offsets.append((pid, acc))
        acc += c
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .select(
            *cols,
            (F.col("__off") + F.col("__rn") - 1).alias(index_col),
        )
    )


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """All input columns plus ``bucket_col`` = the 1-based NTILE
    bucket under the total order — bit-identical to SQL
    ``ntile(n) OVER (ORDER BY ...)`` (the first ``total mod n``
    buckets take the extra row), built on :func:`global_row_index`
    so the plan never funnels through a single partition.

    NTILE needs the total row count to place its bucket boundaries;
    it is attached as a broadcast 1-row scalar (the sanctioned
    cross-join pattern).  The same total-order requirement applies:
    include a unique tiebreaker or bucket membership at the
    boundaries is not reproducible."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    clash = {"__total", bucket_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"global_ntile working/output columns {sorted(clash)}"
            " collide with input columns — rename the inputs"
        )
    idx = global_row_index(
        df, order_cols, index_col="__idx", num_partitions=num_partitions
    )
    total = idx.select(F.count(F.lit(1)).alias("__total"))
    big = F.ceil(F.col("__total") / n_buckets).cast("long")   # big-bucket size
    small = (F.col("__total") / n_buckets).cast("long")       # floor
    r = F.col("__total") % n_buckets                          # # big buckets
    cut = r * big                                             # rows in them
    bucket = F.when(
        F.col("__idx") < cut, F.floor(F.col("__idx") / big)
    ).otherwise(
        # past the big buckets; guard small=0 (n_buckets > total:
        # every row lands in its own big bucket, branch unreachable)
        r + F.floor((F.col("__idx") - cut) / F.greatest(small, F.lit(1)))
    )
    cols = df.columns
    return (
        idx.crossJoin(F.broadcast(total))
        .select(*cols, (bucket + 1).cast("int").alias(bucket_col))
    )
