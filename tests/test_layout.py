"""Z-order layout: morton bit math + write-side footer pruning."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.layout import (
    morton_z,
    morton_z_sql,
    zorder_locality_stats,
    zorder_repartition,
)


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_morton_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_z(F.col("a"), F.col("b"), 16).alias("z")
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_py(a, b), (a, b)
    # full 16+16 bit domain tops out at 2^32 - 1
    assert got[(65535, 65535)] == 2**32 - 1


def test_morton_sql_matches_spark(spark):
    """The generated DuckDB expression is the same arithmetic: run it
    through Spark's SQL parser (both dialects accept the shift/mask
    form) on a sample grid."""
    df = spark.createDataFrame(
        [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 11)],
        "a long, b long",
    )
    expr = morton_z_sql("a", "b", 16).replace("BIGINT", "LONG")
    got = df.select(
        morton_z(F.col("a"), F.col("b"), 16).alias("z1"),
        F.expr(expr).alias("z2"),
    )
    assert got.filter(F.col("z1") != F.col("z2")).count() == 0


def test_locality_stats_rectangles(spark):
    """Each z-bucket's (a, b) extents must be bounded by the bucket's
    rectangle: with bits=8 and bucket_shift=8, a bucket covers an
    8-bit z-range = a 16x16 tile of the 256x256 grid."""
    grid = spark.createDataFrame(
        [(a, b) for a in range(0, 256, 3) for b in range(0, 256, 5)],
        "a long, b long",
    )
    stats = zorder_locality_stats(
        grid, "a", "b", bits=8, bucket_shift=8
    ).collect()
    assert len(stats) > 10
    for r in stats:
        assert r.a_max - r.a_min <= 15, r
        assert r.b_max - r.b_min <= 15, r


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    """After zorder_repartition + parquet write, per-file footer
    min/max on BOTH a and b are tight: a narrow slice on EITHER
    dimension overlaps only a minority of files — the property that
    makes parquet row-group/file skipping work for two independent
    predicates at once. A single-column sort can only deliver this
    for its sort key."""
    grid = spark.createDataFrame(
        [(a, b) for a in range(128) for b in range(128)], "a long, b long"
    )
    out = str(tmp_path / "zordered")
    zorder_repartition(grid, "a", "b", bits=7, num_partitions=16).write.mode(
        "overwrite"
    ).parquet(out)

    files = [str(p) for p in (tmp_path / "zordered").glob("*.parquet")]
    assert len(files) >= 8
    extents = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        a_lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        a_hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        b_lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        b_hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        extents.append((a_lo, a_hi, b_lo, b_hi))

    def overlapping(lo, hi, dim):
        return sum(
            1
            for e in extents
            if not (e[dim * 2 + 1] < lo or e[dim * 2] > hi)
        )

    n = len(extents)
    # a 16-wide slice (1/8 of the domain) on either dim must skip
    # at least half the files
    assert overlapping(0, 15, 0) <= n / 2
    assert overlapping(0, 15, 1) <= n / 2
