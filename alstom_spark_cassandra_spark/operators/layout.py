"""Multi-dimensional data layout: Z-order (Morton) clustering.

Not present in the reference (its physical layout is whatever MySQL /
Cassandra give it); this is the data-layout arm of a 100 TB lakehouse
pipeline — the same idea as Delta's OPTIMIZE ZORDER BY or Hudi's
space-filling-curve clustering. A table queried by TWO independent
dimensions (e.g. user and time) cannot be range-sorted to serve both;
interleaving the bits of the two keys gives a single sort key whose
contiguous ranges are small RECTANGLES in (a, b) space, so a
range-partitioned, z-sorted parquet layout has tight per-file min/max
on BOTH columns and either predicate prunes files.

Everything here is integer bit arithmetic — engine-portable, so the
z-values themselves (not just downstream effects) are hard-oracle
checkable in DuckDB with the same shift/mask expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_z(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints into a
    2*bits-bit z-value (a takes the odd bit positions, b the even).
    Callers clamp/bucket their dims into [0, 2^bits) first — the
    helper does not rescale. Pure codegen'd bit ops, no shuffle."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    al, bl = a.cast("long"), b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(al, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(bl, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda x, y: x + y, terms)


def morton_z_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The DuckDB twin of morton_z, as a SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((CAST({a_expr} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
        terms.append(f"(((CAST({b_expr} AS BIGINT) >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "__z",
) -> DataFrame:
    """Range-partition by z-value and sort within partitions — the
    write-side layout step. Each output file then covers one
    contiguous z-range = a bounded rectangle in (a, b), so parquet
    footer min/max prune on EITHER dimension. The z column is kept
    (callers drop it after write if unwanted); repartitionByRange
    samples the z distribution, so skewed dims still split evenly."""
    z = morton_z(F.col(a_col), F.col(b_col), bits)
    out = df.withColumn(z_col, z)
    parts = (
        out.repartitionByRange(num_partitions, z_col)
        if num_partitions
        else out.repartitionByRange(z_col)
    )
    return parts.sortWithinPartitions(z_col)


def zorder_locality_stats(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    bucket_shift: int = 22,
) -> DataFrame:
    """Per z-range-bucket extent stats: (zbucket, n, a_min, a_max,
    b_min, b_max). A z-bucket (the top bits of the z-value — a
    stand-in for 'one output file' of zorder_repartition) covers a
    rectangle, so both extents are bounded by the bucket's rectangle
    size rather than the whole domain — the measurable locality claim
    behind z-order pruning. One map-side-partial groupBy on a derived
    integer; never more than 2^(2*bits - bucket_shift) groups."""
    z = morton_z(F.col(a_col), F.col(b_col), bits)
    return (
        df.select(
            F.shiftright(z, bucket_shift).alias("zbucket"),
            F.col(a_col).alias("a"),
            F.col(b_col).alias("b"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
    )
