"""Data-quality expectations (Deequ/Great-Expectations-style checks),
Spark-first.

Not in the reference (its inputs are trusted system logs); this is the
validation gate a training-data pipeline runs before anything
downstream trusts a drop: row-level predicates, key uniqueness, and
referential integrity, each as a COUNTING check (violations are
tallied, not thrown — a 100 TB validation must report, not abort on
row one).

Scale shape:
- `check_rules`: ANY number of row predicates = ONE scan. Each rule is
  a conditional sum inside a single aggregate, so adding a rule adds a
  codegen'd expression, not a pass. The unpivot to (rule, violations)
  happens on the 1-row aggregate.
- `uniqueness_violations`: count - countDistinct over the key — one
  map-side-partial aggregation.
- `referential_violations`: one LEFT join of the child's foreign key
  against the parent's distinct keys + a conditional count — the
  equi-join shuffles once; a small parent broadcasts.

NULL semantics: an expectation is an ASSERTION — a predicate that
evaluates to NULL (unknown) counts as a violation on every engine
(`CASE WHEN cond THEN 0 ELSE 1` — both Spark and ANSI SQL route NULL
to ELSE), so nulls can never silently pass a range check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, violations, checked): every rule evaluated in one scan.

    `rules` maps rule name -> pass-predicate Column. NULL predicate
    results count as violations (see module docstring)."""
    if not rules:
        raise ValueError("at least one rule required")
    aggs = [F.count(F.lit(1)).alias("__checked")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', `{name}`" for name in rules)
    return wide.select(
        F.expr(f"stack({len(rules)}, {pairs}) as (rule, violations)"),
        F.col("__checked").alias("checked"),
    )


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct): the ANALYZE-style
    per-column profile that feeds expectations (which null checks to
    add), join planning (ndv drives broadcast decisions), and drift
    baselines. ONE aggregate over the scan — Spark plans the multi-
    column count_distinct set with a single Expand (rows × profiled
    columns before partial aggregation, still one pass over the
    data). Integer-only output, so the oracle compares exactly;
    n_distinct excludes NULL (the SQL count-distinct convention)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__ndv_{c}"))
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `__nulls_{c}`, `__ndv_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {pairs}) as (column, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def uniqueness_violations(
    df: DataFrame, keys: list[str], rule: str = "unique"
) -> DataFrame:
    """1 row (rule, violations, checked): violations = surplus rows
    beyond one per distinct key."""
    return df.agg(
        F.lit(rule).alias("rule"),
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys]))
        .cast("long")
        .alias("violations"),
        F.count(F.lit(1)).alias("checked"),
    )


def referential_violations(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    rule: str = "referential",
) -> DataFrame:
    """1 row (rule, violations, checked): child rows whose foreign key
    has no parent (NULL fks are violations — an assertion, not a SQL
    join). One left join against the parent's distinct keys."""
    p = parent.select(F.col(pk).alias("__pk")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    joined = child.select(F.col(fk).alias("__fk")).join(
        p, F.col("__fk") == F.col("__pk"), "left"
    )
    return joined.agg(
        F.lit(rule).alias("rule"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("violations"),
        F.count(F.lit(1)).alias("checked"),
    )
