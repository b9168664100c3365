"""Data-quality expectations: null semantics, one-scan rules,
uniqueness/referential counting."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.expectations import (
    check_rules,
    referential_violations,
    uniqueness_violations,
)


def test_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (10.0,)], "v double"
    )
    got = {
        r.rule: (r.violations, r.checked)
        for r in check_rules(df, {"v_small": F.col("v") < 5}).collect()
    }
    # 10.0 fails, NULL is unknown -> also a violation
    assert got["v_small"] == (2, 3)


def test_many_rules_single_scan(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], "a long, b long")
    rules = {f"r{k}": F.col("a") >= k for k in range(10)}
    out = check_rules(df, rules)
    got = {r.rule: r.violations for r in out.collect()}
    assert got == {f"r{k}": k for k in range(10)}
    # one scan: a single aggregate, no join, no second exchange chain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one global aggregate: exactly one SinglePartition exchange (the
    # plan text may render its query stage twice under AQE)
    assert plan.count("Exchange SinglePartition") <= 2
    assert "hashpartitioning" not in plan.lower()


def test_uniqueness_counts_surplus_rows(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    r = uniqueness_violations(df, ["k"], "k_unique").collect()[0]
    assert (r.rule, r.violations, r.checked) == ("k_unique", 2, 5)


def test_referential_counts_orphans_and_null_fks(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_violations(child, "fk", parent, "pk", "ref").collect()[0]
    # 99 is an orphan; NULL fk is an assertion failure too
    assert (r.rule, r.violations, r.checked) == ("ref", 2, 4)


def test_parent_duplicates_do_not_inflate_checked(spark):
    """The parent is distinct-ed before the join: duplicate parent
    keys must not fan out child rows."""
    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (1,), (1,), (2,)], "pk long")
    r = referential_violations(child, "fk", parent, "pk").collect()[0]
    assert (r.violations, r.checked) == (0, 2)


def test_table_profile_counts(spark):
    from alstom_spark_cassandra_spark.operators.expectations import (
        table_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    got = {
        r.column: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in table_profile(df).collect()
    }
    assert got["k"] == (4, 1, 2)
    assert got["s"] == (4, 1, 2)


def test_table_profile_single_pass_plan(spark):
    from alstom_spark_cassandra_spark.operators.expectations import (
        table_profile,
    )

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    plan = table_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Expand" in plan  # one pass: multi-distinct via Expand
