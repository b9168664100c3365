"""Every workload query must at least pass Catalyst analysis at
sf0.001 — a fast tripwire that catches breakage without running the
full oracle harness."""

from alstom_spark_cassandra_spark.workloads import ORACLE_SQL, SPARK_QUERIES

SF = "/root/testdata/sf0.001"


def test_all_queries_analyze(spark):
    failures = []
    for name, fn in SPARK_QUERIES.items():
        try:
            df = fn(spark, SF)
            _ = df.schema  # forces analysis
            assert len(df.columns) > 0
        except Exception as ex:  # pragma: no cover - diagnostic path
            failures.append((name, str(ex)[:200]))
    assert not failures, failures


def test_oracles_reference_declared_queries():
    assert set(ORACLE_SQL) <= set(SPARK_QUERIES)
