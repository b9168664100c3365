"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default:
the bench HEADLINE list).  Construction-time driver jobs (bound
resolution collects) run as part of building the DataFrame; the plan
written is the final declared plan, pre-execution (AdaptiveSparkPlan
isFinalPlan=false), which is what the plan-shape claims in
OPTIMIZATION_*.md reference: Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from alstom_spark_cassandra_spark.session import get_spark  # noqa: E402
from alstom_spark_cassandra_spark.workloads import SPARK_QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    for name in names:
        fn = SPARK_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange nodes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
