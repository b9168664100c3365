"""Survey every registry row's physical plan for global-sort range
exchanges (Exchange rangepartitioning) — the r16 sweep's measurement
step (guide §2.4: an orderBy used only to make output deterministic is
an accidental shuffle; rangepartitioning additionally re-executes the
child once for bounds sampling).

Prints one line per affected query: name, count of rangepartitioning
exchanges, and total plan node count.  stream_* rows are skipped
(calling them executes the stream).

Usage: python scripts/sweep_range_sorts.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from alstom_spark_cassandra_spark.operators import (
        free_local_checkpoints,
    )
    from alstom_spark_cassandra_spark.session import get_spark
    from alstom_spark_cassandra_spark.workloads import SPARK_QUERIES

    spark = get_spark(app_name="sweep_range_sorts")
    hits = []
    clean = 0
    errs = []
    t0 = time.time()
    for name, fn in SPARK_QUERIES.items():
        if name.startswith("stream_"):
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            errs.append((name, str(ex)[:120]))
            continue
        finally:
            spark.catalog.clearCache()
            free_local_checkpoints(spark)
        n = plan.lower().count("rangepartitioning")
        if n:
            hits.append((name, n))
            print(f"RANGE {name}: {n}")
        else:
            clean += 1
    print(f"\n{len(hits)} rows with rangepartitioning, {clean} clean, "
          f"{len(errs)} errors, {time.time()-t0:.0f}s")
    for name, e in errs:
        print(f"ERR {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
