"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin
(DuckDB) at a given sf dir and compares:

  - row count
  - schema (sorted column names)
  - order-insensitive value multiset (exact equality per cell, which
    is strictly stronger than the driver's value hash)

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        # normalize -0.0 and NaN; exact otherwise
        if v != v:
            return "NaN"
        return v + 0.0
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def multiset(rows):
    return Counter(tuple(canon(v) for v in row) for row in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from alstom_spark_cassandra_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = sorted(df.columns)
            spark_rows = [
                tuple(row[c] for c in spark_cols) for row in df.collect()
            ]
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"[FAIL] {name}: spark error: {str(ex)[:200]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows ({el:.1f}s)")
            if len(spark_rows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in res.description]
            duck_rows_raw = res.fetchall()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"[FAIL] {name}: oracle error: {str(ex)[:200]}")
            continue
        order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
        duck_cols = [duck_cols_raw[i] for i in order]
        duck_rows = [tuple(r[i] for i in order) for r in duck_rows_raw]

        problems = []
        if spark_cols != duck_cols:
            problems.append(f"schema: spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ms, md = multiset(spark_rows), multiset(duck_rows)
            if ms != md:
                diff_s = list((ms - md).items())[:3]
                diff_d = list((md - ms).items())[:3]
                problems.append(f"values: only-spark={diff_s} only-duck={diff_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"[OK]   {name}: {len(spark_rows)} rows ({el:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, p in failures:
            print(f"  {n}: {p[:300]}")
        sys.exit(1)
    print("ALL MATCH")
    spark.stop()


if __name__ == "__main__":
    main()
