"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin
(DuckDB) at a given sf dir and compares:

  - row count
  - schema (sorted column names)
  - order-insensitive value multiset (exact equality per cell, which
    is strictly stronger than the driver's value hash)

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py [sf_dir] --first N   # simulate
       the driver's grading window (the first N registry entries)
       python scripts/check_oracle.py [sf_dir] --no-warmup [query ...]

A warmup no-op runs before the first graded row (batch scan + shuffle
+ one availableNow stream drain) so one-time session costs — JVM JIT,
codegen, stream-engine/state-store init, ~8-9 s on this box — stop
being charged to whichever query happens to sit in the first slot
(r9: stream_join_outer read 14.1 s when its warm cost is ~5 s; r10:
langid_scores — decompositions in SCALE.md).  Its wall time prints as
a [warmup] line, excluded from every per-query timing.  --no-warmup
skips it for quick targeted iterations where seconds don't matter.
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


def canon(v, kind=None):
    """Type-SENSITIVE canonical form: the driver canonicalizes through
    pandas, where DuckDB HUGEINT/DECIMAL surface as float64 while Spark
    longs stay int64 — so an int on one side and a float on the other
    must MISMATCH here even when numerically equal (this was the root
    cause of the 5 driver-red rows in round 1).  Each cell becomes a
    (kind, value) pair; `kind` may be forced by the oracle column type
    (see duck_kinds)."""
    from decimal import Decimal

    if v is None:
        return ("n", None)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        # pandas renders DuckDB DECIMAL as float64 (or object-Decimal);
        # either way it is NOT an int64 — float kind
        return ("f", float(v))
    if isinstance(v, float) or kind == "f":
        f = float(v)
        if f != f:
            return ("f", "NaN")
        return ("f", f + 0.0)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (datetime, date)):
        return ("d", str(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    return ("s", v) if isinstance(v, str) else ("o", v)


def duck_kinds(con, sql):
    """Per-column pandas-dtype kind for an oracle query: HUGEINT and
    DECIMAL columns land as float64 in the driver's canonicalizer, so
    flag them 'f' to reproduce the driver's type sensitivity."""
    try:
        desc = con.execute(f"DESCRIBE ({sql.rstrip().rstrip(';')})").fetchall()
    except Exception:
        return {}
    kinds = {}
    for row in desc:
        name, ctype = row[0], row[1].upper()
        if ctype in ("HUGEINT", "UHUGEINT") or ctype.startswith("DECIMAL"):
            kinds[name] = "f"
    return kinds


def multiset(rows, kinds=None):
    if kinds is None:
        kinds = [None] * (len(rows[0]) if rows else 0)
    return Counter(
        tuple(canon(v, k) for v, k in zip(row, kinds)) for row in rows
    )


def warmup(spark, sf_dir):
    """One-time session warmup: a batch scan+shuffle+collect (JIT,
    whole-stage codegen, scheduler paths) and one tiny availableNow
    streaming drain with a stateful agg (stream engine, state-store
    provider init).  Uses the 5-row region table so the work itself
    is negligible — only the fixed costs are paid here."""
    import os
    import shutil
    import tempfile
    import uuid

    t0 = time.time()
    try:
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
    except Exception as ex:  # custom sf dir without region: skip
        print(f"[warmup] skipped ({str(ex)[:80]})")
        return
    df.groupBy(df.columns[0]).count().collect()
    base = tempfile.mkdtemp(prefix="oracle_warmup_")
    try:
        src = os.path.join(base, "in")
        os.makedirs(src)
        p = f"{sf_dir}/region.parquet"
        if os.path.isdir(p):
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    shutil.copyfile(
                        os.path.join(p, f), os.path.join(src, f)
                    )
        else:
            shutil.copyfile(p, os.path.join(src, "part-0.parquet"))
        name = f"warmup_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(df.schema)
            .parquet(src)
            .groupBy()
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            # a hung warmup must not outlive warmup — it would keep
            # competing with exactly the timings it exists to protect
            # (the replay harness's own timeout contract)
            q.stop()
            print("[warmup] timed out; stream stopped")
        spark.table(name).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(f"[warmup] {time.time() - t0:.1f}s (excluded from timings)")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    do_warmup = True
    if "--no-warmup" in args:
        do_warmup = False
        args = [a for a in args if a != "--no-warmup"]
    first_n = None
    if args[:1] == ["--first"]:
        try:
            first_n = int(args[1])
        except (IndexError, ValueError):
            print(
                "usage: check_oracle.py [SF_DIR] [--first N] [QUERY ...]",
                file=sys.stderr,
            )
            sys.exit(2)
        args = args[2:]
    only = set(args)

    import __spark_entry__ as e
    from alstom_spark_cassandra_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from alstom_spark_cassandra_spark.operators import free_local_checkpoints

    if do_warmup:
        warmup(spark, sf_dir)

    qs = e.queries()
    if first_n is not None:
        qs = dict(list(qs.items())[:first_n])
    oracles = e.oracle_sql()
    oracle_cache: dict[str, tuple] = {}
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
        finally:
            # rows (if any) are on the driver — release local-checkpoint
            # results / caller-contract caches so a 136-query session
            # doesn't accumulate cached state (r5 ADVICE), including
            # when the query FAILED mid-build
            spark.catalog.clearCache()
            free_local_checkpoints(spark)
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_rows)} rows ({el:.1f}s)")
            if len(spark_rows) == 0:
                print(f"  WARNING: {name} returned 0 rows")
            continue
        # one DuckDB execution per DISTINCT oracle SQL: several rows
        # deliberately share an oracle (the BM25 inline / persisted /
        # append / compacted family all grade against
        # SQL_BM25_RETRIEVAL verbatim, ANN full-probe rows against
        # the exact-cosine SQL, ...) — re-running the identical text
        # against the identical views only re-pays the oracle's wall
        # (the unrolled-Lloyd and all-pairs oracles are the gate's
        # most expensive arms)
        try:
            sql = oracles[name]
            if sql in oracle_cache:
                duck_cols_raw, duck_rows_raw, kinds_by_name = (
                    oracle_cache[sql]
                )
            else:
                res = con.execute(sql)
                duck_cols_raw = [d[0] for d in res.description]
                duck_rows_raw = res.fetchall()
                kinds_by_name = duck_kinds(con, sql)
                oracle_cache[sql] = (
                    duck_cols_raw,
                    duck_rows_raw,
                    kinds_by_name,
                )
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"[FAIL] {name}: oracle error: {str(ex)[:200]}")
            continue
        order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
        duck_cols = [duck_cols_raw[i] for i in order]
        duck_rows = [tuple(r[i] for i in order) for r in duck_rows_raw]
        duck_col_kinds = [kinds_by_name.get(c) for c in duck_cols]

        problems = []
        if spark_cols != duck_cols:
            problems.append(f"schema: spark={spark_cols} duck={duck_cols}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            ms = multiset(spark_rows)
            md = multiset(duck_rows, duck_col_kinds)
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
