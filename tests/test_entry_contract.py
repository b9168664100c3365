"""Driver-contract smoke tests for __spark_entry__."""

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 25
    # every oracle key is a declared query
    assert set(oracles) <= set(qs)
    # the only keys without an oracle are engine-specific-hash ops
    # whose output sets DuckDB cannot derive (xxhash64 fingerprints,
    # LSH buckets on data with no planted near-dups).
    # hll_distinct_users / approx_stats graduated via the
    # exact+verdict pattern; ivf_topk via full-probe equivalence;
    # minhash_signatures / simhash_fingerprints via portable md5
    # variants.
    assert set(qs) - set(oracles) == {"embedding_dup_pairs"}


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "user_id",
        "event_type",
        "last_event_id",
        "last_value",
    }
