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
    # EVERY query carries an oracle: approx ops graduated via the
    # exact+verdict pattern (hll_distinct_users, approx_stats),
    # full-probe equivalence (ivf_topk), portable md5 variants
    # (minhash_signatures, simhash_fingerprints), and
    # literal-hyperplane LSH (embedding_dup_pairs).
    assert set(qs) == set(oracles)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "user_id",
        "event_type",
        "last_event_id",
        "last_value",
    }
