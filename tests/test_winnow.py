"""Winnowing fingerprint tests: the paper guarantee (shared substring
of length >= k+w-1 → shared fingerprint), degenerate sizes, the
hub-fingerprint cap, and the map-only plan shape."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

BASE = (
    "The quick brown fox jumps over the lazy dog while the river "
    "flows quietly past the old mill near the stone bridge under a "
    "pale winter sky full of slow grey clouds drifting north"
)
PASTED = (
    "Completely different framing text before the copied passage. "
    "the river flows quietly past the old mill near the stone bridge "
    "and then completely different trailing text about query engines"
)
OTHER = (
    "Unrelated document discussing parquet column pruning, shuffle "
    "partitions, adaptive execution and broadcast hash joins at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, PASTED), (4, OTHER)],
        "doc_id long, text string",
    )


def _fps(df):
    return {r["doc"]: set(r["fps"]) for r in df.collect()}


@pytest.mark.parametrize("portable", [False, True])
def test_exact_dups_share_all_fingerprints(docs, portable):
    fp = _fps(winnow_fingerprints(docs, "text", "doc_id", portable=portable))
    assert fp[1] == fp[2]
    assert len(fp[1]) > 0


@pytest.mark.parametrize("portable", [False, True])
def test_shared_passage_guarantee(docs, portable):
    # docs 1 and 3 share a >= k+w-1 = 11 char run (a whole sentence),
    # so the winnowing guarantee demands at least one common
    # fingerprint; doc 4 shares no such run with doc 1.
    fp = _fps(winnow_fingerprints(docs, "text", "doc_id", portable=portable))
    assert fp[1] & fp[3]
    assert not (fp[1] & fp[4])


def test_degenerate_sizes(spark):
    rows = [
        (1, "ab"),          # shorter than k=8 -> no k-grams
        (2, "abcdefghi"),   # 2 grams < w=4 -> single global min
        (3, BASE),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = _fps(winnow_fingerprints(df, "text", "doc_id", k=8, w=4))
    assert fp[1] == set()
    assert len(fp[2]) == 1
    # density: distinct selections can never exceed the window count
    n_norm = len(" ".join(BASE.lower().split()))
    assert len(fp[3]) <= n_norm - 8 + 1 - 4 + 1


def test_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, "  " + BASE.upper().replace(" ", "   ") + " ")],
        "doc_id long, text string",
    )
    fp = _fps(winnow_fingerprints(df, "text", "doc_id"))
    assert fp[1] == fp[2]


def test_bad_params_raise(docs):
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, "text", "doc_id", w=0)


def test_overlap_pairs_find_paste_not_unrelated(docs):
    out = winnow_overlap_pairs(
        docs, "text", "doc_id", threshold=0.2, max_docs_per_fp=None
    )
    pairs = {(r.a, r.b): r.overlap for r in out.collect()}
    assert pairs[(1, 2)] == 1.0          # exact dup: full containment
    assert (1, 3) in pairs               # pasted passage detected
    assert not any(4 in p for p in pairs)  # unrelated doc pairs with no one


def test_hub_cap_only_removes_pairs(spark):
    # three exact copies: every fingerprint lives in 3 docs, so a cap
    # of 2 drops them all -> no pairs survive; uncapped finds all 3.
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, BASE)], "doc_id long, text string"
    )
    uncapped = winnow_overlap_pairs(
        df, "text", "doc_id", threshold=0.5, max_docs_per_fp=None
    )
    capped = winnow_overlap_pairs(
        df, "text", "doc_id", threshold=0.5, max_docs_per_fp=2
    )
    assert uncapped.count() == 3
    assert capped.count() == 0


def test_fingerprints_plan_is_map_only(docs):
    # fingerprinting must be a pure per-partition projection: no
    # exchange, no python evaluation in the plan.
    plan = winnow_fingerprints(docs, "text", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
