"""Composed quality filter: verdict semantics per signal, the
first-failing-reason priority, the no-evidence-passes contract, and
the graded query's two-scan plan budget."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.lm_score import (
    train_bigram_lm,
)
from alstom_spark_cassandra_spark.operators.quality_pipeline import (
    quality_filter,
)


def _verdicts(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(df.filter("doc_id % 2 = 0"), "text")
    out = quality_filter(df, "doc_id", "text", lm, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_each_signal_fires_and_normal_doc_passes(spark):
    # unique tokens within AND across docs: zero duplicated bigrams,
    # zero corpus-repeated 20-grams
    normal = lambda i: " ".join(  # noqa: E731
        f"w{i}x{j}q" for j in range(30)
    )
    looping = "spam ham " * 40                      # one bigram dominates
    # two verbatim copies of a >=20-char unique string: every 20-gram
    # repeats corpus-wide -> near-total span coverage
    dup_a = "zzyzx quux corge grault waldo fred plugh xyzzy thud"
    rows = [
        (0, normal(0)),
        (1, looping),
        (2, dup_a),
        (3, dup_a),
        (4, normal(4)),
        (5, normal(5)),
    ]
    got = _verdicts(
        spark, rows,
        max_top_frac=0.5, max_dup_frac=0.9,   # only the loop trips these
        max_dup_char_frac=0.9,
        max_avg_nll=100.0,                    # perplexity gate off
    )
    assert got[1]["reason"] == "repetition" and got[1]["kept"] == 0
    assert got[2]["reason"] == "dup_spans" and got[2]["kept"] == 0
    assert got[3]["reason"] == "dup_spans"
    assert got[0]["reason"] == "ok" and got[0]["kept"] == 1


def test_perplexity_gate_and_priority_order(spark):
    # doc 4 (in training) floods doc 0's bigrams so doc 0 scores
    # in-domain; doc 6 (in training) inflates V so a fully-unseen doc
    # converges to ln(V) > 3; doc 1 (odd id -> NOT in training) is
    # that unseen doc
    short = "a b c d e f"
    booster = "a b c d e f " * 40
    vocab_doc = " ".join(f"v{j}k" for j in range(30))
    alien = "qqq www eee rrr ttt yyy uuu iii ooo ppp"
    # fails repetition AND spans -> reason must be the FIRST in the
    # fixed order
    awful = "spam ham " * 40
    rows = [
        (0, short), (1, alien), (2, awful), (3, awful),
        (4, booster), (6, vocab_doc),
    ]
    got = _verdicts(
        spark, rows,
        max_top_frac=0.5, max_dup_frac=0.9,
        max_dup_char_frac=0.5,
        max_avg_nll=3.0,
    )
    assert got[1]["reason"] == "perplexity" and got[1]["kept"] == 0
    assert got[2]["reason"] == "repetition"   # not dup_spans
    assert got[0]["kept"] == 1 and got[0]["reason"] == "ok"


def test_no_evidence_passes(spark):
    rows = [(0, "alpha beta gamma delta"), (1, ""), (2, None), (3, "x")]
    got = _verdicts(spark, rows)
    for d in (1, 2, 3):
        assert got[d]["kept"] == 1 and got[d]["reason"] == "ok"
        assert got[d]["avg_nll"] is None
    assert set(got) == {0, 1, 2, 3}


def test_graded_plan_reads_documents_at_most_twice(spark):
    """The operator's reason to exist: the naive compose-and-join of
    the three signals scans the corpus five-plus times; the composed
    scoring plan must read the documents file at most twice (spine +
    span probe — LM model and repeated-gram set are eagerly
    materialized, their training scans run as separate jobs)."""
    from alstom_spark_cassandra_spark.workloads import (
        q_quality_filter_pipeline,
    )

    out = q_quality_filter_pipeline(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "documents.parquet" in ln
    ]
    assert len(scans) <= 2, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_composition_equals_standalone_operators(spark):
    """The two-scan fusion must be semantics-free: the pipeline's four
    audit columns equal the three standalone operators' outputs
    (rounded with the same contracts) on real driver testdata."""
    from alstom_spark_cassandra_spark.operators.lm_score import bigram_nll
    from alstom_spark_cassandra_spark.operators.repetition import (
        repetition_stats,
    )
    from alstom_spark_cassandra_spark.operators.spans import (
        repeated_span_stats,
    )
    from alstom_spark_cassandra_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lm = train_bigram_lm(docs.filter("doc_id % 2 = 0"), "text")
    got = {
        r["doc_id"]: r
        for r in quality_filter(docs, "doc_id", "text", lm).collect()
    }

    def hu(x, d):
        import math

        return None if x is None else math.floor(x * 10**d + 0.5) / 10**d

    rep = {r["doc_id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    spn = {r["doc_id"]: r for r in repeated_span_stats(docs, "doc_id", "text").collect()}
    ppl = {r["doc_id"]: r for r in bigram_nll(docs, "doc_id", "text", lm).collect()}
    assert set(got) == set(rep)
    for d, row in got.items():
        r, s, p = rep[d], spn[d], ppl[d]
        want_top = hu(r["top_gram"] / r["n_grams"], 4) if r["n_grams"] else None
        want_dup = hu(r["dup_grams"] / r["n_grams"], 4) if r["n_grams"] else None
        want_cov = hu(s["covered_chars"] / s["n_chars"], 4) if s["n_chars"] else None
        assert row["top_frac"] == want_top, d
        assert row["dup_frac"] == want_dup, d
        assert row["dup_char_frac"] == want_cov, d
        assert row["avg_nll"] == hu(p["avg_nll"], 6), d


def test_reserved_id_col_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, "a b c")], "bg long, text string")
    lm = train_bigram_lm(df, "text")
    with _pytest.raises(ValueError, match="collides"):
        quality_filter(df, "bg", "text", lm)
