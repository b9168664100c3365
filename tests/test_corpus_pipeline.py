"""Fused four-stage curation pipeline (operators/corpus_pipeline):
stage-order semantics (lang → quality → dup → kept), the dedup and
split contracts, the extra_cols spine hook, and the graded query's
three-scan plan budget.

Reachability notes the tests pin: an exact duplicate of a LONG
document is caught by the quality stack's span signal first (both
copies repeat every 20-gram corpus-wide), so the 'dup' reason fires
for duplicates the span signal cannot see — short documents — and
for survivors generally ranks AFTER quality by design. And because
pred_lang is a pure function of the lang-id text, identical texts
can only diverge on the lang gate when ``langid_text`` maps them
differently (the workload's label-cipher) — tested via `cipher=True`.
"""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.corpus_pipeline import curate
from alstom_spark_cassandra_spark.operators.langid import (
    train_char_profiles,
)
from alstom_spark_cassandra_spark.operators.lm_score import (
    train_bigram_lm,
)
from alstom_spark_cassandra_spark.operators.quality_pipeline import (
    quality_filter,
)

_A = "abcdefghijklmnopqrstuvwxyz"
_P = "qwertyuiopasdfghjklzxcvbnm"

EN = "the quick brown fox jumps over the lazy dog near the river bank"
ZZ = "zzqx zzqx vvkk wwpp zzqx vvkk qqzz ppww kkvv xxqq zzvv qqxx"
SHORT = "fox dog bird"  # < 20 normalized chars: invisible to spans


def _run(spark, rows, cipher=False, **kw):
    """rows: (doc_id, lang, text). Trains both models on the corpus
    itself (lang-id on all rows, LM on doc_id % 2 = 0) and curates
    with target 'en'. With cipher=True the lang-id text is keyboard-
    permuted for the 'zz' label (the graded workload's trick), so
    identical raw texts can carry different language evidence."""
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    if cipher:
        lt = F.when(
            F.col("lang") == "zz", F.translate("text", _A, _P)
        ).otherwise(F.col("text"))
    else:
        lt = F.col("text")
    tr = df.select("doc_id", "lang", lt.alias("t"))
    nb = train_char_profiles(tr, "t", "lang", n=2)
    lm = train_bigram_lm(df.filter("doc_id % 2 = 0"), "text")
    out = curate(
        df, "doc_id", "text", nb, lm, "en",
        langid_text=lt, keep_cols=("lang",), **kw
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_stage_order_and_verdicts(spark):
    """lang fires before quality; dup fires among surviving short
    duplicates; kept rows get a split, everything else NULL."""
    rows = [
        (1, "en", EN),
        (2, "zz", ZZ),        # -> 'lang' (distinct char distribution)
        (3, "en", SHORT),     # kept (first copy)
        (4, "en", SHORT),     # same text as 3 -> 'dup'
    ]
    # a 3-word doc has 2 bigrams -> top_frac 0.5: neutralize the
    # repetition + perplexity gates so the dup flow is what's tested
    got = _run(
        spark, rows,
        max_top_frac=1.0, max_dup_frac=1.0, max_avg_nll=100.0,
    )
    assert got[1]["reason"] == "kept" and got[1]["kept"] == 1
    assert got[2]["reason"] == "lang" and got[2]["kept"] == 0
    assert got[2]["split"] is None
    assert got[3]["reason"] == "kept" and got[3]["kept"] == 1
    assert got[4]["reason"] == "dup" and got[4]["kept"] == 0
    assert got[4]["split"] is None
    assert got[1]["split"] in ("train", "eval")
    # identical texts split identically when kept; pred_lang is en
    assert got[3]["pred_lang"] == "en" and got[4]["pred_lang"] == "en"


def test_long_exact_duplicates_fall_to_span_signal(spark):
    """Both copies of a LONG duplicated text repeat every 20-gram
    corpus-wide -> the quality stack's dup_spans signal catches them
    BEFORE dedup (reason priority: quality precedes dup) — the
    documented interplay, not a bug: exact long dups never reach the
    dedup stage with default thresholds."""
    rows = [(1, "en", EN), (2, "en", EN)]
    got = _run(spark, rows, max_avg_nll=100.0)
    assert got[1]["reason"] == "dup_spans"
    assert got[2]["reason"] == "dup_spans"


def test_dup_not_charged_to_lang_dropped_copy(spark):
    """Dedup ranks within (hash, survivor-flag): a copy that failed
    the lang gate does not shadow a later surviving copy — the first
    SURVIVOR keeps, the next one is 'dup', and lang-dropped copies
    stay 'lang' (never 'dup')."""
    rows = [
        (1, "zz", SHORT),  # ciphered evidence -> 'lang'
        (2, "en", SHORT),  # first SURVIVING copy -> kept
        (3, "en", SHORT),  # second surviving copy -> 'dup'
        (4, "zz", SHORT),  # lang-dropped again: NOT 'dup'
    ]
    got = _run(
        spark, rows, cipher=True,
        max_top_frac=1.0, max_dup_frac=1.0, max_avg_nll=100.0,
    )
    assert got[1]["reason"] == "lang"
    assert got[2]["reason"] == "kept"
    assert got[3]["reason"] == "dup"
    assert got[4]["reason"] == "lang"


def test_no_evidence_doc_fails_lang_gate(spark):
    """A document with no gram evidence (shorter than the gram width)
    has NULL pred_lang -> reason 'lang', never a crash or a keep."""
    rows = [(1, "en", EN), (2, "en", "x")]
    got = _run(spark, rows, max_avg_nll=100.0)
    assert got[2]["pred_lang"] is None
    assert got[2]["reason"] == "lang" and got[2]["kept"] == 0


def test_quality_reason_passes_through(spark):
    """A surviving-language doc that fails a quality signal carries
    the quality stack's own reason name (repetition outranks spans)."""
    looping = "spam ham " * 40
    rows = [(1, "en", EN), (2, "en", looping)]
    got = _run(spark, rows, max_avg_nll=100.0)
    assert got[2]["reason"] == "repetition" and got[2]["kept"] == 0


def test_extra_cols_rejects_reserved_and_rides_spine(spark):
    """quality_filter.extra_cols: reserved names raise; legal names
    come back row-correct."""
    import pytest

    df = spark.createDataFrame(
        [(1, "en", EN)], "doc_id long, lang string, text string"
    )
    lm = train_bigram_lm(df, "text")
    with pytest.raises(ValueError, match="collides"):
        quality_filter(
            df, "doc_id", "text", lm, extra_cols={"bg": F.lit(1)}
        )
    out = quality_filter(
        df, "doc_id", "text", lm,
        extra_cols={"lang": F.col("lang"), "n2": F.length("text")},
    ).collect()[0]
    assert out["lang"] == "en" and out["n2"] == len(EN)


def test_graded_plan_reads_documents_at_most_thrice(spark):
    """The fusion's reason to exist: the naive four-operator compose
    scans the corpus 6+ times; the composed plan must read the
    documents file at most THREE times (quality spine + span probe +
    lang-id gram probe — both models and the repeated-gram set are
    eagerly materialized, their training scans run as separate
    jobs)."""
    from alstom_spark_cassandra_spark.workloads import (
        q_corpus_pipeline_v2,
    )

    out = q_corpus_pipeline_v2(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "documents.parquet" in ln
    ]
    assert len(scans) <= 3, plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
