"""Language identification: gram extraction, NB scoring algebra,
argmax/tiebreak determinism, and the degenerate-document contract."""

import math

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.langid import (
    classify_language,
    train_char_profiles,
)


def _mk(spark, rows, schema="doc_id long, lang string, text string"):
    return spark.createDataFrame(rows, schema)


def test_recovers_ciphered_languages(spark):
    """Three 'languages' = three alphabets; train on one half, the
    other half must classify perfectly (disjoint character sets make
    the margins huge — this pins the machinery, not the margins)."""
    base = "the quick brown fox jumps over the lazy dog " * 3
    texts = {
        "aa": base,
        "bb": base.upper().lower().translate(
            str.maketrans("abcdefghijklmnopqrstuvwxyz",
                          "nopqrstuvwxyzabcdefghijklm")
        ),
        "cc": base.translate(
            str.maketrans("abcdefghijklmnopqrstuvwxyz",
                          "zyxwvutsrqponmlkjihgfedcba")
        ),
    }
    rows = []
    i = 0
    for lang, t in texts.items():
        for _ in range(4):
            rows.append((i, lang, t))
            i += 1
    df = _mk(spark, rows)
    model = train_char_profiles(df.filter("doc_id % 2 = 0"), "text", "lang")
    out = classify_language(df, "doc_id", "text", model)
    got = {r["doc_id"]: r["pred_lang"] for r in out.collect()}
    want = {r[0]: r[1] for r in rows}
    assert got == want


def test_score_algebra_tiny_case(spark):
    """Hand-checked NB numbers: train 'ab' under lang x, 'cd' under
    lang y; score 'ab'. Profiles: x={'ab':1}, y={'cd':1}; V=2 gram
    types; totals 1 each. score(x) = ln(2)/1 - ln(1+2); score(y) =
    0 - ln(3). x wins; hit_grams 1; n_grams 1."""
    train = _mk(spark, [(0, "x", "ab"), (1, "y", "cd")])
    model = train_char_profiles(train, "text", "lang")
    out = classify_language(
        _mk(spark, [(9, "?", "ab")]), "doc_id", "text", model
    ).collect()[0]
    assert out["pred_lang"] == "x"
    assert out["n_grams"] == 1
    assert out["hit_grams"] == 1
    want = math.log(2) - math.log(3)
    assert abs(out["avg_ll"] - want) < 1e-6


def test_tie_breaks_lexicographically(spark):
    """Two languages trained on identical text have identical
    profiles — every document scores equal under both, and the
    argmax must deterministically pick the lexicographically smaller
    language on both engines."""
    train = _mk(spark, [(0, "zz", "abab"), (1, "aa", "abab")])
    model = train_char_profiles(train, "text", "lang")
    out = classify_language(
        _mk(spark, [(9, "?", "ab")]), "doc_id", "text", model
    ).collect()[0]
    assert out["pred_lang"] == "aa"


def test_short_and_null_docs_keep_rows(spark):
    model = train_char_profiles(
        _mk(spark, [(0, "x", "abcd")]), "text", "lang"
    )
    out = {
        r["doc_id"]: r
        for r in classify_language(
            _mk(spark, [(1, "?", "a"), (2, "?", None), (3, "?", "ab")]),
            "doc_id",
            "text",
            model,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    for d in (1, 2):
        assert out[d]["pred_lang"] is None
        assert out[d]["n_grams"] == 0
        assert out[d]["avg_ll"] is None
    assert out[3]["pred_lang"] == "x"
    assert out[3]["n_grams"] == 1


def test_plan_broadcasts_model_no_python(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("lang"),
        F.when(F.col("id") % 2 == 0, F.lit("abcabcabc"))
        .otherwise(F.lit("xyzxyzxyz"))
        .alias("text"),
    )
    model = train_char_profiles(df, "text", "lang")
    out = classify_language(df, "doc_id", "text", model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert {r["doc_id"] == None for r in out.collect()} == {False}  # noqa: E711


def test_bad_gram_width(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        train_char_profiles(_mk(spark, [(0, "x", "ab")]), "text", "lang", n=0)


def test_bijection_equivariance(spark):
    """Relabeling the alphabet bijectively (same map on train AND
    score) maps gram types 1:1 and preserves every count — the NB
    scores, integer anchors, and predictions must be IDENTICAL. Pins
    that the algebra depends only on gram count structure, never on
    which characters appear."""
    rows = [
        (0, "aa", "the quick brown fox jumps"),
        (1, "bb", "pack my box with five dozen jugs"),
        (2, "aa", "how vexingly quick daft zebras jump"),
        (3, "bb", "sphinx of black quartz judge my vow"),
    ]
    phi = str.maketrans(
        "abcdefghijklmnopqrstuvwxyz", "zyxwvutsrqponmlkjihgfedcba"
    )
    mapped = [(i, lg, t.translate(phi)) for i, lg, t in rows]

    def run(data):
        df = spark.createDataFrame(
            data, "doc_id long, lang string, text string"
        )
        model = train_char_profiles(
            df.filter("doc_id % 2 = 0"), "text", "lang"
        )
        return {
            r["doc_id"]: (
                r["pred_lang"], r["n_grams"], r["hit_grams"], r["avg_ll"]
            )
            for r in classify_language(df, "doc_id", "text", model).collect()
        }

    assert run(rows) == run(mapped)


def test_reserved_id_col_raises(spark):
    import pytest as _pytest

    df = _mk(spark, [(0, "x", "ab")])
    model = train_char_profiles(df, "text", "lang")
    with _pytest.raises(ValueError, match="collides"):
        classify_language(
            df.withColumnRenamed("doc_id", "lang"), "lang", "text", model
        )
    with _pytest.raises(ValueError, match="collides"):
        train_char_profiles(
            df.withColumnRenamed("lang", "g"), "text", "g"
        )
