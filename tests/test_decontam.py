"""Decontamination + PII scan on hand-built fixtures."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.decontam import (
    benchmark_contamination,
    decontaminate,
    pii_redact,
    pii_scan,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            # contains the benchmark 5-gram "the quick brown fox jumps"
            (1, "news said the quick brown fox jumps again today"),
            # word overlap but never 5 consecutive benchmark tokens
            (2, "the brown quick fox dog lazy jumps over nothing"),
            (3, "completely unrelated text about spark partitions"),
            # full benchmark sentence embedded -> many hits
            (4, "quote: the quick brown fox jumps over the lazy dog end"),
        ],
        "doc_id long, text string",
    )


def _benchmark(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )


def test_contamination_flags_ngram_overlap(spark):
    out = benchmark_contamination(
        _corpus(spark), _benchmark(spark), n=5
    ).collect()
    hits = {r.doc_id: r.n_hits for r in out}
    assert set(hits) == {1, 4}
    assert hits[1] == 1  # exactly the one 5-gram
    assert hits[4] == 5  # all 5 of the benchmark's 5-grams


def test_decontaminate_keeps_clean_docs(spark):
    kept = decontaminate(_corpus(spark), _benchmark(spark), n=5)
    assert {r.doc_id for r in kept.collect()} == {2, 3}


def test_contamination_broadcasts_benchmark(spark):
    plan = (
        benchmark_contamination(_corpus(spark), _benchmark(spark), n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


PII_DOC = (
    "contact alice.smith+test@example.co.uk or call +1 555 123 4567; "
    "server at 10.0.42.1, docs https://example.com/a?b=c end"
)


def test_pii_scan_counts(spark):
    df = spark.createDataFrame(
        [(1, PII_DOC), (2, "no pii here at all")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scan(df).collect()}
    r1 = rows[1]
    assert (r1.n_email, r1.n_ipv4, r1.n_phone, r1.n_url) == (1, 1, 1, 1)
    assert r1.n_pii_total == 4
    r2 = rows[2]
    assert r2.n_pii_total == 0


def test_pii_redact(spark):
    df = spark.createDataFrame([(1, PII_DOC)], "doc_id long, text string")
    red = df.select(pii_redact(F.col("text")).alias("t")).collect()[0].t
    assert "<EMAIL>" in red and "<IPV4>" in red
    assert "<PHONE>" in red and "<URL>" in red
    assert "example.co.uk" not in red
    assert "10.0.42.1" not in red
    assert "555" not in red
    assert "https://" not in red


def test_short_docs_neither_contaminate_nor_flag(spark):
    """Docs with < n tokens produce no grams on either side — the
    whole-text shingle fallback (a dedup-only behavior) must not leak
    into contamination semantics (matches the DuckDB oracle's
    len(w) >= n filter)."""
    corpus = spark.createDataFrame(
        [
            (1, "fox jumps"),  # short doc, substring of benchmark
            (2, "the quick brown fox jumps today"),
        ],
        "doc_id long, text string",
    )
    # short benchmark entry must not flag the identical short corpus doc
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "fox jumps")],
        "doc_id long, text string",
    )
    out = benchmark_contamination(corpus, bench, n=5).collect()
    hits = {r.doc_id: r.n_hits for r in out}
    assert set(hits) == {2}
    # and the filtering form keeps the short doc
    kept = decontaminate(corpus, bench, n=5)
    assert {r.doc_id for r in kept.collect()} == {1}
