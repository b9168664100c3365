"""Training-data hygiene: benchmark decontamination and PII scanning.

Two operators a pretraining pipeline runs corpus-wide before anything
else touches the data:

- **Decontamination**: drop (or flag) corpus documents that contain
  word n-grams from an evaluation benchmark, the standard test-set
  leakage guard (n-gram overlap decontamination as popularized by the
  GPT-3/C4 data papers). Shape at 100 TB: the benchmark side is tiny
  (thousands of prompts), so its distinct n-gram set BROADCASTS; the
  corpus side explodes to (doc, gram) rows that hash-join against the
  broadcast set map-side — corpus grams never shuffle, and only
  matched grams (rare) reach the per-doc count aggregation.

- **PII scan**: count/redact email / IPv4 / phone / URL patterns per
  document with JVM-side `regexp_count` / `regexp_replace` — no
  Python in the path. Patterns are deliberately RE2-compatible (no
  backrefs/lookaround) so the same pattern strings run on any
  engine, including the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_df

# RE2-compatible (and Java-regex-compatible) PII patterns
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
    "url": r"https?://[^\s]+",
}


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id_col, n_hits) per CONTAMINATED corpus document: n_hits =
    how many of the doc's distinct word n-grams appear anywhere in
    the benchmark. Clean documents do not appear (inner join) —
    anti-join the result against the corpus to keep the clean side.

    Documents shorter than n tokens contribute no grams on either
    side (they cannot contain a full n-gram, so they can neither be
    contaminated nor contaminate) — this overrides shingle_df's
    whole-text fallback, which exists for dedup where every doc must
    produce a signature.
    """
    has_n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= n
    bench_grams = (
        shingle_df(benchmark.filter(has_n_tokens), text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = shingle_df(corpus.filter(has_n_tokens), text_col, id_col, n)
    return (
        corpus_grams.join(bench_grams, "shingle")
        # shingle_df emits DISTINCT grams per doc, so plain count is
        # already a distinct-gram count
        .groupBy(F.col("doc").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """The filtering form: corpus rows whose contamination hit count
    is below `min_hits` (left_anti against the flagged set)."""
    flagged = benchmark_contamination(
        corpus, benchmark, text_col, id_col, n
    ).filter(F.col("n_hits") >= min_hits)
    return corpus.join(flagged, id_col, "left_anti")


def pii_counts(text: Column) -> Column:
    """Struct of per-pattern match counts (JVM regexp_count)."""
    return F.struct(
        *[
            F.regexp_count(text, F.lit(p)).alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ]
    )


def pii_redact(text: Column) -> Column:
    """Replace every PII match with a <TYPE> placeholder, applied in
    PII_PATTERNS order (email before phone, so digits inside an
    already-redacted email are not re-matched)."""
    out = text
    for name, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"<{name.upper()}>")
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, n_url, n_pii_total) per doc."""
    c = pii_counts(F.col(text_col))
    names = list(PII_PATTERNS)
    return df.select(
        F.col(id_col),
        *[c.getField(f"n_{name}").alias(f"n_{name}") for name in names],
    ).withColumn(
        "n_pii_total",
        sum(F.col(f"n_{name}") for name in names),
    )
