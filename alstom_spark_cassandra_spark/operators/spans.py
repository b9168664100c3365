"""Exact repeated-substring span detection (corpus-level).

Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022), deduplicate at the SUBSTRING level: any character
span of length >= L that occurs twice anywhere in the corpus is
redundant training signal.  Their suffix-array formulation is
single-machine; the distributed re-expression used here is the
fixed-L sliding-window identity: a repeated span of length >= L
exists exactly where a repeated L-gram starts, and the union of the
(fixed-length) L-gram intervals starting at repeated positions IS
the set of characters inside repeated spans.  So:

1. explode every document into its (position, L-gram) stream;
2. count L-grams corpus-wide (map-side partial aggregation first —
   gram frequencies are Zipfian, each task collapses its hot grams
   before the shuffle);
3. keep positions whose gram occurs >= min_count times anywhere
   (including within the same document);
4. per document, merge the fixed-length intervals with one
   lag-window pass: a position contributes min(L, gap-to-previous)
   covered characters — the standard sorted-interval union, keyed
   and partitioned by document.

Everything shuffles on (gram) or (doc) keys only; nothing is ever
all-pairs.  The join key is the RAW L-gram string, which makes the
operator exactly engine-portable (the DuckDB oracle runs the
identical relational plan).  A production deployment at 100 TB would
key the count/join on xxhash64(gram) instead — an 8-byte shuffle key
instead of an L-byte one; collisions only ever MERGE counts (never
split), so hashing can only overcount repeats — a conservative error
for a dedup filter, but an error: keep the string key wherever
bit-exactness against another engine matters.

Relation to the rest of the dedup family: winnowing (operators/
winnow.py) SAMPLES the k-gram stream (2/(w+1) density) to find
document PAIRS cheaply; this module keeps EVERY position to measure
exact repeated coverage per document — the filter's decision variable
("drop documents more than X% inside repeated spans").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def repeated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_len: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """(id_col, n_chars, n_grams, n_repeated_pos, covered_chars) per
    input row: normalized character count, L-gram count, positions
    whose L-gram repeats corpus-wide, and how many characters sit
    inside at least one repeated L-gram (the Lee-et-al. coverage
    numerator).  Rows shorter than ``min_len`` report zero grams and
    zero coverage.  Normalization (trim, lower, whitespace collapse)
    matches the winnowing fingerprints so the two dedup signals are
    comparable."""
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    L = min_len
    norm = (
        f"CASE WHEN {text_col} IS NULL THEN '' ELSE "
        f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')) END"
    )
    base = df.select(F.col(id_col).alias("doc"), F.expr(norm).alias("s"))
    sizes = base.select(
        "doc", F.length("s").cast("long").alias("n_chars")
    )
    # lambda-bind s is unnecessary here (plain column reference), but
    # the position sequence is guarded: sequence(1, n) descends when
    # n < 1, so short docs must short-circuit to an empty array
    grams = base.filter(F.length("s") >= L).select(
        "doc",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(s) - {L} + 1), "
                f"i -> substring(s, i, {L}))"
            )
        ).alias("pos0", "gram"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "gram")
    counts = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram")
    )
    rep = grams.join(counts, "gram").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    per_doc = (
        rep.withColumn("prev", F.lag("pos").over(w))
        .select(
            "doc",
            F.when(
                F.col("prev").isNull(), F.lit(L).cast("long")
            ).otherwise(
                F.least(F.lit(L).cast("long"), F.col("pos") - F.col("prev"))
            ).alias("contrib"),
        )
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_repeated_pos"),
            F.sum("contrib").alias("covered_chars"),
        )
    )
    # n_grams is a pure function of the normalized length — deriving
    # it from `sizes` saves a third full pass over the gram stream
    return (
        sizes.join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_chars",
            F.greatest(
                F.col("n_chars") - F.lit(L - 1), F.lit(0).cast("long")
            ).alias("n_grams"),
            F.coalesce("n_repeated_pos", F.lit(0)).alias("n_repeated_pos"),
            F.coalesce("covered_chars", F.lit(0)).alias("covered_chars"),
        )
    )
