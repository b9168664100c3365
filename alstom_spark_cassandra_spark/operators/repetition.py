"""Gopher-style intra-document repetition filters.

The MassiveText / Gopher quality pipeline (Rae et al. 2021) drops
documents dominated by REPEATED n-grams — looping boilerplate, SEO
keyword stuffing, template spam — using two signals this module
computes per document:

- ``top_gram``: occurrences of the document's most frequent n-gram
  ("fraction of tokens in the top n-gram" once divided by the count);
- ``dup_grams``: total occurrences of n-grams appearing 2+ times
  ("fraction of duplicated n-grams").

A bag-of-words rarity score and the bigram LM (operators/lm_score)
both measure a document against the CORPUS; these measure it against
ITSELF, which is what catches the document that is 400 copies of one
fluent sentence.

Scale shape: everything is computed inside ONE row-local projection —
tokenize, build the n-gram array, sort it, and run-length-scan the
sorted array with ``aggregate``/``filter`` lambdas.  No explode, no
shuffle, no UDF: a 100 TB corpus is scored in a single map pass (the
graded query's plan is pinned Exchange-free up to the final sort).
The DuckDB oracle deliberately takes the OPPOSITE physical form —
unnest + GROUP BY doc, gram + max/sum — so a green row checks the
run-length algebra against the relational definition.

Every array the lambdas re-reference is lambda-bound (the
CollapseProject O(n^2) inlining hazard measured for
operators/winnow.py — see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _stats_expr(text_col: str, n: int) -> str:
    ws = (
        f"CASE WHEN {text_col} IS NULL OR trim({text_col}) = '' "
        f"THEN cast(array() as array<string>) "
        f"ELSE split(trim(lower({text_col})), '\\\\s+') END"
    )
    grams = (
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(1, size(w) - {n} + 1), "
        f"i -> concat_ws(' ', slice(w, i, {n}))) "
        f"ELSE cast(array() as array<string>) END"
    )
    # the guards rely on OR's short-circuit evaluation: element_at at
    # index 0 / size+1 would error under ANSI mode (verified safe with
    # spark.sql.ansi.enabled=true)
    boundary = "(i = 1 OR element_at(s, i) != element_at(s, i - 1))"
    run_val = f"IF({boundary}, 1L, st.run + 1L)"
    top = (
        f"aggregate(sequence(1, size(s)), "
        f"named_struct('run', 0L, 'best', 0L), "
        f"(st, i) -> named_struct('run', {run_val}, "
        f"'best', greatest(st.best, {run_val})), "
        f"st -> st.best)"
    )
    singletons = (
        f"size(filter(sequence(1, size(s)), i -> {boundary} "
        f"AND (i = size(s) OR element_at(s, i) != element_at(s, i + 1))))"
    )
    stats = (
        f"CASE WHEN size(s) = 0 THEN "
        f"named_struct('n_grams', 0L, 'top_gram', 0L, 'dup_grams', 0L) "
        f"ELSE named_struct("
        f"'n_grams', cast(size(s) as bigint), "
        f"'top_gram', {top}, "
        f"'dup_grams', cast(size(s) - {singletons} as bigint)) END"
    )
    # bind each intermediate array exactly once: tokens -> grams ->
    # sorted grams -> run-length stats
    return (
        f"transform(array({ws}), w -> "
        f"transform(array({grams}), g -> "
        f"transform(array(array_sort(g)), s -> {stats})[0])[0])[0]"
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """(id_col, n_grams, top_gram, dup_grams) per input row —
    token-level n-gram repetition profile, all in one map-side
    projection.  ``top_gram`` = occurrences of the most frequent
    n-gram; ``dup_grams`` = total occurrences of n-grams seen 2+
    times (n_grams minus the singletons of the sorted gram array).
    Rows with fewer than ``n`` tokens report zeros; divide by
    ``n_grams`` downstream for Gopher's fractions, guarding the
    zero-gram rows."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return df.select(
        id_col, F.expr(_stats_expr(text_col, n)).alias("st")
    ).select(
        id_col,
        F.col("st.n_grams").alias("n_grams"),
        F.col("st.top_gram").alias("top_gram"),
        F.col("st.dup_grams").alias("dup_grams"),
    )
