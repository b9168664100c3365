"""Text-analysis column functions (training-data pipeline layer).

Not present in the reference (its string surface is SPLIT_STR /
REPLACE / CONCAT plumbing, SQL/SPLIT_STR.sql:6-14,
SQL/CreateIntermediateTable.sql:23-27); these are the standard
corpus-curation metrics a 100 TB text pipeline needs. All are pure
`pyspark.sql.functions` compositions — JVM-side, codegen'd, no Python
in the hot path — and each is deterministic and ANSI-SQL-expressible
so the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal per-language marker-word lists for the n-gram/stopword
# language-ID heuristic. Deterministic and tiny by design: real
# deployments swap in fastText or CLD3 lists, the plumbing is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "que", "y", "en"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array.

    Every metric below accepts a pre-tokenized array via `toks=` —
    tokenize ONCE per query and share the column: Spark's
    subexpression elimination does not reach across higher-order
    function lambdas, so per-metric re-tokenization costs ~4x
    (measured at sf0.1)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


_tokens = tokens  # backwards-compat internal alias


def _isin(words):
    def f(t):
        return t.isin(*words)

    return f


def token_count(text: Column, toks: Column | None = None) -> Column:
    """Whitespace token count (BPE-ish subword count ≈ chars/4 is a
    separate column callers can derive; this is the exact word count)."""
    toks = tokens(text) if toks is None else toks
    return F.size(toks).cast("long")


def stopword_ratio(text: Column, toks: Column | None = None) -> Column:
    toks = tokens(text) if toks is None else toks
    n_stop = F.size(F.filter(toks, _isin(STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks).cast("double")
    )


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Deterministic [0,1] quality composite: mean token length band,
    stopword presence, and length band. A stand-in for model-based
    quality scoring with the same column signature."""
    toks = tokens(text) if toks is None else toks
    n = F.size(toks)
    mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
        (F.length(F.concat_ws("", toks)).cast("double")) / n.cast("double")
    )
    len_ok = F.when((n >= 10) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    word_ok = F.when((mean_len >= 3.0) & (mean_len <= 10.0), F.lit(0.3)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(
        stopword_ratio(text, toks) > 0.0, F.lit(0.3)
    ).otherwise(F.lit(0.0))
    return F.round(len_ok + word_ok + stop_ok, 2)


def language_id(text: Column, toks: Column | None = None) -> Column:
    """Marker-word language ID: count each language's marker tokens and
    take the best-scoring language ('und' when nothing matches).
    Ties break by language code ascending (deterministic)."""
    toks = tokens(text) if toks is None else toks
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for code in sorted(LANG_MARKERS):  # ascending => first max wins
        score = F.size(F.filter(toks, _isin(LANG_MARKERS[code])))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(code)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def doc_fingerprint(text: Column, toks: Column | None = None) -> Column:
    """Order-sensitive integer fingerprint: a positional polynomial
    over (token length, leading char code), mod 2^31-1. Pure integer
    arithmetic so Spark and the SQL oracle agree exactly."""
    toks = tokens(text) if toks is None else toks
    # aggregate with (acc, x) over zip_with(tokens, positions)
    indexed = F.zip_with(
        toks,
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))),
        lambda t, i: (F.length(t) * 31 + F.ascii(F.substring(t, 1, 1))) * i,
    )
    return F.when(F.size(toks) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(indexed, F.lit(0).cast("long"), lambda acc, x: acc + x)
        % F.lit(2147483647)
    )
