"""Byte-pair-encoding subword vocabulary training, Spark-first.

Not in the reference (its text surface is SPLIT_STR plumbing,
SQL/SPLIT_STR.sql:6-14); this is the tokenizer-training step of a
training-data pipeline — the op that turns a raw corpus into the
subword merge table every downstream token count/pack/filter uses.

Classical BPE (Sennrich et al. 2016) trains on WORD TYPES with
frequencies, not the raw corpus: the corpus is scanned ONCE into a
(word, count) table (vocabulary-sized — tiny next to the corpus, and
the only corpus-width operation here), and every merge round then
runs on that table alone. Per round: count adjacent symbol pairs
weighted by word frequency, pick the most frequent pair
(deterministic tie-break: count DESC, pair ASC), fuse it everywhere.
At 100 TB the economics are: one corpus scan + R rounds over a
vocab-sized table — each round one map-side-partial groupBy and one
literal string rewrite, with a 1-row collect to promote the winning
pair to a literal (the sanctioned J10 tiny-scalar pattern; the loop
is R≈tens of driver round-trips over kilobyte results).

Engine-portability contract (what makes the DuckDB oracle EXACT):
the symbol sequence is a STRING — ' a b c ' with single-space
separators and boundary spaces — and a merge applies as
replace(replace(seq, ' a b ', ' ab '), ' a b ', ' ab '): two passes
of the universal leftmost-non-overlapping literal replace, identical
in Java and DuckDB, so both engines run the SAME deterministic
algorithm (the second pass catches occurrences whose shared boundary
space the first pass consumed). No folds, no UDFs, no engine-private
semantics anywhere; the oracle unrolls the rounds as CTEs exactly
like the k-means oracle (workloads._kmeans_oracle_sql).

Training is restricted to printable-ASCII word types (both regex
engines agree on those byte-for-byte; Java regex '.' splits
non-BMP code points where RE2 does not) — the byte-level-BPE stance
(GPT-2) where everything is bytes anyway.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import tokens

ASCII_WORD = "^[ -~]+$"  # printable ASCII; same meaning in Java + RE2


@dataclass(frozen=True)
class MergeRule:
    round: int
    pair: str            # 'a b'
    merged: str          # 'ab'
    weighted_count: int


def word_counts(
    docs: DataFrame, text_col: str = "text", ascii_only: bool = True
) -> DataFrame:
    """(word, cnt): the one corpus-width scan. Lowercased whitespace
    tokens (engine-wide convention); one map-side-partial groupBy."""
    w = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
    )
    if ascii_only:
        w = w.filter(F.col("word").rlike(ASCII_WORD))
    return w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _initial_seq(word: Column) -> Column:
    """' a b c ' — one space-separated symbol per character, with
    boundary spaces so every adjacent pair is ' a b '-matchable."""
    return F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))


def _pairs(seq: Column) -> Column:
    """Adjacent symbol pairs of a seq string, as 'a b' strings. Empty
    for single-symbol words (guarded: Spark's sequence(1, 0) would
    DESCEND, not return empty)."""
    arr = F.split(F.trim(seq), " ")
    n = F.size(arr)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(seq: Column, pair: str, merged: str) -> Column:
    """Double-pass leftmost-non-overlapping literal replace — the
    portable merge application (see module docstring)."""
    pat, rep = F.lit(f" {pair} "), F.lit(f" {merged} ")
    return F.replace(F.replace(seq, pat, rep), pat, rep)


def bpe_train(
    words: DataFrame, n_merges: int = 8
) -> tuple[list[MergeRule], DataFrame]:
    """Learn `n_merges` merge rules from a (word, cnt) table.

    Returns (rules in order, final symbolized words DataFrame with
    columns word/cnt/seq). Stops early if no pair remains. The
    initial symbolized table is PERSISTED before the loop — without
    it, every round's collect would re-execute the corpus scan and
    word aggregation through the growing lineage (R corpus scans
    instead of one, the exact economics this trainer exists to
    avoid). The per-round lineage on top of the cached table is R
    nested literal replaces — a single narrow map stage. The cache is
    vocab-sized; callers can `.unpersist()` the returned state when
    done."""
    state = words.select(
        "word", "cnt", _initial_seq(F.col("word")).alias("seq")
    ).persist()
    rules: list[MergeRule] = []
    for r in range(n_merges):
        best = (
            state.select("cnt", F.explode(_pairs(F.col("seq"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, c = best[0]["pair"], int(best[0]["c"])
        merged = pair.replace(" ", "")
        rules.append(MergeRule(r + 1, pair, merged, c))
        state = state.withColumn(
            "seq", apply_merge(F.col("seq"), pair, merged)
        )
    return rules, state


def merges_df(spark, rules: list[MergeRule]) -> DataFrame:
    return spark.createDataFrame(
        [(m.round, m.pair, m.merged, m.weighted_count) for m in rules],
        "round int, pair string, merged string, weighted_count long",
    )


def bpe_segment(
    docs: DataFrame,
    rules: list[MergeRule],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, subwords): tokenize documents with a learned merge table —
    per word, replay the merges in training order (the standard BPE
    segmenter). Pure literal-replace column chain (R replaces), no
    join, no shuffle beyond whatever the caller aggregates next.
    Non-ASCII words pass through as single unsplit symbols."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
    )
    seq = F.when(
        F.col("word").rlike(ASCII_WORD), _initial_seq(F.col("word"))
    ).otherwise(F.concat(F.lit(" "), F.col("word"), F.lit(" ")))
    out = tok.select("id", "word", seq.alias("seq"))
    for m in rules:
        out = out.withColumn(
            "seq", apply_merge(F.col("seq"), m.pair, m.merged)
        )
    return out.select(
        "id", "word", F.split(F.trim(F.col("seq")), " ").alias("subwords")
    )
