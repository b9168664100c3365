"""Smoothed bigram language-model quality scoring (CCNet-style).

CCNet / Gopher-class corpus pipelines score every document with a
small n-gram LM trained on trusted text and drop the high-perplexity
tail (gibberish, rare-script noise, boilerplate explosions).  This
module is that filter re-expressed as two batch Spark plans:

- :func:`train_bigram_lm` — ONE pass over the training slice builds
  the whole model: add-one-smoothed conditional bigram counts.  The
  model is three DataFrames (bigram counts, context counts derived
  from them, and the 1-row vocabulary size), each vocabulary-sized —
  tiny relative to the corpus even at 100 TB of text (token types
  grow ~O(corpus^0.5) by Heaps' law, and the counts are map-side
  combined before they ever shuffle).
- :func:`bigram_nll` — scores any document set: average negative
  log-likelihood per bigram, -ln((c12 + 1) / (c1 + V)), plus the
  integer anchors (bigram count, unseen-bigram count) that make the
  score auditable engine-to-engine before any float comparison.

Relation to the existing quality surface: `q_token_rarity`
(workloads.py) is the order-free bag-of-words cousin; this model is
SEQUENCE-AWARE — "the the the the" scores terribly here (every
repeated bigram is one context spread over one transition) while a
bag-of-words rarity score calls it perfectly common.  The reference
engine has no quality scoring at all (its analysis surface is the
SQL procedure family), so the design is Spark-first with no
reference analog.

Scale shape (100 TB): training is one explode and two aggregations
with effective map-side combine (bigram frequencies are Zipfian, so
partial aggregation collapses each task's hot pairs before the
shuffle).  Scoring joins the exploded bigrams against the model; the
model side is broadcast by default (a few hundred MB even for
billion-token training sets).  For web-scale vocabularies pass
``broadcast_model=False`` and the joins fall back to shuffle joins
on the bigram string — AQE handles the Zipf skew (hot stopword
bigrams) with skew-join splitting, and the pipeline stays a single
exchange per side.

Expression-inlining note: the bigram array references the token
array several times (two ``size`` probes plus one ``element_at`` per
position).  As measured for operators/winnow.py, a plain two-Project
pipeline lets CollapseProject inline the tokenization into every
per-position lambda the moment a consumer references the bigram
column exactly once (the explode here!), re-splitting the document
per bigram — O(n^2) characters.  The token array is therefore bound
as a lambda variable (``transform(array(ws), w -> ...)[0]``), which
pins exactly-once-per-row evaluation no matter how the optimizer
rearranges projections.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F


class BigramLM(NamedTuple):
    """A trained add-one bigram model.

    ``bigrams``: (bg, c12) — observed bigram counts, ``bg`` is the
    two tokens joined by a single space (tokens are whitespace-split,
    so the encoding is unambiguous).
    ``contexts``: (w1, c1) — context counts, derived from ``bigrams``
    so that c1(w) = sum_w2 c12(w, w2): the denominator counts
    TRANSITIONS out of w, which is what the conditional probability
    conditions on (a document-final token is not a context).
    ``vocab``: 1-row (v,) — distinct training token count, the
    add-one denominator term.

    INVARIANT (for hand-assembled models — the NamedTuple is public):
    all three DataFrames, vocab included, must be eagerly
    materialized (``localCheckpoint(eager=True)``) before the model
    is consumed.  ``train_bigram_lm`` guarantees this; a lazily-built
    vocab would be silently re-derived inside every consumer plan —
    ``quality_filter`` in particular trusts the invariant to keep its
    documented <=2-scans-of-documents contract, and a lazy vocab that
    re-scans its training corpus breaks it.
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame


def _doc_bigrams(df: DataFrame, text_col: str, keep: list) -> DataFrame:
    """keep-columns + exploded bigram strings, one row per adjacent
    token pair.  Documents with fewer than two tokens contribute no
    rows (callers that must keep them re-join on the doc id)."""
    ws = (
        f"CASE WHEN trim({text_col}) = '' OR {text_col} IS NULL "
        f"THEN cast(array() as array<string>) "
        f"ELSE split(trim(lower({text_col})), '\\\\s+') END"
    )
    # lambda-bind ws: evaluated once per row (see module docstring)
    bgs = (
        f"transform(array({ws}), w -> "
        f"CASE WHEN size(w) >= 2 THEN "
        f"transform(sequence(1, size(w) - 1), "
        f"i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) "
        f"ELSE cast(array() as array<string>) END)[0]"
    )
    return df.select(*keep, F.expr(bgs).alias("bgs")).select(
        *keep, F.explode("bgs").alias("bg")
    )


def train_bigram_lm(df: DataFrame, text_col: str) -> BigramLM:
    """One pass over the training slice → the full add-one bigram LM.

    Tokenization is the corpus-wide convention (lowercase, trim,
    whitespace split — functions/text_funcs.tokens), so scores are
    comparable with the other text-quality metrics.
    """
    bg = _doc_bigrams(df, text_col, keep=[])
    # Left lazy, the bigram aggregation would run TWICE over the
    # training corpus (once feeding the context roll-up, once as the
    # scoring join's build side).  The counts table is
    # vocabulary-sized, the canonical checkpoint candidate — training
    # therefore materializes the model eagerly (one job here; the
    # graph/PCA localCheckpoint precedent and fault-tolerance caveat
    # apply, see operators/graph.py).
    bigrams = (
        bg.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=True)
    )
    contexts = (
        bigrams.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    toks = (
        f"CASE WHEN trim({text_col}) = '' OR {text_col} IS NULL "
        f"THEN cast(array() as array<string>) "
        f"ELSE split(trim(lower({text_col})), '\\\\s+') END"
    )
    # The 1-row vocab scalar carries the raw training-scan lineage;
    # every consumer (perplexity, quality_filter — possibly many calls
    # over one trained model) would re-scan the training corpus per
    # use.  Checkpoint it once here, next to the bigrams: training
    # pays the scan exactly once, reuse is free.
    vocab = (
        df.select(F.explode(F.expr(toks)).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
        .localCheckpoint(eager=True)
    )
    return BigramLM(bigrams=bigrams, contexts=contexts, vocab=vocab)


def bigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: BigramLM,
    broadcast_model: bool = True,
) -> DataFrame:
    """(id_col, n_bigrams, n_unseen, avg_nll) for every input row.

    avg_nll = mean over the document's bigrams of
    -ln((c12 + 1) / (c1 + V)) — add-one smoothing over the training
    vocabulary, so unseen transitions cost ln(c1 + V) and a fully
    out-of-domain document converges to ln(V).  Documents with fewer
    than two tokens keep a row with n_bigrams = 0 and NULL avg_nll
    (they carry no sequence evidence; score them with the length
    metrics instead).  ``n_unseen`` (bigrams never observed in
    training) is the integer audit anchor: engines must agree on it
    exactly before the float score is even compared.

    ``broadcast_model=True`` broadcasts both model tables (correct
    for any model that fits an executor — see module docstring);
    pass False at web-scale vocabularies to fall back to shuffle
    joins with AQE skew handling.
    """
    hint = F.broadcast if broadcast_model else (lambda d: d)
    bg = _doc_bigrams(df, text_col, keep=[id_col])
    scored = (
        bg.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(hint(lm.bigrams), "bg", "left")
        .join(hint(lm.contexts), "w1", "left")
        .crossJoin(hint(lm.vocab))
        .select(
            id_col,
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1"),
            "v",
        )
        .select(
            id_col,
            (F.log(F.col("c1") + F.col("v")) - F.log(F.col("c12") + 1)).alias(
                "nll"
            ),
            F.when(F.col("c12") == 0, 1).otherwise(0).alias("unseen"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("unseen").cast("long").alias("n_unseen"),
            F.avg("nll").alias("avg_nll"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("n_unseen", F.lit(0)).alias("n_unseen"),
        "avg_nll",
    )
