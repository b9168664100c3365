"""Character n-gram language identification (CCNet/fastText-style).

Every production corpus pipeline (CCNet, RefinedWeb, Dolma) runs
language identification before quality filtering: downstream filters
are language-specific, so mislabeled documents poison the thresholds.
The classic lightweight identifier — Cavnar & Trenkle (1994) n-gram
profiles, or the character-n-gram Naive Bayes that langid.py and
fastText's supervised mode refine — needs nothing but counting, which
makes it a natural pair of DataFrame aggregations rather than a UDF.

Two entry points:

- :func:`train_char_profiles` — one pass over a labeled training
  slice builds the whole model: per-language character n-gram counts
  (``grams``), per-language total gram occurrences (``totals``), and
  the distinct-gram-type count across the training corpus (``vocab``,
  the add-one smoothing denominator term). All three are
  vocabulary-sized (character n-gram types grow with the alphabet,
  not the corpus — a few hundred KB even at 100 TB of text), so they
  broadcast.
- :func:`classify_language` — scores every document against every
  language with the add-one Naive Bayes average log-likelihood and
  returns the argmax.

The scoring join exploits one algebraic identity to stay sparse:

    avg_ll(doc, lang)
      = (1/n) * sum_g [ ln(c(g,lang) + 1) - ln(total_lang + V) ]
      = (1/n) * sum_g ln(c(g,lang) + 1)  -  ln(total_lang + V)

The second term is CONSTANT per language, and ln(0 + 1) = 0 means
grams absent from a language's profile contribute nothing to the
first term — so an INNER join of document grams against the profile
computes the variable part exactly, and the dense doc x lang grid is
only needed at per-document granularity (n_docs x n_langs rows of a
few columns), never at gram granularity. No row in the plan is wider
than the model or longer than the exploded document grams.

Plan shape notes:

- the n_docs x n_langs grid and the totals+vocab scalar attach are
  explicit ``crossJoin(broadcast(tiny))`` — the repo's sanctioned
  bounded-side attach pattern (update_history's ids x arguments grid
  precedent): the broadcast side is the language dimension (a handful
  of rows) resp. a 1-row scalar, so the resulting
  BroadcastNestedLoopJoin is a map-side loop over a constant-size
  table, not an all-pairs plan.  (A ``lit(1)``-key equi-join does NOT
  avoid this: the constant key folds away and the join degrades to
  the same BNLJ, just undocumented.)
- the argmax orders by the score ROUNDED half-up at ``decimals``
  (with the language as the deterministic tiebreaker) and emits that
  same rounded value: two engines summing floats in different orders
  agree on the rounded score, hence on the argmax — the same
  convention as the lm_score/timeseries float contracts.
- the gram array is built once per row inside a lambda binding
  (``transform(array(t), s -> ...)[0]``): if the text column is a
  computed expression (the synthetic-cipher workload), CollapseProject
  would otherwise inline that expression into every per-position
  ``substring`` call — the measured O(n^2) hazard from
  operators/winnow.py.

The reference engine has no text-analysis surface at all (its
analysis layer is the SQL procedure family, GetMessage.sql etc.), so
the design is Spark-first with no reference analog; the public
specification is Cavnar & Trenkle 1994 and the CCNet pipeline paper.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window, functions as F


class CharNBModel(NamedTuple):
    """A trained add-one character-n-gram Naive Bayes model.

    ``grams``: (lang, g, c) — observed n-gram occurrence counts per
    language.
    ``totals``: (lang, total) — sum of ``c`` over the language's
    grams: total gram OCCURRENCES, the conditional's denominator.
    ``vocab``: 1-row (v,) — distinct gram TYPES across the whole
    training corpus, the add-one smoothing term.
    ``n``: the gram width the model was trained with (scoring must
    extract the same width).
    """

    grams: DataFrame
    totals: DataFrame
    vocab: DataFrame
    n: int


def _char_grams(df: DataFrame, text_col: str, keep: list, n: int) -> DataFrame:
    """keep-columns + exploded overlapping character n-grams (spaces
    included — inter-word transitions carry real signal).  Rows whose
    text is NULL or shorter than ``n`` contribute nothing."""
    # lambda-bind the text: evaluated once per row even when text_col
    # is a computed expression (see module docstring)
    grams = (
        f"transform(array({text_col}), s -> "
        f"CASE WHEN s IS NULL OR length(s) < {n} THEN "
        f"cast(array() as array<string>) "
        f"ELSE transform(sequence(1, length(s) - {n - 1}), "
        f"i -> substring(s, i, {n})) END)[0]"
    )
    return df.select(*keep, F.expr(grams).alias("__gs")).select(
        *keep, F.explode("__gs").alias("g")
    )


def train_char_profiles(
    df: DataFrame, text_col: str, lang_col: str, n: int = 2
) -> CharNBModel:
    """One pass over the labeled training slice → the full model.

    The per-language counts are materialized eagerly (they feed both
    the totals roll-up and the scoring join; left lazy the training
    aggregation would run once per consumer — the lm_score/graph
    localCheckpoint precedent and its fault-tolerance caveat apply).
    """
    if n < 1:
        raise ValueError(f"gram width must be >= 1, got {n}")
    if lang_col in ("g", "c", "__gs"):
        raise ValueError(
            f"lang_col {lang_col!r} collides with a working column —"
            " rename the input"
        )
    g = _char_grams(df, text_col, keep=[lang_col], n=n)
    grams = (
        g.groupBy(F.col(lang_col).alias("lang"), "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    totals = grams.groupBy("lang").agg(F.sum("c").alias("total"))
    vocab = grams.agg(F.count_distinct("g").alias("v"))
    return CharNBModel(grams=grams, totals=totals, vocab=vocab, n=n)


def classify_language(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: CharNBModel,
    broadcast_model: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """(id_col, pred_lang, n_grams, hit_grams, avg_ll) for every
    input row.

    ``pred_lang`` is the argmax over the model's languages of the
    add-one Naive Bayes average log-likelihood per gram, ties broken
    by language ascending; ``avg_ll`` is that winning score, rounded
    half-up at ``decimals`` (the argmax itself orders by the rounded
    value — see the module docstring's cross-engine note).
    ``n_grams`` (the document's gram count) and ``hit_grams`` (how
    many of its gram occurrences the winning language's profile has
    seen) are the integer audit anchors that must match
    engine-to-engine before the float is even compared.  Documents
    shorter than the gram width keep a row with ``n_grams`` = 0 and
    NULL prediction — they carry no evidence.  An EMPTY model (no
    training rows) degrades every row to that same no-evidence shape:
    the doc x lang grid is empty, so nothing can be scored or
    counted.
    """
    reserved = {
        "g", "lang", "c", "total", "v", "s", "hits", "n_grams",
        "avg_ll", "__gs", "__rn", "__k",
    }
    if id_col in reserved:
        raise ValueError(
            f"id_col {id_col!r} collides with a working/output column —"
            f" rename the input (reserved: {sorted(reserved)})"
        )
    hint = F.broadcast if broadcast_model else (lambda d: d)
    scale = F.lit(float(10**decimals))
    half_up = lambda c: F.floor(c * scale + F.lit(0.5)) / scale  # noqa: E731

    g = _char_grams(df, text_col, keep=[id_col], n=model.n)
    doc_stats = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    partial = (
        g.join(hint(model.grams), "g")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.log(F.col("c") + 1)).alias("s"),
            F.count(F.lit(1)).alias("hits"),
        )
    )
    # lang constants (total + the vocab scalar) and the per-doc grid:
    # sanctioned crossJoin(broadcast(tiny)) attaches — the broadcast
    # sides are the n_langs-row dimension and a 1-row scalar
    lang_consts = model.totals.crossJoin(F.broadcast(model.vocab))
    grid = doc_stats.crossJoin(F.broadcast(lang_consts))
    scored = (
        grid.join(partial, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            "n_grams",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            half_up(
                F.coalesce("s", F.lit(0.0)) / F.col("n_grams")
                - F.log(F.col("total") + F.col("v"))
            ).alias("avg_ll"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("avg_ll").desc(), F.col("lang").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return df.select(id_col).join(best, id_col, "left").select(
        id_col,
        F.col("lang").alias("pred_lang"),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("hits", F.lit(0)).alias("hit_grams"),
        "avg_ll",
    )
