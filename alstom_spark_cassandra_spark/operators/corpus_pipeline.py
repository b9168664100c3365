"""End-to-end corpus curation in production order: language
identification → quality stack → exact dedup → content-addressed
split.

CCNet (Wenzek et al. 2019), RefinedWeb (Penedo et al. 2023) and Dolma
(Soldaini et al. 2024) all run the SAME stage order — lang-id first
(downstream quality thresholds are language-specific), then the
quality stack, then dedup among survivors, then the train/eval split
— so the composed operator is the pipeline a user actually deploys,
not a demo chain.  The composition question at 100 TB is SCAN
BUDGET: calling the four stages as separate operators and joining
their outputs scans the corpus 6+ times (lang-id's gram probe + doc
stats, quality's spine + span probe + its own rejoin, dedup's
groupBy, the split's hash pass).  :func:`curate` fuses them into ONE
plan that reads the corpus exactly THREE times (plan-asserted by the
graded query's test):

- scan 1, the quality SPINE (operators/quality_pipeline) — extended
  via its ``extra_cols`` hook to also compute, row-locally: the
  pass-through label columns, the lang-id gram count (a LENGTH
  expression — ``len(t) - n + 1`` equals the exploded-gram count, so
  no second gram scan is needed for the denominator), the dedup
  content hash, and the split bucket key.
- scan 2, the quality span PROBE (unchanged).
- scan 3, the lang-id gram PROBE: explode character n-grams once,
  inner-join the broadcast profile, aggregate per (doc, lang) — the
  sparse half of the Naive Bayes score (operators/langid's algebraic
  identity: absent grams contribute ln(1) = 0).

Everything after is corpus-linear on already-reduced rows: the
n_docs x n_langs score grid (quality verdict rows crossJoin'd with
the broadcast language-constants dimension — the sanctioned
bounded-side attach), a per-doc argmax window, one window over
(content-hash, survivor-flag) for keep-lowest-id exact dedup, and a
row-local split expression.  No self-joins: the fused stream is
consumed once end-to-end, so nothing corpus-sized is recomputed or
checkpointed.

Verdict semantics (first failing stage names the reason, matching
each stage's own graded contract):

- ``'lang'`` — predicted language is not the target (or the document
  has no gram evidence at all);
- ``'repetition'`` / ``'dup_spans'`` / ``'perplexity'`` — the
  quality stack's own reason, unchanged;
- ``'dup'`` — an earlier (lower-id) surviving document has identical
  text;
- ``'kept'`` — survived everything; only these rows get a
  ``split`` value ('train'/'eval' by content hash, resolution
  1/65536 — operators/sampling's convention and salt).

The reference engine has no corpus-curation surface (its pipeline
layer is the SQL procedure family, e.g. SQL/GetMessage.sql); the
public specifications are the CCNet/RefinedWeb/Dolma pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .langid import CharNBModel, _char_grams
from .lm_score import BigramLM
from .quality_pipeline import _half_up, quality_filter
from .sampling import _BUCKETS, _hex_bucket


def curate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    nb_model: CharNBModel,
    lm: BigramLM,
    target_lang: str,
    langid_text: Column | None = None,
    keep_cols: tuple = (),
    train_frac: float = 0.9,
    split_salt: str = "split-v1",
    decimals: int = 6,
    **quality_kwargs,
) -> DataFrame:
    """(id_col, *keep_cols, pred_lang, kept, reason, split) for every
    input row — the fused four-stage curation verdict (see module
    docstring for plan shape and reason semantics).

    ``langid_text`` optionally overrides the text the language
    identifier sees (must be row-local over the input row — e.g. a
    normalized or, in the synthetic-workload case, ciphered view);
    quality, dedup and split always run on ``text_col`` itself.
    ``keep_cols`` are input columns passed through to the output.
    ``quality_kwargs`` forward to quality_pipeline.quality_filter
    (thresholds, gram widths).
    """
    lt = langid_text if langid_text is not None else F.col(text_col)
    n = nb_model.n
    raw = F.coalesce(F.col(text_col), F.lit(""))
    extra = {c: F.col(c) for c in keep_cols}
    extra["__ng"] = (
        F.when(lt.isNull() | (F.length(lt) < n), F.lit(0))
        .otherwise(F.length(lt) - (n - 1))
        .cast("long")
    )
    extra["__h"] = F.md5(raw)
    extra["__sk"] = _hex_bucket(raw, split_salt)
    qf = quality_filter(
        df, id_col, text_col, lm, extra_cols=extra, **quality_kwargs
    )

    # ---- scan 3: the sparse lang-id probe
    g = _char_grams(
        df.select(F.col(id_col), lt.alias("__lt")), "__lt",
        keep=[id_col], n=n,
    )
    partial = (
        g.join(F.broadcast(nb_model.grams), "g")
        .groupBy(id_col, F.col("lang").alias("__plang"))
        .agg(F.sum(F.log(F.col("c") + 1)).alias("__s"))
    )
    # language constants: the n_langs-row dimension x the 1-row vocab
    # scalar — sanctioned crossJoin(broadcast(tiny)) attaches (the
    # operators/langid precedent)
    lang_consts = (
        nb_model.totals.select(
            F.col("lang").alias("__plang"), "total"
        ).crossJoin(F.broadcast(nb_model.vocab))
    )
    grid = qf.crossJoin(F.broadcast(lang_consts))
    avg_ll = _half_up(
        F.coalesce("__s", F.lit(0.0)) / F.nullif("__ng", F.lit(0))
        - F.log(F.col("total") + F.col("v")),
        decimals,
    )
    scored = grid.join(partial, [id_col, "__plang"], "left").withColumn(
        "__ll", avg_ll
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__ll").desc(), F.col("__plang").asc()
    )
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "pred_lang",
            F.when(F.col("__ll").isNull(), F.lit(None).cast("string"))
            .otherwise(F.col("__plang")),
        )
    )

    # ---- dedup among survivors + split
    lang_ok = F.coalesce(
        F.col("pred_lang") == F.lit(target_lang), F.lit(False)
    )
    pre = lang_ok & (F.col("kept") == 1)
    wh = Window.partitionBy("__h", "__pre").orderBy(id_col)
    cut = int(train_frac * _BUCKETS)
    split_val = (
        F.lit("train")
        if cut >= _BUCKETS
        else F.when(
            F.col("__sk") < F.lit(format(cut, "04x")), F.lit("train")
        ).otherwise(F.lit("eval"))
    )
    out = (
        best.withColumn("__pre", pre)
        .withColumn("__rnh", F.row_number().over(wh))
        .withColumn(
            "reason",
            F.when(~lang_ok, F.lit("lang"))
            .when(F.col("reason") != "ok", F.col("reason"))
            .when(F.col("__rnh") > 1, F.lit("dup"))
            .otherwise(F.lit("kept")),
        )
    )
    kept = (F.col("reason") == "kept").cast("int")
    return out.select(
        id_col,
        *keep_cols,
        "pred_lang",
        kept.alias("kept"),
        "reason",
        F.when(kept == 1, split_val).alias("split"),
    )
