"""Context-window document chunking and intra-document repetition.

Two per-document operators for the pretraining prep path, both pure
higher-order-function row transforms — zero shuffles, zero Python:

- **Chunking**: split each document's token sequence into
  fixed-length overlapping windows (the context-window prep step
  before `sequence_pack` bins chunks into batches). Every token is
  covered; consecutive chunks share `overlap` tokens; short docs
  yield exactly one chunk. Fan-out is an explode of a per-row
  computed index range, so a 100 TB corpus chunks in one map stage.

- **Repetition scoring**: the fraction of duplicated word n-grams
  inside each document (the "repetition removal" quality signal of
  Gopher/MassiveText-style pipelines — high dup_frac means looping
  or boilerplate text). Derived entirely from `size()` arithmetic on
  the shingle arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_id, n_chunk_tokens, chunk_text) rows. Chunk k spans
    tokens [k*step, k*step + chunk_tokens) with step = chunk_tokens -
    overlap; the number of chunks is ceil((n_tokens - overlap) /
    step), floored at 1, which covers every token and never emits a
    window that adds no new tokens."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    # tokenize ONCE into a column, then derive the chunk count from
    # the column reference in a second projection — deriving both from
    # the raw split expression in one projection evaluated the
    # tokenization twice per row (text_funcs' tokenize-once rule)
    n = F.size(F.col("__toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))).cast("int"),
    )
    chunked = docs.select(
        F.col(id_col), _toks(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"),
        F.col("chunk_id") * step + 1,
        F.lit(chunk_tokens),
    )
    return chunked.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def repetition_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_distinct_grams, dup_frac) per document, where
    dup_frac = 1 - distinct/total over word n-grams (0.0 for docs
    shorter than n tokens — nothing to repeat).

    The tokenization is materialized as a column FIRST: Catalyst
    does not common-subexpression-eliminate an outer expression
    referenced inside a higher-order-function lambda, so inlining
    `_toks(text)` into the per-gram element_at calls re-ran the
    split PER GRAM PER POSITION — measured 14 s for this operator at
    sf0.1 vs 0.6 s with the one-column materialization (24x), the
    expression-level twin of the DataFrame recompute traps in
    SCALE.md."""
    pre = docs.select(
        F.col(id_col), _toks(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    total = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(0), F.greatest(total - 1, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    distinct = F.size(F.array_distinct(grams))
    return pre.select(
        F.col(id_col),
        F.when(total > 0, total).otherwise(F.lit(0)).alias("n_grams"),
        F.when(total > 0, distinct).otherwise(F.lit(0)).alias(
            "n_distinct_grams"
        ),
        F.when(
            total > 0,
            F.floor(
                (1 - distinct / total.cast("double")) * 1e6 + F.lit(0.5)
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def chunk_dedup(
    chunks: DataFrame,
    text_col: str = "chunk_text",
    id_col: str = "doc_id",
    idx_col: str = "chunk_id",
    skew_safe: bool = False,
) -> DataFrame:
    """Corpus-wide duplicate-chunk marking — C4/CCNet-style line dedup
    generalized to context chunks: the FIRST occurrence of each
    distinct chunk text in (id, idx) order is canonical; every later
    occurrence is flagged `is_dup`.

    Returns (id_col, idx_col, is_dup) ONLY: rows are projected to
    (id, idx, digest) before the dedup shuffle, so chunk text never
    travels through it — at 100 TB the exchange carries ~24
    bytes/chunk regardless of chunk size. The digest is two
    independently-seeded xxhash64 longs (128 bits, no practical
    collisions at 10^10+ chunks; it never leaves the operator, so
    there is no portability reason to pay md5's cost). Callers
    re-join on (id, idx) to drop or keep flagged chunks.

    `skew_safe` picks between two physically different plans
    (measured at 50M chunks, local[32], SCALE.md round-4):

    - False (default): single shuffle + per-digest window. 15.0s on a
      typical corpus vs 39.7s for the join plan — but a digest owning
      a large corpus fraction (empty chunks, license boilerplate)
      lands in ONE window partition, which no planner can split.
    - True: min(struct) aggregation + flag join. Two shuffles (2.6×
      slower in the common case), but the hot digest partial-
      aggregates map-side and the join is skew-splittable by AQE —
      the shape that survives a boilerplate-heavy 100 TB crawl.

    Rule of thumb: strip trivial chunks upstream and keep the
    default; flip skew_safe on when the duplicate mass is unknown.
    """
    keyed = chunks.select(
        F.col(id_col),
        F.col(idx_col),
        F.xxhash64(F.lit(0), F.col(text_col)).alias("__d0"),
        F.xxhash64(F.lit(1), F.col(text_col)).alias("__d1"),
    )
    if not skew_safe:
        from pyspark.sql import Window

        w = Window.partitionBy("__d0", "__d1").orderBy(id_col, idx_col)
        return (
            keyed.withColumn("__rn", F.row_number().over(w))
            .select(id_col, idx_col, (F.col("__rn") > 1).alias("is_dup"))
        )
    canonical = keyed.groupBy("__d0", "__d1").agg(
        F.min(F.struct(id_col, idx_col)).alias("__first")
    )
    return keyed.join(canonical, ["__d0", "__d1"]).select(
        id_col,
        idx_col,
        (
            (F.col(id_col) != F.col(f"__first.{id_col}"))
            | (F.col(idx_col) != F.col(f"__first.{idx_col}"))
        ).alias("is_dup"),
    )


def _passage_windows(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    hashed: bool,
) -> DataFrame:
    """(id, pos, __key) for every k-token sliding window (stride 1).
    Docs shorter than k tokens yield no windows (pre-filtered — Spark's
    `sequence(0, n-k)` would COUNT DOWN for n < k, not return empty).
    hashed=True keys windows by xxhash64 (8 bytes on the shuffle wire);
    False keys by the window string itself (engine-portable, oracle
    path)."""
    toks = _toks(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= k
    )
    win_str = lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, k))  # noqa: E731
    key = (lambda i: F.xxhash64(win_str(i))) if hashed else win_str
    return base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - k), lambda i: key(i)
            )
        ).alias("pos", "__key"),
    )


def passage_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Cross-document repeated-passage detection — the sliding-window
    substring-dedup signal (Lee et al., "Deduplicating Training Data
    Makes Language Models Better") re-expressed set-based: every
    k-token window of every document, grouped by content; a window
    appearing in >= min_docs DISTINCT documents is a duplicated
    passage. Per document: (id, n_tokens, n_windows, n_dup_windows,
    n_dup_tokens, dup_token_ratio), where n_dup_tokens is the size of
    the UNION of the duplicated windows' token ranges (overlapping
    windows merged by a running-max interval sweep, so a long shared
    passage isn't counted k times).

    Differs from chunk_dedup (fixed non-overlapping chunks, exact
    text) and repetition_scores (intra-document n-grams): this finds
    shared SPANS across documents at any alignment — boilerplate,
    licenses, syndicated text — the signal used to cut or down-weight
    docs before training.

    Scale: the exploded relation is one row per token position —
    (id, pos, 8-byte xxhash64 key) with hashed=True, never window
    text; doc-frequency is a distinct + count per key (map-side
    partial), and the per-doc interval sweep partitions by document.
    hashed=False keeps the raw window string as the key — exact and
    engine-portable for audits (the registry oracle), at string
    shuffle cost.
    """
    from pyspark.sql import Window

    toks = _toks(F.col(text_col))
    wins = _passage_windows(docs, text_col, id_col, k, hashed)
    dup_keys = (
        wins.select("__key", id_col)
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    dup_wins = wins.join(dup_keys, "__key").select(id_col, "pos")
    # interval union per doc: contribution of window [pos, pos+k) is
    # the part past the running max end of all earlier windows
    prev_end = F.max(F.col("pos") + k).over(
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc = (
        dup_wins.withColumn(
            "__contrib",
            F.greatest(
                F.lit(0),
                (F.col("pos") + k)
                - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos"))),
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("__contrib").alias("n_dup_tokens"),
        )
    )
    stats = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.greatest(F.size(toks) - k + 1, F.lit(0)).alias("n_windows"),
    )
    return stats.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias(
            "n_dup_windows"
        ),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias(
            "n_dup_tokens"
        ),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.col("n_tokens").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_ratio"),
    )


def strip_duplicate_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Surgical passage removal: drop every token covered by a
    cross-document duplicated k-window (as found by passage_dup_stats'
    machinery) and reassemble the remaining tokens in order. Returns
    (id, text) with the cleaned text; untouched docs pass through
    verbatim.

    The covered-index set is aggregated PER DOCUMENT (bounded by the
    doc's own token count — the same order as the text itself), then
    the token filter runs row-local via a higher-order filter, so the
    full text never shuffles: only (id, pos) pairs and the per-doc
    index arrays move."""
    wins = _passage_windows(docs, text_col, id_col, k, hashed)
    dup_keys = (
        wins.select("__key", id_col)
        .distinct()
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    covered = (
        wins.join(dup_keys, "__key")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + k - 1)).alias(
                "__i"
            ),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__i").alias("__cov"))
    )
    toks = _toks(F.col(text_col))
    return docs.join(covered, id_col, "left").select(
        F.col(id_col),
        F.when(F.col("__cov").isNull(), F.col(text_col))
        .otherwise(
            F.concat_ws(
                " ",
                F.filter(
                    toks, lambda t, i: ~F.array_contains(F.col("__cov"), i)
                ),
            )
        )
        .alias(text_col),
    )
