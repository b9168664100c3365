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
    toks = _toks(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(step))).cast("int"),
    )
    chunked = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
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
    shorter than n tokens — nothing to repeat)."""
    toks = _toks(F.col(text_col))
    total = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(0), F.greatest(total - 1, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
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
