"""Dominant principal direction of the embedding matrix, Spark-first.

Not in the reference (no vectors there); this is the
linear-algebra-over-DataFrames layer of an embedding pipeline —
the dominant (uncentered) principal direction drives whitening,
anisotropy diagnostics ("rogue dimension" detection in embedding
corpora), and cheap 1-D ordering of vectors.

Structure — both steps are the bounded-state pattern shared with the
CMS/histogram sketches:

1. `gram_matrix`: the d x d second-moment (Gram) matrix via ONE
   corpus scan — per row all (i, j) component products, map-side
   partial-aggregated to at most d^2 cells; the exchange carries
   d^2 longs no matter how many vectors scanned. (Uncentered on
   purpose: centering first would need a second pass or a mean
   broadcast; the dominant direction of the raw second moment is the
   standard anisotropy diagnostic. d is the embedding width — for
   d ≤ a few hundred d^2 state is KBs; wider models should sample.)
2. `power_iteration`: v_{k+1} ∝ G · v_k, a fixed number of rounds —
   each round is a broadcast join of the 64-row vector against the
   Gram cells, one groupBy, and a 1-row max for rescaling. No driver
   collect of corpus-scale data anywhere; since round 6 the call DOES
   run one job at build time (the final dim-row result is eagerly
   localCheckpoint-ed so the Gram cache can be released — cache
   hygiene traded for build-time laziness; see the function
   docstring).

Portability contract (hard DuckDB oracle, the k-means precedent):
vectors quantize to the 10^-3 integer grid, so Gram cells and every
matrix-vector product are order-free exact integer sums (bounds:
|x_milli| ≤ ~2^11, cells ≤ rows · 2^22, products ≤ d · cells · 2^11 —
inside int64 for corpora to ~2^29 rows); each round rescales to
|v|∞ = 1000 with a single floor(x·1000/max + 0.5) — one IEEE
division, bit-identical on any engine. Sign is pinned by the
deterministic all-ones start vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000  # milli-unit quantization grid


def gram_matrix(
    emb: DataFrame, vec_col: str = "embedding", scale: int = SCALE
) -> DataFrame:
    """(i, j, c): the quantized Gram matrix, 1-based indices. One
    scan; d^2 cells of state."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast("long"),
    )
    cells = emb.select(q.alias("q")).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("q"),
                    lambda xi, i: F.transform(
                        F.col("q"),
                        lambda xj, j: F.struct(
                            (i + 1).alias("i"),
                            (j + 1).alias("j"),
                            (xi * xj).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.i", "cell.j", "cell.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("c"))
    )


def power_iteration(
    gram: DataFrame, dim: int, n_iters: int = 3, scale: int = SCALE
) -> DataFrame:
    """(pos, v_milli): the iterate after exactly `n_iters` rounds of
    v ∝ G·v from the all-ones start, renormalized to |v|∞ = scale
    each round. The vector is `dim` rows and rides broadcast, the
    1-row max rescale is the sanctioned scalar crossJoin. The final
    dim-row iterate is eagerly localCheckpoint-ed so the Gram cache
    can be released before return — the operator leaves nothing
    cached (r5 ADVICE)."""
    # persist the d^2-cell Gram table: each round references the
    # iterate twice (the max rescale and the update), so the lineage
    # fans out ~2^n_iters — uncached, the corpus-width Gram scan
    # would re-execute at every leaf (measured: power phase cost ≈
    # the gram phase again at 5M rows). The cache is d^2 rows;
    # persist() is lazy, so the collect-free contract holds (the one
    # job is the final checkpoint that releases it).
    gram = gram.persist()
    try:
        spark = gram.sparkSession
        v = spark.range(1, dim + 1).select(
            F.col("id").cast("int").alias("j"),
            F.lit(scale).cast("long").alias("val"),
        )
        for _ in range(n_iters):
            raw = (
                gram.join(F.broadcast(v), "j")
                .groupBy("i")
                .agg(F.sum(F.col("c") * F.col("val")).alias("raw"))
            )
            m = raw.agg(F.max(F.abs(F.col("raw"))).alias("m"))
            v = raw.crossJoin(F.broadcast(m)).select(
                F.col("i").alias("j"),
                F.floor(
                    F.col("raw") * F.lit(float(scale)) / F.col("m")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("val"),
            )
        out = v.select(F.col("j").alias("pos"), F.col("val").alias("v_milli"))
        return out.localCheckpoint(eager=True)
    finally:
        gram.unpersist()
