"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 4 `hll_*` built-ins — JVM-side, no Python in the path).

The reference computes every distinct count exactly
(SQL/GetUpdateHistory.sql GROUP BYs); at 100 TB an exact
count-distinct per reporting window means re-scanning raw data for
every window. The sketch layer changes the economics: scan raw data
ONCE into per-(fine-grained-key) partial sketches — kilobytes per
group, mergeable — then answer any coarser rollup by unioning
sketches, never touching raw data again. Register-wise max is the
exact union operation for HLL, so union-of-partials ≡ one-pass sketch
of the union (pinned by test_hll_merge_equals_direct), and the
standard error is ~1.04/sqrt(2^lgk) (~1.6% at the default lgk=12,
~2.5 KB per sketch).

Typical deployment: persist `hll_partial_sketches(df, ["day",
"event_type"], "user_id")` as a tiny parquet table; serve
daily/weekly/all-time distinct-user questions from it with
`hll_rollup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_partial_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One binary HLL sketch of `value_col`'s distinct values per
    `keys` group. Partial aggregation applies map-side, so only
    sketches shuffle — never raw values."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "approx_distinct",
    keep_sketch: bool = False,
) -> DataFrame:
    """Roll partial sketches up to a coarser key set and estimate.
    With keep_sketch=True the merged sketch column is retained, so
    rollups compose (day -> month -> year) without revisiting finer
    levels."""
    merged = sketches.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )
    out = merged.withColumn(
        estimate_col, F.hll_sketch_estimate(sketch_col).cast("long")
    )
    return out if keep_sketch else out.drop(sketch_col)


def approx_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """One-shot estimate (sketch never materialized to the caller):
    scan -> partial sketches -> merged estimate per group."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lgk)))
        .cast("long")
        .alias(estimate_col)
    )


HEX = "0123456789abcdef"


def _md5_bucket(col, seed: int, width: int):
    """Engine-portable hash bucket in [0, width): the first 4 hex
    digits of md5(f"{seed}:" || value) as a 16-bit int, mod width.
    Same family as the portable minhash/simhash variants
    (operators/dedup.py) — any md5-capable engine (DuckDB, Trino,
    pandas) reproduces every bucket bit-for-bit, which is what turns
    the sketch itself into a hard-oracle-checkable table instead of an
    engine-private register state."""
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 4)
    v = F.conv(h, 16, 10).cast("long")
    return F.pmod(v, F.lit(width)).cast("int")


def md5_bucket_sql(expr: str, seed: int, width: int) -> str:
    """The DuckDB twin of _md5_bucket, as a SQL expression string."""
    digits = " + ".join(
        f"(instr('{HEX}', substr(md5('{seed}:' || {expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (3 - j)}"
        for j in range(4)
    )
    return f"(({digits}) % {width})"


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of `value_col` occurrences as a (row, bucket,
    n) table — depth x width cells TOTAL, regardless of input size.

    The 100 TB economics mirror hll_partial_sketches: one scan of the
    raw occurrences (explode x depth, then a groupBy whose partial
    aggregation collapses map-side to at most depth*width cells per
    task), and the shuffled/persisted state is a few KB. Point
    frequency queries then never touch raw data (cms_lookup), and two
    sketches of disjoint corpora merge by cell-wise addition —
    counts are plain integers, so merge-of-partials is exact under
    any partitioning.

    Estimates are classical CMS: est >= true always (no
    underestimation, deterministically), est <= true + collisions.
    Hash rows use the portable md5 bucketing, so the whole sketch —
    and therefore every estimate — is engine-reproducible and gets a
    HARD oracle, not an error-bound verdict."""
    c = F.col(value_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _md5_bucket(c, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return (
        cells.select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    estimate_col: str = "est_count",
) -> DataFrame:
    """Frequency estimate per probe value: min over the sketch's
    depth rows of the probed cell. The sketch is depth*width rows —
    always broadcast — so probing any number of values is a map-side
    join of the probe set against a few KB of state; absent cells
    read as 0 (a value never hashed there)."""
    c = F.col(value_col)
    probed = probes.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _md5_bucket(c, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(value_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .groupBy(value_col)
        .agg(F.min("n").alias(estimate_col))
    )


def _xxh_bucket(col, seed: int, width: int):
    """Production sibling of _md5_bucket: JVM xxhash64, ~10× cheaper,
    NOT engine-portable (the oracle path keeps md5 — the
    minhash/minhash_portable precedent)."""
    return F.pmod(
        F.xxhash64(F.concat(F.lit(f"{seed}:"), col)), F.lit(width)
    ).cast("int")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    portable: bool = True,
) -> DataFrame:
    """Bloom filter of a key set as a (row, bucket) DISTINCT-cell
    table — the set-membership sibling of cms_build (which counts).
    depth × width bits total regardless of key count; two filters of
    disjoint key sets merge by plain UNION DISTINCT. portable=True
    (default) uses md5 bucketing, engine-reproducible so the filter —
    and every membership test — is hard-oracle-checkable;
    portable=False swaps in xxhash64 (~10× cheaper per row, SCALE.md
    round-6 probe) for production runs that don't need cross-engine
    grading. Build and prefilter must use the SAME setting.

    NULL keys are dropped on build AND treated as non-members on
    probe: a NULL can never match an equi-join anyway, and without
    the filter the portable path's concat-with-NULL produced
    NULL-bucket cells that crashed the mask compiler."""
    bucket = _md5_bucket if portable else _xxh_bucket
    keys = keys.filter(F.col(key_col).isNotNull())
    c = F.col(key_col)
    cells = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        bucket(c, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return cells.select(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).distinct()


def bloom_prefilter(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    portable: bool = True,
) -> DataFrame:
    """Rows of `df` whose key hits a set bit in ALL `depth` bloom rows
    — a SUPERSET of the rows whose key is in the built set (a Bloom
    filter never false-negatives; false positives are the classical
    (1-e^{-kn/m})^k fraction). The big-data join economics: run this
    BEFORE an expensive shuffle join so only candidate rows pay the
    exchange — the manual form of Spark's own runtime bloom pruning,
    here explicit, deterministic, and persistable.

    Scale shape: the bloom table is depth × width CELLS at most (a few
    KB); it is collected once and compiled into literal bitmask words,
    so the membership test is a PURE MAP predicate (getbit over array
    literals) that rides into the scan — zero joins, zero shuffles,
    whole-stage codegen. The tiny-scalar collect is the sanctioned
    bucket-literal pattern (bm25's partition-filter resolution)."""
    words_per_row = (width + 63) // 64
    masks = [[0] * words_per_row for _ in range(depth)]
    for r in bloom.collect():
        masks[int(r["row"])][int(r["bucket"]) // 64] |= 1 << (
            int(r["bucket"]) % 64
        )

    def _signed(w: int) -> int:
        return w - (1 << 64) if w >= (1 << 63) else w

    bucket = _md5_bucket if portable else _xxh_bucket
    c = F.col(key_col)
    pred = None
    for i in range(depth):
        mask = F.array(
            *[F.lit(_signed(w)).cast("long") for w in masks[i]]
        )
        b = bucket(c, i, width)
        word = F.element_at(mask, F.shiftright(b, 6) + F.lit(1))
        hit = F.getbit(word, F.pmod(b, F.lit(64)).cast("int")) == F.lit(1)
        pred = hit if pred is None else (pred & hit)
    # NULL keys are non-members on both hash paths (build drops them)
    return df.filter(c.isNotNull() & pred)


def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Fixed-bin histogram — the deterministic mergeable quantile
    structure: (keys..., bucket, n) where bucket = floor((v-lo)/w)
    clamped to [0, bins-1]. Counts are integers, so partials merge
    exactly under any partitioning (unlike GK/KLL sketches, whose
    register states are engine-specific) and ANY engine reproduces
    the table bit-for-bit — histogram-derived quantiles get an EXACT
    oracle, not an error-bound one.

    NULL and NaN values are excluded (quantile semantics — as with
    percentile_approx); clamping happens on the LONG bucket index
    BEFORE any int cast, so out-of-range values saturate into the
    edge bins instead of overflowing under ANSI mode. The bin
    geometry (lo/hi/bins) rides along as constant columns, making the
    persisted histogram self-describing — histogram_quantiles reads
    it from there, so the two calls cannot silently disagree.

    The 100 TB pattern mirrors hll_partial_sketches: persist per-day
    histograms (bins × days tiny rows), answer any coarser window's
    quantiles by summing counts — no raw re-scan, ever."""
    w = (hi - lo) / bins
    bucket = F.least(
        F.lit(bins - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)),
        ),
    ).cast("int")
    ks = keys or []
    clean = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    )
    return (
        clean.select(*ks, bucket.alias("bucket"))
        .groupBy(*ks, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", F.lit(float(lo)))
        .withColumn("hi", F.lit(float(hi)))
        .withColumn("bins", F.lit(int(bins)))
    )


def histogram_cdf(
    df: DataFrame,
    hist: DataFrame,
    value_col: str,
    cdf_col: str = "cdf_micro",
) -> DataFrame:
    """Per-row quantile normalization from a value_histogram — the
    INVERSE of histogram_quantiles (value -> corpus percentile
    instead of percentile -> value). Each row gets
    floor(count_below_bucket * 1e6 / total + 0.5) — the CDF at its
    bucket's lower edge in integer micro-units (resolution = bin
    width; exact integers + one portable division, so any engine
    reproduces it bit-for-bit).

    Scale shape: the exact per-row percentile needs a global sort
    (rank over the whole corpus — one task at 100 TB); this is the
    sketch-resolution version: the histogram's cumulative counts are
    a bins-row table BROADCAST onto the scan, so normalization is a
    map-side join — no sort, no corpus-wide window, and the same
    persisted histogram serves training/serving skew checks. Rows
    with NULL/NaN values are dropped (consistent with
    value_histogram's exclusion)."""
    for c in ("lo", "hi", "bins"):
        if c not in hist.columns:
            raise ValueError(
                f"histogram is missing its {c!r} geometry column — "
                "build it with value_histogram"
            )
    win = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "bucket",
        "lo",
        "hi",
        "bins",
        F.coalesce(F.sum("n").over(win), F.lit(0)).alias("below"),
        F.sum("n").over(
            Window.orderBy("bucket").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    v = F.col(value_col)
    clean = df.filter(v.isNotNull() & ~F.isnan(v))
    width = (F.col("hi") - F.col("lo")) / F.col("bins")
    bucket = F.least(
        F.col("bins").cast("long") - 1,
        F.greatest(
            F.lit(0).cast("long"), F.floor((v - F.col("lo")) / width)
        ),
    ).cast("int")
    # the bins-row cum table broadcasts; bucket computed against its
    # self-described geometry so df and histogram cannot disagree
    geom = cum.select("lo", "hi", "bins").limit(1)
    with_bucket = clean.crossJoin(F.broadcast(geom)).withColumn(
        "bucket", bucket
    )
    return (
        with_bucket.join(
            F.broadcast(cum.select("bucket", "below", "total")), "bucket"
        )
        .withColumn(
            cdf_col,
            F.floor(
                F.col("below") * F.lit(1_000_000.0) / F.col("total")
                + F.lit(0.5)
            ).cast("long"),
        )
        .drop("lo", "hi", "bins", "below", "total")
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    keys: list[str] | None = None,
) -> DataFrame:
    """(keys..., q, est): nearest-rank quantile estimates from a
    value_histogram — est is the UPPER EDGE of the first bucket whose
    cumulative count reaches ceil(q·total) (deterministic integer
    rank selection; resolution = bin width). One shuffle over
    (keys, bucket) rows — never raw data.

    Bin geometry comes from the histogram's own lo/hi/bins columns
    (value_histogram writes them), so a persisted histogram can never
    be silently reinterpreted with the wrong width."""
    ks = keys or []
    for c in ("lo", "hi", "bins"):
        if c not in hist.columns:
            raise ValueError(
                f"histogram is missing its {c!r} geometry column — "
                "build it with value_histogram"
            )
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    win = Window.partitionBy(*ks) if ks else Window.partitionBy()
    totals = hist.withColumn("total", F.sum("n").over(win)).withColumn(
        "cum",
        F.sum("n").over(win.orderBy("bucket")),
    )
    joined = totals.crossJoin(F.broadcast(qdf)).filter(
        F.col("cum") >= F.ceil(F.col("q") * F.col("total"))
    )
    best = joined.groupBy(*ks, "q", "total", "lo", "hi", "bins").agg(
        F.min("bucket").alias("bucket")
    )
    width = (F.col("hi") - F.col("lo")) / F.col("bins")
    return best.select(
        *ks,
        "q",
        (F.col("lo") + (F.col("bucket") + 1) * width).alias("est"),
    )
