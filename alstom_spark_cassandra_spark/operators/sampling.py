"""Deterministic sampling / splitting (training-data pipeline layer).

Monte-Carlo `df.sample()` is nondeterministic across retries and
engines — useless for reproducible training mixes. These operators
are CONTENT-ADDRESSED: the bucket is a hash of the row's own content,
so (a) reruns, task retries, and different engines agree row-by-row,
(b) exact duplicates land in the same split — no train/eval leakage
through copies, and (c) changing the salt re-draws the whole
assignment.

md5 (not xxhash64) on purpose: every engine has it, so the split is
auditable anywhere (DuckDB, Trino, pandas). The first 4 hex chars
give 65536 uniform buckets; comparison happens on the lowercase hex
STRING (lexicographic == numeric for fixed-width hex), so no integer
parsing is involved at all. Everything is JVM-side codegen — no
Python, no shuffle; a split/sample is a narrow map + filter that
stacks under whatever scan it follows and lets pushdown through.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536


def _hex_bucket(content: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt), content)), 1, 4)


def _below_cut(content: Column, salt: str, frac: float) -> Column:
    """bucket(content) < floor(frac * 65536), as a codegen-friendly
    predicate. frac=1.0 must short-circuit: the hex compare against a
    5-char '10000' would sort lexicographically below 'a***'."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction {frac} outside [0, 1]")
    cut = int(frac * _BUCKETS)
    if cut >= _BUCKETS:
        return F.lit(True)
    return _hex_bucket(content, salt) < F.lit(format(cut, "04x"))


def hash_split(
    df: DataFrame,
    content_col: str,
    train_frac: float = 0.9,
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'eval' by content hash.

    Resolution is 1/65536 (~0.0015%): train_frac is rounded down to a
    whole bucket count, so the realized fraction is
    floor(train_frac * 65536) / 65536.
    """
    return df.withColumn(
        split_col,
        F.when(
            _below_cut(F.col(content_col), salt, train_frac), F.lit("train")
        ).otherwise(F.lit("eval")),
    )


def hash_sample(
    df: DataFrame,
    content_col: str,
    rate: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows by content hash.

    Nested property: hash_sample(rate=0.1) is a SUPERSET of
    hash_sample(rate=0.01) under the same salt — shrinking a corpus
    keeps the smaller sample inside the bigger one, so ablation
    subsets stay comparable.
    """
    return df.filter(_below_cut(F.col(content_col), salt, rate))


def stratified_hash_sample(
    df: DataFrame,
    content_col: str,
    strata_col: str,
    rates: dict[object, float],
    default_rate: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing /
    data-mixture op (e.g. keep all rare-language docs, 5% of the
    dominant one). Same content-addressed buckets as hash_sample, so
    each stratum's sample is reproducible, leak-proof for duplicates,
    and nested across rates; strata not listed in `rates` get
    `default_rate` (0 = dropped). Still one codegen-friendly filter:
    no shuffle, no sampling state.
    """
    pred: Column = _below_cut(F.col(content_col), salt, default_rate)
    for stratum, rate in rates.items():
        pred = F.when(
            F.col(strata_col) == F.lit(stratum),
            _below_cut(F.col(content_col), salt, rate),
        ).otherwise(pred)
    return df.filter(pred)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    n: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Cap rows per group at the top-n under `order_cols` — the
    domain-balancing op of pretraining mixes (e.g. at most N docs per
    source/domain, best-first), and the generic guard against a few
    giant domains dominating a 100 TB crawl.

    row_number + filter compiles to Spark's WindowGroupLimit: each map
    task discards rows past rank n BEFORE the exchange, so shuffle
    volume is ≤ n rows per (group, map partition), not the raw group
    size — a hot domain with 10^9 pages ships only n·tasks rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def deterministic_shuffle(
    df: DataFrame,
    content_col: str,
    salt: str = "shuffle-v1",
    shard_hex_chars: int = 1,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global training order WITHOUT a global total-order
    bottleneck: md5(salt || content) gives every row a shard (hex
    prefix, 16^shard_hex_chars shards) and an intra-shard position;
    reading shards in label order yields one canonical permutation.

    Reruns, retries, and other engines (md5 is everywhere) agree
    row-by-row; changing the salt re-draws the whole order — the
    epoch-reshuffle knob. The only window is per-shard, so at 100 TB
    pick shard_hex_chars=3-4 (4096/65536 shards) and each window
    partition holds corpus/shards rows; no single task ever sees a
    total order.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(content_col).cast("string")))
    from pyspark.sql import Window

    out = df.withColumn("__key", key).withColumn(
        shard_col, F.substring("__key", 1, shard_hex_chars)
    )
    w = Window.partitionBy(shard_col).orderBy("__key", content_col)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("__key")


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    counts: dict[object, int],
    content_col: str,
    salt: str = "mix-v1",
) -> DataFrame:
    """EXACT-COUNT weighted mixture: take exactly counts[s] rows from
    each stratum (fewer only if the stratum is smaller), chosen as
    the top-n by content-addressed md5 rank — the deterministic
    "data mixture recipe" (40k of web, 10k of books, ...) where
    rate-based sampling (stratified_hash_sample) would only hit the
    counts in expectation.

    Same determinism contract as the rest of this module: reruns,
    retries, and other engines agree row-by-row; changing the salt
    redraws every stratum; growing a stratum leaves the previously
    chosen rows mostly stable (rank insertion, not re-shuffle).
    Strata not in `counts` are dropped. The rank filter carries BOTH
    a literal bound (max of all caps — WindowGroupLimit needs a
    literal to pre-limit before the exchange) and the per-stratum
    column cap, so a billion-row stratum ships at most max(counts)
    rows per map task and the exact per-stratum count applies after.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    caps = spark.createDataFrame(
        [(k, int(v)) for k, v in counts.items()],
        f"{strata_col} string, __cap int",
    )
    max_cap = max(int(v) for v in counts.values())
    key = F.md5(F.concat(F.lit(salt), F.col(content_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(key, content_col)
    return (
        df.join(F.broadcast(caps), strata_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(
            (F.col("__rk") <= F.lit(max_cap))
            & (F.col("__rk") <= F.col("__cap"))
        )
        .drop("__cap", "__rk")
    )


def temperature_quotas(
    df: DataFrame,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Temperature-weighted mixture quotas at α = 1/2: per-group
    sampling targets ∝ √(group size), summing EXACTLY to `budget` —
    the standard domain/language rebalancing step of a pretraining
    mix (raw proportions over-serve huge domains; α < 1 flattens the
    distribution; α = 1/2 is the common default and keeps the score
    a single portable sqrt).

    Exact integer allocation by largest remainder: scores
    s_i = ⌊√n_i·1e6 + .5⌋ (integer micro), base_i = ⌊budget·s_i/S⌋
    (the double division of exact int64s cannot cross an integer
    boundary: a remainder ≥ 1 sits ~1e9 ulps from it), remainders
    r_i = budget·s_i − base_i·S compared as exact int64s, and the
    leftover seats go to the largest remainders (ties: group asc). By
    construction Σ quota = budget on every engine — the invariant the
    oracle equality certifies. Output: (group, n, score_micro,
    quota).

    One map-side-partial count per group + arithmetic over the
    GROUPS-sized table (broadcast 1-row total); feed the quotas to
    mixture_sample for the exact-count draw."""
    counts = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = counts.withColumn(
        "score_micro",
        F.floor(F.sqrt(F.col("n").cast("double")) * 1_000_000 + F.lit(0.5))
        .cast("long"),
    )
    tot = scored.agg(F.sum("score_micro").alias("__s"))
    with_tot = scored.crossJoin(F.broadcast(tot))
    base = F.floor(
        (F.col("score_micro") * F.lit(budget)).cast("double") / F.col("__s")
    ).cast("long")
    staged = with_tot.withColumn("__base", base).withColumn(
        "__rem",
        F.col("score_micro") * F.lit(budget) - F.col("__base") * F.col("__s"),
    )
    from pyspark.sql import Window

    leftover = F.lit(budget) - F.sum("__base").over(Window.partitionBy())
    ranked = staged.withColumn(
        "__rank",
        F.row_number().over(
            Window.orderBy(F.col("__rem").desc(), F.col("group").asc())
        ),
    ).withColumn("__left", leftover)
    return ranked.select(
        "group",
        "n",
        "score_micro",
        (
            F.col("__base")
            + F.when(F.col("__rank") <= F.col("__left"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
