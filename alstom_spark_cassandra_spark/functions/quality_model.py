"""Hashed-bag-of-words linear quality classifier (fastText-style).

Not present in the reference (whose string surface is SPLIT_STR
plumbing, SQL/SPLIT_STR.sql:6-14); this is the model-scoring step of
corpus curation — CCNet/fastText-style quality filtering — expressed
as the hashing-trick plan that scales: token -> feature bucket via a
portable hash, bucket -> weight, logit = bias + sum of weights over
token OCCURRENCES, keep = logit >= threshold. No softmax/sigmoid in
the decision path (monotone in the logit), so scoring is exact
integer arithmetic end-to-end.

Two weight sources share one plan shape:

- `hashed_logit_milli`: weights derived from the bucket id in closed
  form (a multiplicative-mix pseudo-weight) — zero model-distribution
  problem, and every engine reproduces the score bit-for-bit, which
  is what the hard DuckDB oracle checks. A stand-in for trained
  weights; the plumbing (tokenize -> hash -> weight -> sum) is the
  production path.
- `score_with_weights`: a real trained weight TABLE (bucket,
  weight_milli) broadcast-joined onto the hashed token stream — the
  deployment path when a fastText/logistic model's weights are
  exported. Same shuffle structure: one map-side-partial groupBy per
  doc.

At 100 TB: scoring is embarrassingly parallel (per-doc), the only
aggregation is the per-doc partial sum (map-side combine on the doc
key the scan is already partitioned by), and the weight table is
O(n_buckets) — broadcast by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_funcs import tokens

HEX = "0123456789abcdef"

#: closed-form pseudo-weight parameters: weight_milli(bucket) =
#: ((bucket * MIX) % SPAN) - SPAN // 2, an integer in (-SPAN/2, SPAN/2)
#: milli-units. MIX is the Knuth multiplicative-mix constant.
MIX = 2654435761
SPAN = 2001


def feature_bucket(tok: Column, n_buckets: int = 4096, seed: int = 0) -> Column:
    """Portable hashing-trick bucket in [0, n_buckets): first 4 hex
    digits of md5(f"{seed}:" || token) mod n_buckets (same md5 family
    as operators/sketches._md5_bucket)."""
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), tok)), 1, 4)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(n_buckets)).cast("int")


def feature_bucket_sql(expr: str, n_buckets: int = 4096, seed: int = 0) -> str:
    """DuckDB twin of feature_bucket, as a SQL expression string."""
    digits = " + ".join(
        f"(instr('{HEX}', substr(md5('{seed}:' || {expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (3 - j)}"
        for j in range(4)
    )
    return f"(({digits}) % {n_buckets})"


def pseudo_weight_milli(bucket: Column) -> Column:
    """Deterministic per-bucket weight in milli-units: an integer in
    (-1000, 1000] derived from the bucket id by multiplicative mix —
    exact BIGINT arithmetic on every engine."""
    return (
        F.pmod(bucket.cast("long") * F.lit(MIX), F.lit(SPAN)) - F.lit(SPAN // 2)
    ).cast("long")


def pseudo_weight_milli_sql(bucket_expr: str) -> str:
    return f"(((CAST({bucket_expr} AS BIGINT) * {MIX}) % {SPAN}) - {SPAN // 2})"


def hashed_logit_milli(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bias_milli: int = 0,
) -> DataFrame:
    """(id, logit_milli): exact integer logit per document under the
    closed-form pseudo-weights. Empty docs score exactly the bias.
    One explode + one per-doc partial-agg groupBy; weights are
    computed inline (no join at all on this path)."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    scored = (
        tok.select(
            "id",
            pseudo_weight_milli(feature_bucket(F.col("tok"), n_buckets)).alias(
                "w"
            ),
        )
        .groupBy("id")
        .agg(F.sum("w").alias("sum_w"))
    )
    # left join back so token-less docs still get a row (bias only)
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("sum_w"), F.lit(0)) + F.lit(bias_milli)).alias(
                "logit_milli"
            ),
        )
    )


def score_with_weights(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bias_milli: int = 0,
) -> DataFrame:
    """Same plan with a trained weight table (bucket, weight_milli):
    the hashed token stream broadcast-joins the weights (O(n_buckets)
    rows — always small), unmatched buckets weigh 0."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).select("id", feature_bucket(F.col("tok"), n_buckets).alias("bucket"))
    scored = (
        tok.join(F.broadcast(weights), "bucket", "left")
        .select("id", F.coalesce(F.col("weight_milli"), F.lit(0)).alias("w"))
        .groupBy("id")
        .agg(F.sum("w").alias("sum_w"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("sum_w"), F.lit(0)) + F.lit(bias_milli)).alias(
                "logit_milli"
            ),
        )
    )
