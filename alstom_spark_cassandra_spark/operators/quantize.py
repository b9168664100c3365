"""Embedding quantization — the storage half of the similarity stack.

At 100 TB an `array<float>` embedding column is often the widest
thing in the table (64 dims × 4 B = 256 B/row before encoding).
Symmetric int8 quantization cuts that 4× with ~1e-2 cosine error,
which the IVF/LSH candidate stages tolerate (exact re-ranking happens
on the float vectors of the candidates only).

Pure built-in higher-order functions — no UDFs; deterministic
half-up rounding so quantized tables are reproducible bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embedding(vec: Column) -> Column:
    """array<float/double> -> struct(scale double, q array<tinyint>).

    Symmetric per-vector scheme: q_i = round(v_i / scale) with
    scale = max|v| / 127; zero vectors quantize to all-zero with
    scale 0.
    """
    v = vec.cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint"),
        )
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_embedding(qstruct: Column) -> Column:
    """struct(scale, q) -> array<double> approximation of the input."""
    return F.transform(
        qstruct["q"], lambda x: x.cast("double") * qstruct["scale"]
    )


def quantize_table(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "qembedding"
) -> DataFrame:
    return df.withColumn(out_col, quantize_embedding(F.col(vec_col))).drop(
        vec_col
    )
