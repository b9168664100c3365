import math

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.quantize import (
    dequantize_embedding,
    quantize_embedding,
    quantize_table,
)
from alstom_spark_cassandra_spark.operators.similarity import cosine


def test_quantize_roundtrip_cosine(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    rt = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("orig"),
        dequantize_embedding(quantize_embedding(F.col("embedding"))).alias("deq"),
    ).select("vec_id", cosine(F.col("orig"), F.col("deq")).alias("cos"))
    worst = rt.agg(F.min("cos")).collect()[0][0]
    assert worst > 0.999  # int8 symmetric keeps cosine within 1e-3


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id int, embedding array<double>")
    row = df.select(quantize_embedding(F.col("embedding")).alias("s")).collect()[0]["s"]
    assert row["scale"] == 0.0 and list(row["q"]) == [0, 0, 0]


def test_quantize_table_shrinks_schema(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    q = quantize_table(emb)
    assert "embedding" not in q.columns and "qembedding" in q.columns
    assert q.count() == 10
