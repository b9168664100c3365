"""The shared persistence contract (operators/index_meta): one
write/read/validate implementation adopted by the index families —
the consolidation closing the per-family drift class the round-12
SimHash-meta gap exposed (each family had re-implemented
missing-table handling slightly differently)."""

import warnings

import pytest

from alstom_spark_cassandra_spark.operators.index_meta import (
    read_index_params,
    validate_index_params,
    write_index_params,
)


def test_roundtrip_and_one_file(spark, tmp_path):
    import os

    path = str(tmp_path / "idx")
    write_index_params(
        spark, path, (3, 32, 8), "n int, num_hashes int, bands int"
    )
    row = read_index_params(spark, path)
    assert (row["n"], row["num_hashes"], row["bands"]) == (3, 32, 8)
    files = [
        f
        for f in os.listdir(f"{path}/params")
        if f.endswith(".parquet")
    ]
    assert len(files) == 1


def test_missing_table_warns_or_raises(spark, tmp_path):
    path = str(tmp_path / "empty")
    assert read_index_params(spark, path) is None
    with pytest.warns(UserWarning, match="pre-params index"):
        out = validate_index_params(
            spark, path, {"n": 3}, "why", what="MinHash index"
        )
    assert out is None
    with pytest.raises(ValueError, match="no params table"):
        validate_index_params(
            spark, path, {}, "", what="winnow index", required=True
        )


def test_mismatch_names_both_sides(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_index_params(spark, path, (3,), "max_hamming int")
    with pytest.raises(ValueError) as ei:
        validate_index_params(
            spark,
            path,
            {"max_hamming": 7},
            "the band segmentation differs",
            what="SimHash index",
        )
    msg = str(ei.value)
    # built value and asked value both named, key=value form (the
    # form the family tests pin: 'max_hamming=3', 'scale=6')
    assert "max_hamming=3" in msg and "max_hamming=7" in msg
    assert "band segmentation" in msg


def test_missing_key_warns_and_skips(spark, tmp_path):
    path = str(tmp_path / "idx")
    write_index_params(
        spark, path, (16,), "n_buckets int", table="meta"
    )
    # an older layout without 'scale': skip its comparison, still
    # validate the keys that exist
    with pytest.warns(UserWarning, match="no scale in meta"):
        row = validate_index_params(
            spark,
            path,
            {"scale": 6, "n_buckets": 16},
            "grids",
            table="meta",
            what="semantic index",
        )
    assert int(row["n_buckets"]) == 16


def test_type_lenient_comparison(spark, tmp_path):
    """int/long and bool/int physical differences must not
    false-positive — the comparison casts the persisted value to the
    expected value's Python type."""
    path = str(tmp_path / "idx")
    write_index_params(
        spark,
        path,
        (8, True),
        "k bigint, portable boolean",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        row = validate_index_params(
            spark, path, {"k": 8, "portable": True}, "", what="x"
        )
    assert row is not None


def test_family_parity(spark, tmp_path):
    """Every adopted family's pinned table reads back through the
    shared helper with the family's historical layout — the parity
    the consolidation promises (zero graded-row output changes is
    pinned by the oracle gate; this pins the table shapes)."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
        build_simhash_index,
    )
    from alstom_spark_cassandra_spark.operators.pq import (
        pq_build,
        write_pq_index,
    )
    from alstom_spark_cassandra_spark.operators.winnow import (
        build_winnow_index,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} alpha beta gamma delta epsilon zeta eta theta")
         for i in range(8)],
        "doc_id long, text string",
    )
    mh = str(tmp_path / "mh")
    build_minhash_index(docs, mh, "text", "doc_id", n=3,
                        num_hashes=16, bands=4)
    row = read_index_params(spark, mh)
    assert (row["n"], row["num_hashes"], row["bands"]) == (3, 16, 4)

    sh = str(tmp_path / "sh")
    build_simhash_index(docs, sh, "text", "doc_id", max_hamming=2)
    assert read_index_params(spark, sh)["max_hamming"] == 2

    wn = str(tmp_path / "wn")
    build_winnow_index(docs, wn, "text", "doc_id", k=3, w=4)
    row = read_index_params(spark, wn)
    assert (int(row["k"]), int(row["w"])) == (3, 4)

    import random

    rng = random.Random(7)
    vecs = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    pq = str(tmp_path / "pq")
    init = vecs.limit(3).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("embedding").alias("cv"),
    )
    codes, books = pq_build(vecs, init, m_sub=2, n_iters=1)
    write_pq_index(codes, books, pq)
    row = read_index_params(spark, pq, table="meta")
    assert row is not None and int(row["m_sub"]) == 2
