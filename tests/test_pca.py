"""Power-iteration PCA: convergence, bounded state, determinism."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.pca import (
    gram_matrix,
    power_iteration,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_gram_cells_bounded_and_symmetric(spark):
    emb = _vecs(
        spark,
        [(i, [float(i % 3), float(i % 5), 1.0, 0.5]) for i in range(200)],
    )
    g = gram_matrix(emb)
    cells = g.collect()
    assert len(cells) <= 16  # d^2, regardless of 200 input rows
    got = {(r.i, r.j): r.c for r in cells}
    for (i, j), c in got.items():
        assert got[(j, i)] == c  # Gram symmetry survives quantization


def test_power_iteration_finds_dominant_axis(spark):
    """Data lying (noisily) along axis 2 of 4: after 3 rounds the
    iterate's largest component must be axis 2 at the |v|inf = 1000
    cap, with the others well below."""
    rows = []
    for i in range(300):
        main = 10.0 if i % 2 == 0 else -10.0  # symmetric: Gram, not mean
        rows.append(
            (i, [0.1 * (i % 7), main * (1 + 0.01 * (i % 5)), 0.2, 0.05])
        )
    g = gram_matrix(_vecs(spark, rows))
    v = {r.pos: r.v_milli for r in power_iteration(g, dim=4).collect()}
    assert v[2] == 1000
    assert all(abs(v[p]) < 300 for p in (1, 3, 4))


def test_power_iteration_deterministic_across_partitionings(spark):
    emb = _vecs(
        spark,
        [(i, [float((i * 7) % 11), float((i * 3) % 13), 1.0]) for i in range(120)],
    )
    a = power_iteration(gram_matrix(emb), dim=3).collect()
    b = power_iteration(
        gram_matrix(emb.repartition(13)), dim=3
    ).collect()
    assert sorted((r.pos, r.v_milli) for r in a) == sorted(
        (r.pos, r.v_milli) for r in b
    )


def test_power_iteration_no_collect_and_no_cache_leftovers(spark):
    """Collect-free contract, round-6 form: the operator never pulls
    corpus-scale data to the driver (no .collect inside) and releases
    its input-scale Gram cache before return — the ONLY persisted
    artifact left is the returned dim-row local checkpoint (a local
    checkpoint IS a persisted RDD; it cannot be unpersisted without
    destroying the result). Callers that are done with the result
    drop it via free_local_checkpoints (exercised here)."""
    from alstom_spark_cassandra_spark.operators import free_local_checkpoints

    free_local_checkpoints(spark)
    emb = _vecs(spark, [(i, [1.0, 2.0]) for i in range(10)])
    out = power_iteration(gram_matrix(emb), dim=2)
    jsc = spark.sparkContext._jsc.sc()
    # the d^2 Gram cache is gone; only the dim-row checkpoint remains
    assert jsc.getPersistentRDDs().size() <= 1
    # result is usable after the release (checkpoint, not lineage)
    assert len(out.collect()) == 2
    free_local_checkpoints(spark)
    assert jsc.getPersistentRDDs().size() == 0
