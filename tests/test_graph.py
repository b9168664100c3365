"""Integer PageRank: hand-checked rounds, dangling policy,
partitioning invariance."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.graph import pagerank


def _run(spark, edges, verts, n_iters=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in verts], "doc_id long")
    return {
        r.v: r.rank_micro
        for r in pagerank(e, v, "doc_id", n_iters=n_iters).collect()
    }


def _py_pagerank(edges, verts, n_iters=3):
    from collections import Counter, defaultdict

    deg = Counter(s for s, _ in edges)
    r = {v: 1_000_000 for v in verts}
    for _ in range(n_iters):
        mass = defaultdict(int)
        for s, d in edges:
            mass[d] += (r[s] * 85) // (100 * deg[s])
        r = {v: 150_000 + mass.get(v, 0) for v in verts}
    return r


def test_pagerank_matches_python_reference(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 1)]
    verts = [1, 2, 3, 4, 5]
    assert _run(spark, edges, verts) == _py_pagerank(edges, verts)


def test_dangling_vertex_keeps_jump_mass(spark):
    got = _run(spark, [(1, 2)], [1, 2, 3])
    assert got[3] == 150_000          # isolated: jump only
    assert got[1] == 150_000          # no in-edges after round 1
    assert got[2] > got[1]            # receives 1's mass


def test_pagerank_partitioning_invariant(spark):
    edges = [(i, (i * 3) % 20) for i in range(20) if i != (i * 3) % 20]
    verts = list(range(20))
    a = _run(spark, edges, verts)
    e = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    v = spark.createDataFrame([(x,) for x in verts], "doc_id long").repartition(3)
    b = {
        r.v: r.rank_micro for r in pagerank(e, v, "doc_id").collect()
    }
    assert a == b
