"""Triangle counting: hand graphs (K4, path, star), equality with a
Python brute force under the any-acyclic-orientation theorem, the
co-occurrence pairing + hub cap, and the plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.graph import (
    cooccurrence_edges,
    triangle_counts,
)


def _counts(df):
    return {r["v"]: r["n_tri"] for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()


def test_k4_plus_pendant(spark):
    k4 = list(itertools.combinations(range(4), 2))
    got = _counts(triangle_counts(_edges_df(spark, k4 + [(3, 99)])))
    # K4 has 4 triangles; every K4 vertex sits in 3; the pendant (99)
    # is in none and therefore absent
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graphs(spark):
    path = [(i, i + 1) for i in range(6)]
    star = [(0, i) for i in range(1, 8)]  # hub: many wedges, no closures
    assert _counts(triangle_counts(_edges_df(spark, path))) == {}
    assert _counts(triangle_counts(_edges_df(spark, star))) == {}


def test_matches_brute_force(spark):
    # deterministic pseudo-random graph on 25 vertices
    pairs = sorted(
        {
            (a, b)
            for a in range(25)
            for b in range(a + 1, 25)
            if (a * 31 + b * 17 + a * b) % 5 == 0
        }
    )
    eset = set(pairs)
    want = {}
    for x, y, z in itertools.combinations(range(25), 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1
    got = _counts(triangle_counts(_edges_df(spark, pairs)))
    assert got == want and sum(want.values()) > 0


def test_cooccurrence_edges_and_hub_cap(spark):
    rows = [("o1", 1), ("o1", 2), ("o1", 3), ("o2", 2), ("o2", 3),
            ("o2", 2)]  # duplicate membership collapses
    hub = [("big", i) for i in range(10)]
    df = spark.createDataFrame(rows + hub, "g string, i long")
    exact = cooccurrence_edges(df, "g", "i")
    got = {(r.a, r.b) for r in exact.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got
    # the hub (items 0..9) subsumes the o-groups' 3 edges: C(10,2)
    assert len(got) == 45
    capped = cooccurrence_edges(df, "g", "i", max_group_size=5)
    assert {(r.a, r.b) for r in capped.collect()} == {(1, 2), (1, 3), (2, 3)}


def test_plan_no_cartesian(spark):
    df = _edges_df(spark, [(i, i + 1) for i in range(10)])
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
