"""Graph ranking over DataFrames: fixed-iteration integer PageRank.

Companion to the connected-components operator (operators/dedup.py's
pointer-jumping CC): where CC answers "which near-dup group", PageRank
answers "which members are central" — e.g. ranking canonical-document
candidates inside a duplicate cluster, or weighting a citation/link
graph during corpus curation.

Portability contract (hard unrolled-CTE oracle, the k-means/PCA
precedent): ranks are integer micro-units and one round is

    r'(v) = jump + Σ_{u→v} floor((r(u) · d) / (100 · deg(u)))

with d the damping percentage and jump = (100−d)% · 1e6 / 100 — every
term an exact integer (the double division inside floor is exact:
operands stay ≤ 2^53), so any engine reproduces every round
bit-for-bit. Dangling vertices (no out-edges) simply don't distribute
— their rank stays jump + incoming mass; this is the simple (non-
redistributing) dangling policy, stated so the oracle matches it.

Scale shape: per round, one equi-join of edges against the vertex-rank
table + one map-side-partial groupBy on dst — the Pregel pattern as
plain DataFrame ops. Edges and degrees are computed once, persisted
for the duration of the iteration, and RELEASED before return: the
final vertex-sized rank table is eagerly localCheckpoint-ed,
truncating the n_iters-deep lineage, so the operator leaves nothing
input-scale in the cache (r5 ADVICE: caches accumulated across a
131-query session). NOTE: localCheckpoint trades fault tolerance for
speed — blocks live only on their executors, with no lineage to
recompute after executor loss. A CLUSTER deployment that must
survive failures should set a checkpoint dir and use reliable
`checkpoint()` instead (and checkpoint every ~5 rounds inside longer
iterations); the local variant is exact in any single-JVM run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    vertex_col: str,
    n_iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(v, rank_micro) after exactly `n_iters` rounds from the uniform
    1e6 start. `edges` has columns (src, dst), directed — pass both
    directions for an undirected graph. Vertices absent from edges
    keep the jump mass."""
    jump = (100 - damping_pct) * MICRO // 100
    e = edges.select("src", "dst").persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    try:
        r = _pagerank_rounds(e, deg, vertices, vertex_col, n_iters,
                             damping_pct, jump)
        # materialize the vertex-sized result BEFORE releasing the
        # caches it was built from; also truncates n_iters of lineage
        return r.localCheckpoint(eager=True)
    finally:
        e.unpersist()
        deg.unpersist()


def _pagerank_rounds(e, deg, vertices, vertex_col, n_iters, damping_pct, jump):
    r = vertices.select(
        F.col(vertex_col).alias("v"), F.lit(MICRO).cast("long").alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            e.join(deg, "src")
            .join(r, F.col("src") == F.col("v"))
            .select(
                F.col("dst"),
                F.floor(
                    (F.col("rank") * F.lit(damping_pct)).cast("double")
                    / (F.lit(100) * F.col("deg")).cast("double")
                )
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        r = (
            vertices.select(F.col(vertex_col).alias("v"))
            .join(contrib, F.col("v") == F.col("dst"), "left")
            .select(
                "v",
                (F.lit(jump) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
        )
    return r.select(F.col("v"), F.col("rank").alias("rank_micro"))
