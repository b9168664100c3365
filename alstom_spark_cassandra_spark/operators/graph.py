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


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_group_size: int | None = None,
) -> DataFrame:
    """Distinct undirected co-occurrence edges (a, b), a < b: two
    items are connected iff some group contains both (the
    market-basket / co-purchase graph).

    Pair fan-out is quadratic in GROUP size, not corpus size — fine
    when groups are naturally bounded (order baskets, sentence
    windows), but one hub group of 100k items would emit 5e9 pairs.
    ``max_group_size`` drops oversized groups BEFORE pairing (one
    aggregation on the deduplicated membership table), the same
    stop-hub discipline as winnow_overlap_pairs' fingerprint cap;
    None = exact mode for bounded slices (the oracle path)."""
    gi = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    if max_group_size is not None:
        keep = (
            gi.groupBy("g")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") <= max_group_size)
            .select("g")
        )
        gi = gi.join(keep, "g")
    return (
        gi.alias("l")
        .join(
            gi.alias("r"),
            (F.col("l.g") == F.col("r.g")) & (F.col("l.i") < F.col("r.i")),
        )
        .select(F.col("l.i").alias("a"), F.col("r.i").alias("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(v, n_tri) — how many triangles each vertex participates in,
    from distinct undirected edges (a, b) with a < b.  Vertices in no
    triangle are absent (count 0).

    Degree orientation (the O(m^1.5) classic): re-orient every edge
    from its lower-(degree, id) endpoint to the higher one.  The
    orientation is acyclic, so each triangle has exactly one vertex
    with two OUT-edges and is generated exactly once as a wedge from
    that vertex; out-degrees under this orientation are bounded by
    O(sqrt(m)) regardless of hub degree, which is what keeps the
    wedge table from exploding on skewed graphs — orienting by id
    alone lets one low-id hub with degree d emit d^2/2 wedges.
    Because ANY acyclic orientation finds each triangle exactly once,
    an oracle using plain id order must agree — the graded query's
    DuckDB twin does exactly that.

    Plan: two self-equi-joins (wedge build on the shared source, then
    closure check on (dst1, dst2)) + one explode of the three corners
    + one count.  Everything shuffles on vertex/edge keys only.
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        edges.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("ddeg"),
        )
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    rank_lt = (F.col("w1.ddeg") < F.col("w2.ddeg")) | (
        (F.col("w1.ddeg") == F.col("w2.ddeg"))
        & (F.col("w1.dst") < F.col("w2.dst"))
    )
    wedges = w1.join(
        w2, (F.col("w1.src") == F.col("w2.src")) & rank_lt
    ).select(
        F.col("w1.src").alias("u"),
        F.col("w1.dst").alias("x"),
        F.col("w2.dst").alias("y"),
    )
    tri = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("y")),
        ["x", "y"],
    )
    return (
        tri.select(F.explode(F.array("u", "x", "y")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
