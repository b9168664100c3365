"""Skew mitigation: salted equi-join.

Spark 3+'s AQE skew-join handles most sort-merge skew by splitting
oversized partitions at runtime, but it cannot help when (a) the join
is forced to a shuffled hash join whose build side explodes on one
key, (b) the skew is on the STREAM side of a broadcast-unfriendly
join, or (c) a deterministic, planner-independent layout is required
(e.g. a persisted pre-shuffled table). Salting is the classical
explicit fix: spread each hot key's rows across `n_salts` reducers by
joining on (key, salt), replicating the other side once per salt.

The contract here is exactness: `salted_join` must return EXACTLY the
rows of the unsalted join (pinned by the registry oracle, which runs
the PLAIN join in SQL) — salting is a physical rewrite, never a
semantic one. Cost: the replicated side grows n_salts×, so use it
when that side is small relative to the skewed side (the usual
many-to-one fact⋈dim shape); the salt column lives only inside the
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed ⋈ other` on `on`, executed as a join on
    (on + salt): each skewed-side row gets a deterministic salt in
    [0, n_salts) hashed from its full row (so one hot key's rows
    spread evenly), and `other` replicates once per salt value.

    `how` is limited to inner/left/left_semi/left_anti — shapes where
    an unmatched OTHER-side row never surfaces, so the n_salts-fold
    replication cannot duplicate output. Right/full joins would emit
    each unmatched other-side row once per salt; use the plain join
    (or swap sides) for those.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, "
            f"got {how!r}: replicating the other side would duplicate "
            f"its unmatched rows in right/full joins"
        )
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("int")
    l = skewed.withColumn("__salt", salt)
    r = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])),
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")
