"""Edit-distance record linkage via deletion-neighborhood blocking.

Entity resolution ("are these two rows the same real-world thing?")
needs all pairs within a small Levenshtein distance — and the naive
plan is the O(n²) cross join that cannot exist at corpus scale.  The
FastSS / SymSpell observation makes the candidate step a plain
equi-join: if ED(s, t) <= d then the d-deletion neighborhoods of s
and t intersect — Del_d(x) = every string reachable from x by
deleting at most d characters.  (Each of the <= d edit operations in
an optimal alignment can be neutralized by deleting one character
from one side or the other, so both strings reach a common
subsequence within d deletions each.)  The converse does NOT hold, so
candidates are verified with the exact ``levenshtein`` builtin — the
scheme is lossless by the forward direction and exact by the verify
step, which is why the graded query's oracle can be the brute-force
cross join itself: any blocking miss would surface as a missing row.

Cost model: |Del_1(s)| = len(s) + 1 and |Del_2(s)| = O(len(s)^2) —
for d <= 2 and join-key-sized strings (names, titles, SKUs) the
exploded variant table is a small constant factor over the input,
every variant is built row-locally with built-in SQL (no UDF), and
the only shuffle is the hash-bucketed equi-join on the variant
string.  At 100 TB this replaces an impossible cross join with one
explode + one equi-join + one verify join; ubiquitous variants (two
ids sharing a hub variant string) are bounded by d and the alphabet,
not the corpus, so there is no LSH-style hub-bucket failure mode.

No reference analog (the reference's join surface is exact-key
equi-joins); Spark-first design throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_variants(col: str, max_dist: int) -> str:
    """SQL expression: array_distinct of every string reachable from
    ``col`` by deleting at most ``max_dist`` characters (the string
    itself included).  Built entirely from built-in array lambdas —
    and the base string is a plain column reference, so there is no
    expression-inlining hazard (cf. operators/winnow.py)."""
    del1 = (
        "transform(sequence(0, length({s})), "
        "i -> concat(substring({s}, 1, i), substring({s}, i + 2)))"
    )
    out = del1.format(s=col)
    for _ in range(max_dist - 1):
        out = (
            f"flatten(transform(array_distinct({out}), "
            + "x -> "
            + del1.format(s="x")
            + "))"
        )
    return f"array_distinct({out})"


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """(a, b, dist) — every unordered pair of rows whose ``str_col``
    values are within Levenshtein distance ``max_dist`` (a < b by
    ``id_col``; exact duplicates appear with dist 0).

    Candidates come from the deletion-neighborhood equi-join (lossless
    — see module docstring), then the exact distance is verified and
    attached.  ``max_dist`` is capped at 2: the neighborhood grows
    O(len^d) and beyond 2 the candidate set stops being selective —
    use the q-gram / LSH family for looser matching.
    """
    if not 1 <= max_dist <= 2:
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    base = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    e = base.select(
        "id", F.explode(F.expr(deletion_variants("s", max_dist))).alias("v")
    )
    cand = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.v") == F.col("r.v")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return (
        cand.join(base.select(F.col("id").alias("a"), F.col("s").alias("sa")), "a")
        .join(base.select(F.col("id").alias("b"), F.col("s").alias("sb")), "b")
        .withColumn("dist", F.levenshtein("sa", "sb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("a", "b", "dist")
    )
