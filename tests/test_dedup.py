"""Dedup operator tests on small synthetic corpora."""

import pytest
from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    # longer docs -> stable simhash (few tokens make every bit-sum
    # hover near zero and a one-word edit flips many bits)
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away today "
        "while the river flows quietly past the old mill near the stone bridge "
        "under a pale winter sky full of slow grey clouds drifting north"
    )
    near = base.replace("today", "now")
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1
        (4, "completely different text about spark query engines and shuffles"),
        (5, "another unrelated document mentioning parquet column pruning"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_keeps_min_id(docs):
    out = dedup_exact(docs, "text", "doc_id")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5]  # doc 2 dropped, smallest id kept


def test_ngram_jaccard_exact_pairs(docs):
    out = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    pairs = {(r.a, r.b): r.jaccard for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    out = minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs  # near dup shares most shingles
    assert (4, 5) not in pairs


def test_simhash_near_dups(docs):
    out = simhash_pairs(docs, "text", "doc_id", max_hamming=8)
    pairs = {(r.a, r.b): r.hamming for r in out.collect()}
    assert pairs[(1, 2)] == 0  # identical text -> identical fingerprint
    assert (1, 3) in pairs  # one-word change stays within distance
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_ngram_jaccard_exact_despite_frequency_filter(spark):
    """Identical docs whose every shingle exceeds max_shingle_freq for
    candidate purposes must still verify with jaccard == 1.0 when
    proposed — and sizes must come from full sets, never the filtered
    subset (regression: filtered intersection understated Jaccard)."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(1, 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, "text", "doc_id", n=1, threshold=0.99,
                              max_shingle_freq=10)
    pairs = {(r.a, r.b): r.jaccard for r in out.collect()}
    assert pairs == {(1, 2): 1.0, (1, 3): 1.0, (2, 3): 1.0}


def test_minhash_rejects_bad_band_count(docs):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=32)


def test_embedding_dup_pairs(spark):
    import random

    rng = random.Random(3)
    v1 = [rng.gauss(0, 1) for _ in range(16)]
    v2 = [x + rng.gauss(0, 0.01) for x in v1]  # near dup
    v3 = [rng.gauss(0, 1) for _ in range(16)]
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<double>"
    )
    out = embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.95)
    pairs = {(r.a, r.b): r.cosine for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs


@pytest.fixture(scope="module")
def recall_corpus(spark):
    """40 random-word docs, each with one near-dup partner (a few words
    replaced): the ground-truth pair set for recall gates is exactly
    the 40 constructed (2i, 2i+1) pairs."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{j:03d}" for j in range(400)]
    rows = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(60)]
        near = list(words)
        for _ in range(3):  # ~3 of 60 words replaced -> high jaccard
            near[rng.randrange(60)] = rng.choice(vocab)
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(near)))
    truth = {(2 * i, 2 * i + 1) for i in range(40)}
    return spark.createDataFrame(rows, "doc_id long, text string"), truth


def test_minhash_recall_vs_exact_jaccard(spark, recall_corpus):
    """Recall gate: banded MinHash candidates must recover >= 90% of
    the pairs the EXACT n-gram Jaccard finds at the same threshold
    (the verify step makes precision exact; banding only risks
    recall)."""
    docs, _ = recall_corpus
    exact = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.5
        ).collect()
    }
    approx = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, num_hashes=32, bands=16,
            threshold=0.5,
        ).collect()
    }
    assert exact, "fixture must produce exact pairs"
    assert len(approx & exact) / len(exact) >= 0.9
    # precision is exact by construction: every reported pair verifies
    assert approx <= exact


def test_simhash_recall_on_constructed_near_dups(spark, recall_corpus):
    """Recall gate: the pigeonhole-banded SimHash pass must find >= 90%
    of the constructed near-dup pairs at fixture scale."""
    docs, truth = recall_corpus
    found = {
        (r.a, r.b)
        for r in simhash_pairs(docs, "text", "doc_id", max_hamming=10).collect()
    }
    assert len(found & truth) / len(truth) >= 0.9


def test_embedding_dup_recall_vs_brute_force(spark):
    """Recall gate: multi-table RH-LSH must recover >= 90% of the pairs
    brute-force cosine finds at the same threshold; precision is exact
    (candidates verify with true cosine)."""
    import math
    import random

    rng = random.Random(99)
    rows = []
    for i in range(50):
        v = [rng.gauss(0, 1) for _ in range(16)]
        dup = [x + rng.gauss(0, 0.02) for x in v]
        rows.append((2 * i, v))
        rows.append((2 * i + 1, dup))

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    exact = {
        (a, b)
        for ai, (a, va) in enumerate(rows)
        for b, vb in (r for r in rows[ai + 1:])
        if cos(va, vb) >= 0.95
    }
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    approx = {
        (r.a, r.b)
        for r in embedding_dup_pairs(
            df, "embedding", "vec_id", threshold=0.95, planes=12, tables=3
        ).collect()
    }
    assert exact, "fixture must produce exact pairs"
    assert len(approx & exact) / len(exact) >= 0.9
    assert approx <= exact


def test_connected_components_chain_and_singleton(spark):
    from alstom_spark_cassandra_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    verts = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    got = {
        r.v: r.cluster
        for r in connected_components(
            edges, vertices=verts, vertex_col="doc_id"
        ).collect()
    }
    # chain 1-2-3 collapses to 1; pair 4-5 to 4; 6 is a singleton
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_connected_components_long_chain_converges(spark):
    """A 33-vertex path exercises pointer jumping (min-propagation
    alone would need 32 rounds; jumping needs ~log2)."""
    from alstom_spark_cassandra_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "a long, b long"
    )
    got = connected_components(edges, max_iter=10).collect()
    assert {r.cluster for r in got} == {0} and len(got) == 33


def test_dedup_corpus_keeps_canonical(spark, docs):
    from alstom_spark_cassandra_spark.operators.dedup import dedup_corpus

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = dedup_corpus(docs, pairs, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 4, 5]


def test_incremental_dedup_index_roundtrip(spark, tmp_path):
    """Build an index on an old corpus, dedup a new batch against it:
    the exact re-crawl is found at est=1.0, the near-dup at a lower
    but high estimate, the fresh doc matches nothing — and the old
    corpus text is never passed to the search."""
    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
        incremental_dedup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 5
    old = spark.createDataFrame(
        [(1, base), (2, "completely different text about spark engines " * 5)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(old, idx, "text", "doc_id")

    new = spark.createDataFrame(
        [
            (101, base),                        # exact re-crawl of 1
            (102, base + "with a tiny suffix"),  # near-dup of 1
            (103, "entirely novel content nothing shared here " * 5),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b): r.est_jaccard
        for r in incremental_dedup_pairs(
            spark, new, idx, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert got[(1, 101)] == 1.0
    assert (1, 102) in got and 0.5 <= got[(1, 102)] < 1.0
    assert not any(103 in pair for pair in got)
    # new x new: 101 and 102 are near-dups of each other too
    assert (101, 102) in got


def test_incremental_simhash_index_roundtrip(spark, tmp_path):
    from alstom_spark_cassandra_spark.operators.dedup import (
        build_simhash_index,
        incremental_simhash_pairs,
    )

    base = [f"word{i:02d}" for i in range(48)]  # 48 distinct tokens
    old = spark.createDataFrame(
        [(1, " ".join(base)),
         (2, "totally different words " + "x y z w v u t s " * 6)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "sh_idx")
    build_simhash_index(old, idx, "text", "doc_id", max_hamming=7)

    near = base.copy()
    near[0] = "CHANGED"  # 1/48 of the weight moves -> small hamming
    new = spark.createDataFrame(
        [(101, " ".join(base)),        # exact re-crawl of 1
         (102, " ".join(near)),        # near-dup of 1
         (103, "novel content entirely " + "p q r s t u v w " * 6)],
        "doc_id long, text string",
    )
    rows = incremental_simhash_pairs(
        spark, new, idx, "text", "doc_id", max_hamming=7
    ).collect()
    # each pair exactly once: the new-x-new double-orientation match
    # must collapse (regression: duplicated (a,b) rows)
    assert len(rows) == len({(r.a, r.b) for r in rows})
    got = {(r.a, r.b): r.hamming for r in rows}
    assert got[(1, 101)] == 0
    assert (1, 102) in got and got[(1, 102)] <= 7
    assert (101, 102) in got
    assert not any(103 in p_ for p_ in got)


def test_dedup_corpus_prefer_col_keeps_best(spark):
    """With prefer_col, each cluster keeps its highest-preference
    member (ties -> min id), not the min id."""
    from alstom_spark_cassandra_spark.operators.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    # cluster {1,2,3} and {4}; 9 untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    kept_default = {r.doc_id for r in dedup_corpus(docs, pairs, "doc_id").collect()}
    assert kept_default == {1, 4, 9}  # min id wins
    kept_best = {
        r.doc_id
        for r in dedup_corpus(
            docs, pairs, "doc_id", prefer_col="quality"
        ).collect()
    }
    assert kept_best == {2, 4, 9}  # highest quality, tie broken by min id


def test_dedup_corpus_prefer_col_string_ids(spark):
    """Regression (ADVICE r4): with STRING ids + prefer_col, the old
    arithmetic -id tiebreak cast to NULL and silently made the dedup
    a no-op. The row_number pick must work for any orderable id type."""
    from alstom_spark_cassandra_spark.operators.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [("d1", 0.2), ("d2", 0.9), ("d3", 0.9), ("d4", 0.5), ("d9", 0.1)],
        "doc_id string, quality double",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3")], "a string, b string"
    )
    kept = {
        r.doc_id
        for r in dedup_corpus(
            docs, pairs, "doc_id", prefer_col="quality"
        ).collect()
    }
    assert kept == {"d2", "d4", "d9"}  # highest quality, tie -> min id


def test_hyperplane_lsh_eval_counts_consistent(spark):
    """The eval row's counters recomputed from first principles on
    the registry slice: candidates = same-bucket pairs under the
    portable hyperplanes, truth = exact rounded-cosine pairs, hits =
    the intersection — and the grid-blocked truth join must equal a
    driver-side brute force exactly (no pair lost to blocking)."""
    import itertools
    import math

    from alstom_spark_cassandra_spark.operators.dedup import (
        _portable_hyperplanes,
        hyperplane_lsh_eval,
    )
    from alstom_spark_cassandra_spark.sources import load_table

    emb = load_table(
        spark, "/root/testdata/sf0.001", "embeddings"
    ).filter("vec_id < 120")
    rows = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.collect()
    }
    w = _portable_hyperplanes(6, 64)

    def bucket(v):
        b = 0
        for p in range(6):
            d = 0.0
            for j in range(64):
                d += w[p][j] * v[j]
            if d > 0:
                b += 1 << p
        return b

    def cos6(x, y):
        d = sum(a * b for a, b in zip(x, y))
        n = math.sqrt(sum(a * a for a in x)) * math.sqrt(
            sum(a * a for a in y)
        )
        return math.floor(d / n * 1_000_000 + 0.5) / 1_000_000.0

    bk = {i: bucket(v) for i, v in rows.items()}
    cand = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if bk[a] == bk[b]
    }
    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if cos6(rows[a], rows[b]) >= 0.2
    }
    got = hyperplane_lsh_eval(
        emb, "embedding", "vec_id", dim=64, threshold=0.2, planes=6
    ).collect()[0]
    assert got.n_cand == len(cand)
    assert got.n_true == len(truth)
    assert got.n_hit == len(cand & truth)


def test_minhash_index_append_chains_batches(spark, tmp_path):
    """update_index write-back: batch A's signatures/bands append to
    the index, so batch B pairs against A with no rebuild — and the
    PRE-append snapshot contract holds: A's own returned pairs,
    evaluated AFTER the append already ran, contain no duplicate
    rows and no hits against A's own appended rows."""
    from alstom_spark_cassandra_spark.operators.dedup import (
        build_minhash_index,
        incremental_dedup_pairs,
    )

    base = spark.createDataFrame(
        [(1, "x y z w v u t s"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh_chain")
    build_minhash_index(base, path, "text", "doc_id")
    batch_a = spark.createDataFrame(
        [(11, "x y z w v u t s"), (12, "aa bb cc dd ee ff gg hh")],
        "doc_id long, text string",
    )
    out_a = incremental_dedup_pairs(
        spark, batch_a, path, "text", "doc_id",
        threshold=1.0, update_index=True,
    ).collect()
    pairs_a = [(r.a, r.b) for r in out_a]
    assert sorted(pairs_a) == [(1, 11)]  # no dups, no self-index hits

    batch_b = spark.createDataFrame(
        [(21, "aa bb cc dd ee ff gg hh"), (22, "x y z w v u t s")],
        "doc_id long, text string",
    )
    out_b = incremental_dedup_pairs(
        spark, batch_b, path, "text", "doc_id", threshold=1.0
    ).collect()
    pairs_b = sorted((r.a, r.b) for r in out_b)
    # (12, 21) and (11, 22) exist ONLY because A was appended
    assert pairs_b == [(1, 22), (11, 22), (12, 21)]


def test_simhash_index_append_chains_batches(spark, tmp_path):
    """The Hamming twin of the MinHash chain pin."""
    from alstom_spark_cassandra_spark.operators.dedup import (
        build_simhash_index,
        incremental_simhash_pairs,
    )

    base = spark.createDataFrame(
        [(1, "x y z w v u t s"), (2, "p q r s t u v w")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sh_chain")
    build_simhash_index(base, path, "text", "doc_id")
    batch_a = spark.createDataFrame(
        [(11, "x y z w v u t s"), (12, "aa bb cc dd ee ff gg hh")],
        "doc_id long, text string",
    )
    # probe with the INDEX's max_hamming (band segmentation is a
    # function of it); identical texts land at hamming 0
    out_a = incremental_simhash_pairs(
        spark, batch_a, path, "text", "doc_id",
        max_hamming=3, update_index=True,
    ).collect()
    assert sorted((r.a, r.b) for r in out_a if r.hamming == 0) == [(1, 11)]
    assert len(out_a) == len({(r.a, r.b) for r in out_a})  # no dup rows

    batch_b = spark.createDataFrame(
        [(21, "aa bb cc dd ee ff gg hh"), (22, "x y z w v u t s")],
        "doc_id long, text string",
    )
    out_b = incremental_simhash_pairs(
        spark, batch_b, path, "text", "doc_id", max_hamming=3
    ).collect()
    # (12, 21) and (11, 22) exist ONLY because A was appended
    assert sorted((r.a, r.b) for r in out_b if r.hamming == 0) == [
        (1, 22), (11, 22), (12, 21)
    ]


def test_simhash_index_rejects_mismatched_max_hamming(spark, tmp_path):
    """An append computed under a different max_hamming writes rows
    under a different band segmentation — permanent index corruption
    with silent misses forever after.  The guard must fail loudly,
    exactly like the MinHash params contract."""
    import pytest

    from alstom_spark_cassandra_spark.operators.dedup import (
        build_simhash_index,
        incremental_simhash_pairs,
    )

    base = spark.createDataFrame(
        [(1, "x y z w v u t s")], "doc_id long, text string"
    )
    path = str(tmp_path / "sh_guard")
    build_simhash_index(base, path, "text", "doc_id", max_hamming=3)
    batch = spark.createDataFrame(
        [(2, "x y z w v u t s")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_hamming=3"):
        incremental_simhash_pairs(
            spark, batch, path, "text", "doc_id",
            max_hamming=7, update_index=True,
        )
    # the guard fired BEFORE any write: the index still has only the
    # build's band rows
    bands = spark.read.parquet(f"{path}/bands")
    assert bands.select("doc").distinct().count() == 1


def test_hyperplane_multi_table_eval_monotone_and_consistent(spark):
    """The multi-table recall row's internal invariants: candidate
    sets NEST (n_cand and n_hit are non-decreasing in T), n_true is
    constant across rows, hits never exceed candidates or truth,
    and T=1 agrees with a directly-computed single-table candidate
    count under the same seed namespace."""
    from alstom_spark_cassandra_spark.operators.dedup import (
        hyperplane_multi_table_eval,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 200)
    rows = hyperplane_multi_table_eval(
        emb, "embedding", "vec_id", dim=64, threshold=0.2,
        planes=6, table_counts=(1, 2, 4),
    ).collect()
    assert [r.tables for r in rows] == [1, 2, 4]
    assert len({r.n_true for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_cand >= a.n_cand and b.n_hit >= a.n_hit
    for r in rows:
        assert r.n_hit <= min(r.n_cand, r.n_true)
        if r.n_cand:
            assert r.precision_micro == int(
                r.n_hit * 1_000_000.0 / r.n_cand + 0.5
            )


def test_winnow_index_append_chains_batches(spark, tmp_path):
    """The winnow member of the append family: batch B finds a pair
    against batch A ONLY because A appended (update_index=True);
    batch A's own result reads the PRE-append snapshot (no
    self-pairs); winnowing params come from the index, not the
    caller."""
    from alstom_spark_cassandra_spark.operators.winnow import (
        build_winnow_index,
        incremental_winnow_overlap,
    )

    base = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely different content about parquet buckets")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "wn_chain")
    build_winnow_index(base, path, "text", "doc_id", k=8, w=4)
    p = spark.read.parquet(f"{path}/params").first()
    assert (p["k"], p["w"], p["portable"]) == (8, 4, False)

    copy = "the quick brown fox jumps over the lazy dog tonight"
    batch_a = spark.createDataFrame(
        [(11, copy)], "doc_id long, text string"
    )
    out_a = incremental_winnow_overlap(
        spark, batch_a, path, "text", "doc_id",
        threshold=0.99, update_index=True,
    ).collect()
    assert {(r.a, r.b) for r in out_a} == {(1, 11)}
    assert all(r.overlap == 1.0 for r in out_a)

    batch_b = spark.createDataFrame(
        [(21, copy)], "doc_id long, text string"
    )
    out_b = incremental_winnow_overlap(
        spark, batch_b, path, "text", "doc_id", threshold=0.99
    ).collect()
    # (11, 21) exists ONLY via the append; (1, 21) via the base index
    assert {(r.a, r.b) for r in out_b} == {(1, 21), (11, 21)}


def test_winnow_cap_immune_to_double_appended_batch(spark, tmp_path):
    """The max_docs_per_fp cap must count DISTINCT docs, not raw
    index rows: a crash between the index append and the ingest
    sink's done marker double-appends a batch's (doc, fp) rows on
    replay, and a raw row count would push a fingerprint whose TRUE
    doc count is exactly at the cap over it — every future batch
    would silently miss its pairs until a rebuild, breaking the
    ingest core's 'double-append costs bytes, not correctness'
    contract for this member."""
    from alstom_spark_cassandra_spark.operators.winnow import (
        build_winnow_index,
        incremental_winnow_overlap,
    )

    copy = "the quick brown fox jumps over the lazy dog tonight"
    base = spark.createDataFrame(
        [(1, copy)], "doc_id long, text string"
    )
    path = str(tmp_path / "wn_dbl")
    build_winnow_index(base, path, "text", "doc_id", k=8, w=4)
    batch_a = spark.createDataFrame(
        [(11, copy)], "doc_id long, text string"
    )
    # the crash replay: the SAME batch appends twice — doc 11's
    # (doc, fp) rows and its sizes row are now duplicated on disk
    for _ in range(2):
        incremental_winnow_overlap(
            spark, batch_a, path, "text", "doc_id",
            threshold=0.99, update_index=True,
        ).collect()
    fps_rows = spark.read.parquet(f"{path}/fps")
    assert (
        fps_rows.filter("doc = 11").count()
        == 2 * fps_rows.filter("doc = 1").count()
    )  # precondition: the double-append really happened
    # cap = 3 = the TRUE distinct doc count {1, 11, 21} per shared
    # fingerprint; raw rows are 4 (1 + 2×11 + 21), so a raw count
    # would cap every fingerprint away and find NOTHING
    batch_b = spark.createDataFrame(
        [(21, copy)], "doc_id long, text string"
    )
    out_b = incremental_winnow_overlap(
        spark, batch_b, path, "text", "doc_id",
        threshold=0.99, max_docs_per_fp=3,
    ).collect()
    assert {(r.a, r.b) for r in out_b} == {(1, 21), (11, 21)}
    assert all(r.overlap == 1.0 for r in out_b)
