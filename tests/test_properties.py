"""Property-based tests (hypothesis) for the core reconstruction
invariants (SURVEY.md §5.3).

Spark jobs are slow per-example, so each property runs few, large
examples rather than hypothesis' default 100 tiny ones.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from alstom_spark_cassandra_spark.operators.latest import latest_per_key
from alstom_spark_cassandra_spark.operators.locf import locf

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, clock, iteration) is the log's total order (SURVEY §7.4): two
# rows sharing all three with different values have no defined winner,
# in the engine or the reference — keep generated logs inside the
# contract.
update_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),    # key
        st.integers(min_value=1, max_value=50),   # clock
        st.integers(min_value=0, max_value=3),    # iteration (tie-break)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[1], t[2]),
)


@SLOW
@given(updates=update_lists)
def test_latest_per_key_equals_python_argmax(spark, updates):
    df = spark.createDataFrame(
        updates, "k int, clock long, iteration int, v long"
    )
    got = {
        r.k: r.v
        for r in latest_per_key(df, ["k"], "clock", ["iteration"]).collect()
    }
    expect = {}
    for k, clock, it, v in sorted(updates, key=lambda t: (t[1], t[2])):
        expect[k] = v  # replay in total order: last write wins
    assert got == expect


@SLOW
@given(updates=update_lists)
def test_locf_equals_python_forward_fill(spark, updates):
    # treat iteration==0 rows as observations, others as gaps
    rows = [
        (k, clock * 4 + it, float(v) if v % 3 else None)
        for k, clock, it, v in updates
    ]
    df = spark.createDataFrame(rows, "k int, t long, value double")
    got = {(r.k, r.t): r.value for r in locf(df, ["k"], "t").collect()}
    by_key: dict[int, list] = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    for k, seq in by_key.items():
        last = None
        # ties on t: Spark's rowsBetween window makes fill order within
        # a tie nondeterministic, so only check keys with unique ts
        ts = [t for t, _ in seq]
        if len(set(ts)) != len(ts):
            continue
        for t, v in sorted(seq):
            last = v if v is not None else last
            assert got[(k, t)] == last


doc_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),   # doc id base
        st.integers(min_value=0, max_value=4),    # text variant
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@SLOW
@given(docs=doc_lists)
def test_deterministic_shuffle_is_permutation(spark, docs):
    """Every input appears exactly once with a contiguous per-shard
    position, for ANY input set — the permutation property."""
    from collections import defaultdict

    from alstom_spark_cassandra_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(d,) for d, _ in docs], "doc_id long")
    rows = deterministic_shuffle(df, "doc_id").collect()
    assert sorted(r.doc_id for r in rows) == sorted(d for d, _ in docs)
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


@SLOW
@given(docs=doc_lists)
def test_chunk_dedup_exactly_one_canonical_per_text(spark, docs):
    """For ANY corpus: per distinct chunk text, exactly one
    non-duplicate row survives, and both physical plans agree."""
    from collections import Counter

    from alstom_spark_cassandra_spark.operators.chunking import chunk_dedup

    rows = [(d, 0, f"text variant {v}") for d, v in docs]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id long, chunk_text string")
    flags = {(r.doc_id, r.chunk_id): r.is_dup for r in chunk_dedup(df).collect()}
    texts = {(d, 0): t for d, _, t in rows}
    canon_per_text = Counter(
        texts[k] for k, dup in flags.items() if not dup
    )
    n_distinct = len({t for _, _, t in rows})
    assert len(canon_per_text) == n_distinct
    assert all(c == 1 for c in canon_per_text.values())
    safe = {
        (r.doc_id, r.chunk_id): r.is_dup
        for r in chunk_dedup(df, skew_safe=True).collect()
    }
    assert safe == flags


token_docs = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta eps zeta".split()),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=12,
)


@SLOW
@given(docs=token_docs)
def test_passage_stats_bounds_and_full_dup_corpus(spark, docs):
    """For ANY corpus: 0 <= n_dup_windows <= n_windows, 0 <=
    n_dup_tokens <= n_tokens, ratio in [0, 1]; and in corpus + exact
    copy of itself, every doc with >= k tokens is FULLY covered
    (every window duplicated -> union of windows = the whole doc)."""
    from alstom_spark_cassandra_spark.operators.chunking import (
        passage_dup_stats,
    )

    k = 4
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    doubled = rows + [(i + 1000, t) for i, t in rows]
    df = spark.createDataFrame(doubled, "doc_id long, text string")
    for r in passage_dup_stats(df, k=k, min_docs=2).collect():
        assert 0 <= r.n_dup_windows <= r.n_windows
        assert 0 <= r.n_dup_tokens <= r.n_tokens
        assert 0.0 <= r.dup_token_ratio <= 1.0
        # the doubled corpus duplicates every window across the pair
        # (split('') yields [''], so even "empty" docs have 1 token;
        # whole-doc coverage applies from k real tokens up)
        toks = dict(doubled)[r.doc_id].split()
        if len(toks) >= k:
            assert r.n_dup_tokens == r.n_tokens
            assert r.dup_token_ratio == 1.0


@SLOW
@given(docs=token_docs)
def test_strip_passages_idempotent_on_unique_corpus(spark, docs):
    """A corpus with all-distinct windows must pass through
    strip_duplicate_passages verbatim (nothing to strip), for ANY
    shape of documents; row count always preserved."""
    from alstom_spark_cassandra_spark.operators.chunking import (
        strip_duplicate_passages,
    )

    # make windows globally unique by prefixing every token with its
    # doc id, so cross-doc duplication is impossible
    rows = [
        (i, " ".join(f"d{i}_{t}" for t in toks))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in strip_duplicate_passages(df, k=3, min_docs=2).collect()
    }
    assert got == dict(rows)


@SLOW
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.floats(
                min_value=-8.0, max_value=8.0,
                allow_nan=False, allow_infinity=False,
            ),
            st.floats(
                min_value=-8.0, max_value=8.0,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_kmeans_partition_invariant_total_assignment(spark, pts):
    """For ANY point set: every point gets exactly one cluster, and
    the result is identical under different partitionings (the
    integer-grid contract — no float fold-order dependence)."""
    from alstom_spark_cassandra_spark.operators.similarity import kmeans

    df = spark.createDataFrame(
        [(i, [x, y]) for i, x, y in pts],
        "vec_id long, embedding array<double>",
    )
    init = spark.createDataFrame(
        [(0, [-1.0, 0.0]), (1, [1.0, 0.5])], "cid int, cv array<double>"
    )
    a1, c1 = kmeans(df.repartition(1), init, n_iters=2)
    a7, c7 = kmeans(df.repartition(7), init, n_iters=2)
    m1 = {r.vec_id: r.cid for r in a1.collect()}
    m7 = {r.vec_id: r.cid for r in a7.collect()}
    assert m1 == m7
    assert set(m1) == {i for i, _, _ in pts}
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c7.collect()))


# ---------------------------------------------------------------------------
# round-5 operators
# ---------------------------------------------------------------------------

term_streams = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=1,
    max_size=120,
)


@SLOW
@given(terms=term_streams)
def test_cms_estimate_at_least_exact(spark, terms):
    """CMS never underestimates, for ANY stream: est(t) >= tf(t)."""
    from collections import Counter

    from alstom_spark_cassandra_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sketch = cms_build(df, "term", depth=3, width=16)  # tiny: force collisions
    est = {
        r.term: r.est_count
        for r in cms_lookup(
            sketch, df.distinct(), "term", depth=3, width=16
        ).collect()
    }
    for t, n in Counter(terms).items():
        assert est[t] >= n, (t, est[t], n)


@SLOW
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=80,
        unique=True,
    )
)
def test_morton_bijective_and_matches_python(spark, pairs):
    """z is injective on the (a, b) grid and equals the reference
    bit-interleave for every generated pair."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.layout import morton_z

    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select(
        "a", "b", morton_z(F.col("a"), F.col("b"), 8).alias("z")
    ).collect()
    zs = set()
    for r in got:
        expect = 0
        for i in range(8):
            expect |= ((r.a >> i) & 1) << (2 * i + 1)
            expect |= ((r.b >> i) & 1) << (2 * i)
        assert r.z == expect
        assert r.z not in zs
        zs.add(r.z)


@SLOW
@given(
    ranked=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),   # system
            st.integers(min_value=0, max_value=20),  # doc
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_rrf_equals_python_reference(spark, ranked):
    """Fused micro scores equal the Python recomputation for any pair
    of ranked lists (ranks assigned by doc order within system)."""
    from collections import defaultdict

    from alstom_spark_cassandra_spark.operators.retrieval import rrf_fuse

    by_system = defaultdict(list)
    for sys_id, doc in ranked:
        by_system[sys_id].append(doc)
    dfs, expect = [], defaultdict(int)
    for sys_id, docs in sorted(by_system.items()):
        rows = [(1, d, i + 1) for i, d in enumerate(sorted(docs))]
        dfs.append(
            spark.createDataFrame(rows, "query_id long, doc long, rank int")
        )
        for _, d, rk in rows:
            expect[d] += int(1_000_000 / (60 + rk) + 0.5)
    got = {
        r.doc: r.rrf_micro for r in rrf_fuse(dfs, k=100).collect()
    }
    assert got == dict(expect)


@SLOW
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_bpe_segment_concat_reconstructs_word(spark, words):
    """For every trained word, concatenating its final symbols
    reproduces the word exactly — merges never lose or duplicate
    characters, whatever the corpus."""
    from alstom_spark_cassandra_spark.operators.bpe import bpe_train

    wc = spark.createDataFrame(words, "word string, cnt long")
    _rules, state = bpe_train(wc, n_merges=4)
    for r in state.collect():
        assert "".join(r.seq.split()) == r.word


@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=1, max_size=8
        ).map(lambda toks: " ".join(toks)),
        min_size=2,
        max_size=25,
    )
)
def test_prefix_jaccard_join_complete_vs_bruteforce(spark, docs):
    """The prefix filter is LOSSLESS: for any corpus, the prefix-
    filtered join returns exactly the brute-force Jaccard >= 4/5 pair
    set (same pairs, same intersection/union counts)."""
    from alstom_spark_cassandra_spark.operators.dedup import (
        jaccard_join_prefix,
    )

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a, r.b): (r.inter, r.union_size)
        for r in jaccard_join_prefix(df, "text", "doc_id", 4, 5).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    expect = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if inter * 5 >= union * 4:
                    expect[(i, j)] = (inter, union)
    assert got == expect


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),      # join key (dense)
            st.integers(min_value=0, max_value=1000),   # payload
        ),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(min_value=1, max_value=9),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
def test_salted_join_equals_plain_join(spark, rows, n_salts, how):
    """Salting is a PHYSICAL rewrite: for any fact/dim, salt count,
    and supported join type, the salted result is the exact row
    multiset of the plain join — including duplicate fact rows (which
    share a salt) and unmatched keys."""
    from alstom_spark_cassandra_spark.operators.skew import salted_join

    fact = spark.createDataFrame(rows, "k int, payload int")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 5)], "k int, attr string"
    )
    plain = sorted(
        map(tuple, fact.join(dim, ["k"], how).collect()), key=str
    )
    salted = sorted(
        map(
            tuple,
            salted_join(fact, dim, ["k"], n_salts=n_salts, how=how).collect(),
        ),
        key=str,
    )
    assert salted == plain


@SLOW
@given(
    member_ids=st.sets(
        st.integers(min_value=0, max_value=50), min_size=0, max_size=20
    ),
    probe_ids=st.sets(
        st.integers(min_value=0, max_value=80), min_size=1, max_size=40
    ),
    portable=st.booleans(),
)
def test_bloom_never_false_negative(spark, member_ids, probe_ids, portable):
    """For ANY member/probe sets and either hash path: every probe key
    that IS a member passes the filter (the Bloom guarantee), and an
    empty member set rejects everything."""
    from alstom_spark_cassandra_spark.operators.sketches import (
        bloom_build,
        bloom_prefilter,
    )

    keys = spark.createDataFrame(
        [(f"k{i}",) for i in sorted(member_ids)], "key string"
    )
    fact = spark.createDataFrame(
        [(f"k{i}",) for i in sorted(probe_ids)], "key string"
    )
    bloom = bloom_build(keys, "key", depth=3, width=512, portable=portable)
    cand = {
        r.key
        for r in bloom_prefilter(
            fact, bloom, "key", depth=3, width=512, portable=portable
        ).collect()
    }
    members_probed = {f"k{i}" for i in member_ids & probe_ids}
    assert members_probed <= cand
    if not member_ids:
        assert cand == set()


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # group key
            st.integers(min_value=-50, max_value=50),   # value
        ),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(min_value=1, max_value=9),
    use_rid_salt=st.booleans(),
)
def test_salted_agg_equals_plain_groupby(spark, rows, n_salts, use_rid_salt):
    """Two-phase salting is a PHYSICAL rewrite: for any input
    (including byte-identical duplicate rows), salt count, and either
    salt source (all columns or the high-entropy salt_cols seam), the
    salted sum/count/min/max per key is exactly the plain groupBy
    result."""
    from pyspark.sql import functions as F

    from alstom_spark_cassandra_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)],
        "k int, v int, rid int",
    )
    plain = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            n_salts=n_salts,
            salt_cols=["rid"] if use_rid_salt else None,
        ).collect()
    }
    assert salted == plain


@settings(max_examples=50, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=30,
    ),
    in_rate=st.integers(min_value=1000, max_value=48000),
    out_rate=st.integers(min_value=1000, max_value=48000),
)
def test_resample_wav_nearest_exact_index_map(samples, in_rate, out_rate):
    """For ANY 16-bit sample vector and rate pair, the resampled WAV
    decodes to exactly out_n = max(n*out//in, 1) frames at out_rate,
    and output frame k is byte-identically source frame
    k*in//out — the zero-order-hold contract the audio_resample
    oracle reproduces arithmetically."""
    import io
    import struct
    import wave

    from alstom_spark_cassandra_spark.operators.multimodal import (
        encode_wav,
        resample_wav_nearest,
    )

    out = resample_wav_nearest(encode_wav(samples, in_rate), out_rate)
    with wave.open(io.BytesIO(out)) as w:
        assert w.getframerate() == out_rate
        got = list(
            struct.unpack(
                f"<{w.getnframes()}h", w.readframes(w.getnframes())
            )
        )
    out_n = max(len(samples) * out_rate // in_rate, 1)
    assert got == [samples[k * in_rate // out_rate] for k in range(out_n)]


# signed (key, value, mult) rows: the IVM fold's input domain; values
# bounded so long sums are exact, mult in {-1, 1}
signed_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),      # key
        st.integers(min_value=-50, max_value=50),   # value
        st.sampled_from([1, 1, 1, -1]),             # mult (insert-heavy)
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(rows=signed_rows, split=st.integers(min_value=0, max_value=40))
def test_ivm_fold_any_batching_equals_recompute(spark, rows, split):
    """Folding a signed history in ANY two-batch split equals the
    from-scratch recompute — the associativity contract behind
    agg_maintenance and the continuous IVM sink, including batches
    that drive keys through transient zero-count / zero-total
    states (hypothesis finds those splits on its own)."""
    from alstom_spark_cassandra_spark.operators.ivm import (
        agg_state,
        merge_agg_deltas,
    )

    split = min(split, len(rows))
    schema = "k long, v long, mult int"
    empty = agg_state(spark.createDataFrame([], "k long, v long"), ["k"], "v")
    b1 = spark.createDataFrame(rows[:split] or [(99, 0, 1), (99, 0, -1)], schema)
    b2 = spark.createDataFrame(rows[split:] or [(99, 0, 1), (99, 0, -1)], schema)
    stepped = merge_agg_deltas(
        merge_agg_deltas(empty, b1, ["k"], "v"), b2, ["k"], "v"
    )
    recompute = agg_state(
        b1.unionByName(b2), ["k"], "v", mult_col="mult"
    )
    got = {r["k"]: (r["cnt"], r["total"]) for r in stepped.collect()}
    want = {r["k"]: (r["cnt"], r["total"]) for r in recompute.collect()}
    # state may keep cnt=0 rows with nonzero totals that the VIEW
    # (and agg_state's Z-filter) drops; compare at view semantics
    got = {k: v for k, v in got.items() if v[0] != 0}
    assert got == want


# langid: random corpora over a tiny alphabet, random train/score
# split by parity — the Spark NB must agree with an independent
# pure-Python reference on the integer anchors always, and on the
# argmax whenever the reference's top-2 margin is clear (JVM and
# libm logs differ in the last ulp ~1e-16; a 1e-5 margin guard makes
# the comparison deterministic without weakening it — the rounding
# contract itself is pinned exactly vs DuckDB by the graded row).
langid_corpora = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),          # doc_id
        st.sampled_from(["la", "lb", "lc"]),            # lang
        st.text(alphabet="ab ", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@SLOW
@given(rows=langid_corpora)
def test_langid_equals_python_reference(spark, rows):
    import math
    from collections import Counter

    from alstom_spark_cassandra_spark.operators.langid import (
        classify_language,
        train_char_profiles,
    )

    def grams(t):
        return (
            []
            if t is None or len(t) < 2
            else [t[i : i + 2] for i in range(len(t) - 1)]
        )

    # --- pure-Python reference -------------------------------------
    prof, totals = {}, Counter()
    for d, lg, t in rows:
        if d % 2 == 0:
            for g in grams(t):
                prof[(lg, g)] = prof.get((lg, g), 0) + 1
                totals[lg] += 1
    vocab = len({g for (_, g) in prof})
    langs = sorted(totals)
    ref = {}
    for d, lg, t in rows:
        gs = grams(t)
        if not gs or not langs:
            # empty model: the engine's doc x lang grid is empty, so
            # every row degrades to the no-evidence shape (n_grams 0,
            # NULL prediction) — documented in classify_language
            ref[d] = (None, 0 if not langs else len(gs), 0, None, None)
            continue
        scored = []
        for cand in langs:
            s = sum(math.log(prof.get((cand, g), 0) + 1) for g in gs)
            hits = sum(1 for g in gs if (cand, g) in prof)
            raw = s / len(gs) - math.log(totals[cand] + vocab)
            rounded = math.floor(raw * 1e6 + 0.5) / 1e6
            scored.append((-rounded, cand, hits))
        scored.sort()
        margin = (
            abs(scored[0][0] - scored[1][0]) if len(scored) > 1 else 1.0
        )
        _, win, hits = scored[0]
        ref[d] = (win, len(gs), hits, -scored[0][0], margin)

    # --- engine ------------------------------------------------------
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    model = train_char_profiles(df.filter("doc_id % 2 = 0"), "text", "lang")
    got = {
        r["doc_id"]: r
        for r in classify_language(df, "doc_id", "text", model).collect()
    }

    assert set(got) == set(ref)
    for d, (win, n, hits, score, margin) in ref.items():
        assert got[d]["n_grams"] == n, d
        if win is None:
            assert got[d]["pred_lang"] is None, d
        elif margin is None or margin > 1e-5:
            assert got[d]["pred_lang"] == win, (d, ref[d], got[d])
            assert got[d]["hit_grams"] == hits, d
            assert abs(got[d]["avg_ll"] - score) <= 2e-6, d


# MMR differential: candidate lists with controlled ties (few doc ids,
# coarse relevance grid) and a partial, symmetric sim matrix — the
# HOF fold and the k-step DataFrame loop are independent
# implementations of the same greedy chain and must agree exactly.
mmr_cases = st.tuples(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=2),   # query_id
            st.integers(min_value=0, max_value=9),   # doc
            st.integers(min_value=0, max_value=4),   # rel (coarse: ties)
        ),
        min_size=1,
        max_size=14,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.data(),
)


@SLOW
@given(case=mmr_cases)
def test_mmr_hof_equals_loop_property(spark, case):
    from alstom_spark_cassandra_spark.operators.retrieval import (
        mmr_rerank,
    )

    cands, data = case
    cdf = spark.createDataFrame(
        [(q, d, r * 100) for q, d, r in cands],
        "query_id long, doc long, rel_micro long",
    )
    sims = []
    by_q: dict = {}
    for q, d, _ in cands:
        by_q.setdefault(q, []).append(d)
    for q, docs in by_q.items():
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                s = data.draw(
                    st.one_of(
                        st.none(),
                        st.integers(min_value=0, max_value=4),
                    )
                )
                if s is not None:  # None = missing sim row pair
                    sims.append((q, a, b, s * 100))
                    sims.append((q, b, a, s * 100))
    sdf = spark.createDataFrame(
        sims or [(1, 0, 0, 0)],
        "query_id long, a long, b long, sim_micro long",
    )
    if not sims:
        sdf = sdf.filter("a != a")  # empty frame, schema kept
    k = data.draw(st.integers(min_value=1, max_value=6))
    hof = sorted(
        map(tuple, mmr_rerank(cdf, sdf, k=k, impl="hof").collect())
    )
    loop = sorted(
        map(tuple, mmr_rerank(cdf, sdf, k=k, impl="loop").collect())
    )
    assert hof == loop
