"""BPE trainer: merge semantics, determinism, segmentation."""

from pyspark.sql import functions as F

from alstom_spark_cassandra_spark.operators.bpe import (
    MergeRule,
    apply_merge,
    bpe_segment,
    bpe_train,
    merges_df,
    word_counts,
)


def _wc(spark, pairs):
    return spark.createDataFrame(pairs, "word string, cnt long")


def test_classic_sennrich_merges(spark):
    """low/lower/newest-style corpus: 'lo' + 'w' style fusions emerge
    in frequency order with deterministic ties."""
    wc = _wc(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    rules, state = bpe_train(wc, n_merges=4)
    assert len(rules) == 4
    assert rules[0].pair == "e s" and rules[0].merged == "es"  # 9 = 6+3
    assert rules[1].pair == "es t" and rules[1].merged == "est"
    # every rule's weighted count is non-increasing? (not guaranteed in
    # general BPE, but the winner is always the max of its round)
    got = {r.word: r.seq for r in state.collect()}
    assert "est" in got["newest"]


def test_apply_merge_consecutive_runs(spark):
    """'a a a a' under merge (a,a): the double-pass literal replace
    fuses greedily left-to-right — [aa, aa], never [a, aa, a] or a
    missed second occurrence (the shared-boundary-space case)."""
    df = spark.createDataFrame(
        [(" a a a a ",), (" a a a ",), (" a ",)], "seq string"
    )
    out = [
        r.s
        for r in df.select(
            F.trim(apply_merge(F.col("seq"), "a a", "aa")).alias("s")
        ).collect()
    ]
    assert out == ["aa aa", "aa a", "a"]


def test_tie_breaks_on_pair_lexicographic(spark):
    """Equal-count pairs: the lexicographically smaller pair wins —
    the cross-engine determinism contract."""
    wc = _wc(spark, [("ab", 3), ("cd", 3)])
    rules, _ = bpe_train(wc, n_merges=1)
    assert rules[0].pair == "a b"  # 'a b' < 'c d'


def test_train_stops_when_no_pairs_remain(spark):
    wc = _wc(spark, [("ab", 1)])
    rules, _ = bpe_train(wc, n_merges=5)
    # 'a b' is the only pair; after merging, 'ab' is one symbol
    assert [m.pair for m in rules] == ["a b"]


def test_segment_replays_merges_and_passes_non_ascii(spark):
    docs = spark.createDataFrame(
        [(1, "lowest café")], "doc_id long, text string"
    )
    rules = [MergeRule(1, "l o", "lo", 0), MergeRule(2, "lo w", "low", 0)]
    got = {
        r.word: r.subwords for r in bpe_segment(docs, rules).collect()
    }
    assert got["lowest"] == ["low", "e", "s", "t"]
    assert got["café"] == ["café"]  # non-ASCII: unsplit symbol


def test_word_counts_ascii_filter_and_case(spark):
    docs = spark.createDataFrame(
        [(1, "The THE café the")], "doc_id long, text string"
    )
    got = {r.word: r.cnt for r in word_counts(docs).collect()}
    assert got == {"the": 3}  # lowercased, non-ASCII dropped


def test_merges_df_schema(spark):
    df = merges_df(spark, [MergeRule(1, "a b", "ab", 7)])
    assert [f.name for f in df.schema.fields] == [
        "round", "pair", "merged", "weighted_count",
    ]
    r = df.collect()[0]
    assert (r.round, r.pair, r.merged, r.weighted_count) == (1, "a b", "ab", 7)


def test_oracle_survives_merge_exhaustion(spark):
    """Corpus with fewer than n_merges learnable pairs: the Spark
    loop early-stops and keeps its state; the unrolled oracle's
    LEFT JOIN ON TRUE must likewise keep the t-chain alive (a cross
    join with the empty merge row would vaporize it). Both engines
    must emit the same (short) merge list and the same final
    segmentation-derived counts."""
    import duckdb

    import pandas as pd

    from alstom_spark_cassandra_spark.workloads import (
        _bpe_oracle_sql,
        _bpe_token_counts_oracle_sql,
        q_bpe_merges,
        q_bpe_token_counts,
    )

    rows = [(1, "ab ab"), (2, "ab")]  # only 1 learnable pair: ('a','b')
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import alstom_spark_cassandra_spark.workloads as w

    orig = w._t
    w._t = lambda _s, _d, _n: docs
    try:
        spark_merges = [
            (r.round, r.pair, r.merged, r.weighted_count)
            for r in q_bpe_merges(spark, "ignored").collect()
        ]
        spark_counts = {
            r.doc_id: (r.n_words, r.n_subwords)
            for r in q_bpe_token_counts(spark, "ignored").collect()
        }
    finally:
        w._t = orig

    duck_merges = [tuple(t) for t in con.sql(_bpe_oracle_sql()).fetchall()]
    duck_counts = {
        r[0]: (r[1], r[2])
        for r in con.sql(_bpe_token_counts_oracle_sql()).fetchall()
    }
    assert spark_merges == duck_merges == [(1, "a b", "ab", 3)]
    assert spark_counts == duck_counts == {1: (2, 2), 2: (1, 1)}
