from .asof import asof_id_bounds, asof_snapshot_pair
from .bpe import bpe_segment, bpe_train, word_counts
from .chunking import chunk_dedup, chunk_documents, repetition_scores
from .decontam import (
    benchmark_contamination,
    decontaminate,
    pii_counts,
    pii_redact,
    pii_scan,
)
from .expectations import (
    check_rules,
    referential_violations,
    table_profile,
    uniqueness_violations,
)
from .dedup import (
    build_minhash_index,
    jaccard_join_prefix,
    build_simhash_index,
    connected_components,
    dedup_corpus,
    dedup_exact,
    embedding_dup_pairs,
    embedding_dup_pairs_portable,
    hyperplane_lsh_eval,
    incremental_dedup_pairs,
    incremental_simhash_pairs,
    minhash_bands,
    minhash_signatures,
    minhash_signatures_portable,
    ngram_jaccard_pairs,
    simhash,
    simhash_bands,
    simhash_portable,
)
from .graph import cooccurrence_edges, pagerank, triangle_counts
from .json_flatten import flatten_json_value
from .latest import latest_per_key
from .layout import (
    morton_z,
    zorder_locality_stats,
    zorder_repartition,
)
from .locf import locf, locf_pivot
from .merge import apply_changes, apply_changes_broadcast, latest_changes
from .multimodal import (
    audio_features,
    audio_resample,
    encode_bmp,
    encode_wav,
    frame_sample,
    image_features,
    image_resize,
    resample_wav_nearest,
    resize_bmp_nearest,
)
from .pca import gram_matrix, power_iteration
from .pq import (
    append_pq_index,
    pq_build,
    pq_rerank_topk,
    pq_topk,
    read_pq_index,
    write_pq_index,
)
from .quantize import dequantize_embedding, quantize_embedding
from .range_join import interval_join
from .retrieval import (
    append_bm25_index,
    append_positional_index,
    bm25_topk,
    build_bm25_index,
    build_positional_index,
    build_positional_postings,
    mmr_rerank,
    phrase_search,
    read_bm25_index,
    read_positional_index,
    rrf_fuse,
    write_bm25_index,
    write_positional_index,
)
from .sampling import (
    cap_per_group,
    temperature_quotas,
    deterministic_shuffle,
    hash_sample,
    hash_split,
    mixture_sample,
    stratified_hash_sample,
)
from .setops import latest_state_sym_diff, symmetric_diff_rows, unchanged_rows
from .similarity import (
    append_ivf_index,
    build_ivf_index,
    cosine_topk,
    cosine_topk_filtered,
    ivf_topk,
    mean_pool,
    search_ivf_index,
    build_semantic_index,
    compact_semantic_index,
    incremental_semantic_dedup,
    routed_incremental_eval,
    routed_incremental_semantic_dedup,
    routed_dedup_eval,
    routed_semantic_dedup,
    semantic_dedup,
)
from .sketches import (
    bloom_build,
    bloom_prefilter,
    cms_build,
    cms_lookup,
    histogram_cdf,
    histogram_quantiles,
    hll_partial_sketches,
    hll_rollup,
    value_histogram,
)
from .fuzzy import deletion_variants, fuzzy_pairs
from .ivm import agg_state, merge_agg_deltas
from .langid import CharNBModel, classify_language, train_char_profiles
from .corpus_pipeline import curate
from .quality_pipeline import quality_filter
from .lm_score import BigramLM, bigram_nll, train_bigram_lm
from .repetition import repetition_stats
from .rowindex import global_ntile, global_row_index
from .spans import repeated_span_stats
from .skew import (
    salted_agg,
    salted_broadcast_left,
    salted_join,
    salted_latest,
)
from .timeseries import ohlc_bars, resample_linear, rolling_zscore
from .winnow import winnow_fingerprints, winnow_overlap_pairs


def free_local_checkpoints(spark) -> int:
    """Unpersist every RDD still registered with the context — in this
    package, after the round-6 cache-hygiene pass, that can only be
    local-checkpoint results (mmr_rerank / pagerank / power_iteration
    return eagerly checkpointed frames; their input-scale helper
    caches are already released in-operator) plus any caller-persisted
    state whose documented contract is caller-unpersist (bpe_train's
    returned word table). Call ONLY when all such results have been
    consumed: a local checkpoint is the sole copy of its data, so the
    frame is unusable afterwards. The oracle gate and bench loops call
    this between queries so a long session never accumulates cached
    state (r5 ADVICE). Returns the number of RDDs released."""
    jsc = spark.sparkContext._jsc.sc()
    rdds = jsc.getPersistentRDDs()
    it = rdds.values().iterator()
    n = 0
    while it.hasNext():
        it.next().unpersist(False)
        n += 1
    return n


__all__ = [
    "agg_state",
    "apply_changes",
    "apply_changes_broadcast",
    "asof_id_bounds",
    "asof_snapshot_pair",
    "BigramLM",
    "bigram_nll",
    "audio_features",
    "audio_resample",
    "benchmark_contamination",
    "bloom_build",
    "bloom_prefilter",
    "append_bm25_index",
    "append_ivf_index",
    "append_positional_index",
    "bm25_topk",
    "bpe_segment",
    "bpe_train",
    "build_bm25_index",
    "build_ivf_index",
    "build_minhash_index",
    "build_positional_index",
    "build_positional_postings",
    "build_simhash_index",
    "cap_per_group",
    "CharNBModel",
    "classify_language",
    "check_rules",
    "chunk_dedup",
    "chunk_documents",
    "cms_build",
    "cms_lookup",
    "connected_components",
    "cooccurrence_edges",
    "cosine_topk",
    "cosine_topk_filtered",
    "decontaminate",
    "dedup_corpus",
    "dedup_exact",
    "deletion_variants",
    "dequantize_embedding",
    "encode_bmp",
    "encode_wav",
    "deterministic_shuffle",
    "embedding_dup_pairs",
    "embedding_dup_pairs_portable",
    "hyperplane_lsh_eval",
    "flatten_json_value",
    "frame_sample",
    "free_local_checkpoints",
    "fuzzy_pairs",
    "global_ntile",
    "global_row_index",
    "gram_matrix",
    "hash_sample",
    "hash_split",
    "histogram_cdf",
    "histogram_quantiles",
    "hll_partial_sketches",
    "hll_rollup",
    "image_features",
    "image_resize",
    "incremental_dedup_pairs",
    "incremental_simhash_pairs",
    "interval_join",
    "ivf_topk",
    "jaccard_join_prefix",
    "latest_changes",
    "latest_per_key",
    "latest_state_sym_diff",
    "locf",
    "locf_pivot",
    "mean_pool",
    "merge_agg_deltas",
    "minhash_bands",
    "mixture_sample",
    "mmr_rerank",
    "minhash_signatures",
    "minhash_signatures_portable",
    "morton_z",
    "ngram_jaccard_pairs",
    "ohlc_bars",
    "pagerank",
    "pii_counts",
    "pii_redact",
    "phrase_search",
    "pii_scan",
    "power_iteration",
    "append_pq_index",
    "pq_build",
    "pq_rerank_topk",
    "pq_topk",
    "read_pq_index",
    "write_pq_index",
    "curate",
    "quality_filter",
    "quantize_embedding",
    "read_bm25_index",
    "read_positional_index",
    "referential_violations",
    "repetition_scores",
    "repeated_span_stats",
    "repetition_stats",
    "resample_linear",
    "resample_wav_nearest",
    "resize_bmp_nearest",
    "rolling_zscore",
    "rrf_fuse",
    "salted_agg",
    "salted_broadcast_left",
    "salted_join",
    "salted_latest",
    "search_ivf_index",
    "build_semantic_index",
    "compact_semantic_index",
    "incremental_semantic_dedup",
    "routed_incremental_eval",
    "routed_incremental_semantic_dedup",
    "routed_dedup_eval",
    "routed_semantic_dedup",
    "semantic_dedup",
    "simhash",
    "simhash_bands",
    "simhash_portable",
    "stratified_hash_sample",
    "symmetric_diff_rows",
    "table_profile",
    "temperature_quotas",
    "train_bigram_lm",
    "train_char_profiles",
    "triangle_counts",
    "unchanged_rows",
    "uniqueness_violations",
    "value_histogram",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "word_counts",
    "write_bm25_index",
    "write_positional_index",
    "zorder_locality_stats",
    "zorder_repartition",
]
