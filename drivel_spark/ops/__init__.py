"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal payload plumbing."""

from .dedup import (
    cosine_expr,
    embedding_near_dup_pairs,
    embedding_lsh_buckets,
    exact_dedup,
    exact_dup_groups,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    release_shingles,
    simhash_near_dup_pairs,
    shingle_table,
    word_shingles,
)
from .joins import asof_join, range_join
from .multimodal import embed_binary_column, extract_audio_features
from .skew import salted_agg, salted_distinct_count, salted_freq_map, with_salt
from .similarity import (
    ann_topk,
    assign_ivf,
    build_lsh_index,
    cosine_topk,
    ivf_probe_lists,
    ivf_topk,
    train_ivf_centroids,
)
from .text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    regex_token_count,
    token_count,
    with_text_metrics,
)

__all__ = [
    "embedding_lsh_buckets",
    "exact_dedup",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "release_shingles",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_dedup_pairs",
    "simhash_near_dup_pairs",
    "embedding_near_dup_pairs",
    "shingle_table",
    "word_shingles",
    "cosine_expr",
    "cosine_topk",
    "build_lsh_index",
    "ann_topk",
    "train_ivf_centroids",
    "assign_ivf",
    "ivf_probe_lists",
    "ivf_topk",
    "token_count",
    "bpe_ish_token_count",
    "quality_score",
    "regex_token_count",
    "lang_id",
    "fingerprint",
    "normalize_text",
    "with_text_metrics",
    "extract_audio_features",
    "embed_binary_column",
    "asof_join",
    "range_join",
    "salted_agg",
    "salted_distinct_count",
    "salted_freq_map",
    "with_salt",
]
