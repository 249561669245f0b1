"""Column-function library + large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)."""

from .curation import (
    contamination_check,
    normalize_embeddings,
    quantize_embeddings,
    remove_boilerplate_lines,
    repetition_stats,
    sample_bucket,
    stratified_sample,
    vocab_topk,
    word_shingles,
)
from .dedup import (
    dedup_components,
    exact_dedup,
    lsh_candidate_pairs,
    md5_prefix_long,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
)
from .similarity import cosine_similarity_col, cosine_topk, cosine_topk_ivf
from .text import (
    chunk_documents,
    fingerprint,
    langid_scores,
    pii_counts,
    quality_stats,
    scrub_pii,
    token_stats,
    tokens,
)

__all__ = [
    "chunk_documents",
    "contamination_check",
    "normalize_embeddings",
    "quantize_embeddings",
    "remove_boilerplate_lines",
    "repetition_stats",
    "sample_bucket",
    "stratified_sample",
    "vocab_topk",
    "word_shingles",
    "cosine_similarity_col",
    "cosine_topk",
    "cosine_topk_ivf",
    "dedup_components",
    "exact_dedup",
    "fingerprint",
    "langid_scores",
    "lsh_candidate_pairs",
    "md5_prefix_long",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pii_counts",
    "quality_stats",
    "scrub_pii",
    "simhash",
    "simhash_candidate_pairs",
    "token_stats",
    "tokens",
]
