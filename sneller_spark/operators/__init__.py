from .dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_shingles,
    simhash_fingerprint,
)
from .similarity import brute_force_cosine_topk, cosine_similarity_col, lsh_bucketed_topk
from .text import document_fingerprint, language_id, quality_features, token_count

__all__ = [
    "exact_dedup",
    "ngram_shingles",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash_fingerprint",
    "cosine_similarity_col",
    "brute_force_cosine_topk",
    "lsh_bucketed_topk",
    "language_id",
    "quality_features",
    "token_count",
    "document_fingerprint",
]
