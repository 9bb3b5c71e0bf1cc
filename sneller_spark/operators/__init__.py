from .curation import cap_per_group, decontaminate, hash_split, pack_sequences
from .dedup import (
    connected_components,
    dedup_keep_first,
    dedup_near_keep_rows,
    exact_dedup,
    jaccard_similarity_pairs,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_shingles,
    simhash_fingerprint,
    simhash_near_dup_pairs,
)
from .similarity import (
    brute_force_cosine_topk,
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_blocked,
    cosine_similarity_col,
    lsh_bucketed_topk,
)
from .text import document_fingerprint, language_id, quality_features, token_count

__all__ = [
    "exact_dedup",
    "dedup_keep_first",
    "ngram_shingles",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash_fingerprint",
    "simhash_near_dup_pairs",
    "jaccard_similarity_pairs",
    "connected_components",
    "dedup_near_keep_rows",
    "cosine_similarity_col",
    "brute_force_cosine_topk",
    "cosine_near_dup_pairs",
    "cosine_near_dup_pairs_blocked",
    "lsh_bucketed_topk",
    "language_id",
    "quality_features",
    "token_count",
    "document_fingerprint",
    "hash_split",
    "cap_per_group",
    "decontaminate",
    "pack_sequences",
]
