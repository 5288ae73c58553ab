from .components import connected_components
from .exact import exact_dup_groups, exact_dup_stats
from .jaccard import jaccard_filter, ngram_jaccard_pairs, shingle_rows, shingle_sizes
from .minhash import lsh_candidate_pairs, minhash_near_dup_pairs, minhash_signatures
from .simhash import simhash_docs, simhash_near_pairs

__all__ = [
    "exact_dup_groups",
    "exact_dup_stats",
    "shingle_rows",
    "shingle_sizes",
    "jaccard_filter",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_dup_pairs",
    "simhash_docs",
    "simhash_near_pairs",
    "connected_components",
]
