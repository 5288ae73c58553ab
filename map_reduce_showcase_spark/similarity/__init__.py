from .brute_force import cosine_pairs, topk_cosine
from .lsh import hyperplane_signs, lsh_bucket, topk_cosine_lsh

__all__ = [
    "topk_cosine",
    "cosine_pairs",
    "hyperplane_signs",
    "lsh_bucket",
    "topk_cosine_lsh",
]
