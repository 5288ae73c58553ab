from .analytics import label_centroids
from .brute_force import cosine_pairs, topk_cosine
from .ivf import centroid_vectors, ivf_assign, topk_cosine_ivf
from .lsh import hyperplane_signs, lsh_bucket, topk_cosine_lsh

__all__ = [
    "topk_cosine",
    "cosine_pairs",
    "hyperplane_signs",
    "lsh_bucket",
    "topk_cosine_lsh",
    "label_centroids",
    "centroid_vectors",
    "ivf_assign",
    "topk_cosine_ivf",
]
