"""Vector analytics + cluster-dedup queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..dedup.components import connected_components
from ..dedup.minhash import minhash_near_dup_pairs
from ..similarity.analytics import label_centroids
from .registry import register, t


@register(
    "vector_label_centroids",
    oracle="""
    WITH e AS (
      SELECT label,
             unnest(CAST(embedding AS DOUBLE[])) AS val,
             unnest(generate_series(1, len(embedding))) AS dim
      FROM embeddings
    )
    SELECT label, CAST(dim AS INT) AS dim,
           round(CAST(SUM(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6) AS centroid,
           COUNT(*) AS n_vectors
    FROM e
    GROUP BY label, dim
    """,
    tags=("vectors", "aggregation"),
)
def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, long format
    (label × 64 dims). The IVF coarse-quantizer build step."""
    return label_centroids(t(spark, sf_dir, "embeddings"), "label")


@register("dedup_connected_components", oracle=None, tags=("dedup", "iterative"))
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: connected components (iterative min-label
    propagation) over the MinHash near-dup pair graph; component =
    min doc_id. Iterative → no single SQL oracle (driver records the
    rows-only check); exactness is pinned by a union-find differential
    test in tests/test_components.py."""
    pairs = minhash_near_dup_pairs(
        t(spark, sf_dir, "documents"), n=2, num_hashes=12, rows_per_band=2, threshold=0.7
    )
    return connected_components(pairs)
