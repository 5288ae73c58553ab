"""Vector-column analytics: per-group centroids in long format.

Centroids underpin IVF-style ANN partitioning and cluster-quality
monitoring. Computed by exploding (dim, value) pairs and running one
decimal-exact aggregation per (group, dim) — shuffle volume is
groups × dims rows, independent of vector count, and partial
aggregation does the heavy summation map-side. Long format (one row
per dimension) keeps the result oracle-checkable and join-friendly;
``collect_list`` it back into arrays when a dense layout is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_centroids(vectors: DataFrame, label_col: str = "label") -> DataFrame:
    """(label, dim, centroid, n_vectors): mean per dimension per
    label. dim is 1-based. Decimal-exact sums → one final IEEE
    division → portable values."""
    exploded = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col("embedding")).alias("dim0", "val"),
    )
    n = F.count(F.lit(1))
    return (
        exploded.groupBy("label", (F.col("dim0") + 1).alias("dim"))
        .agg(
            F.round(
                F.sum(F.col("val").cast("decimal(28,9)")).cast("double") / n, 6
            ).alias("centroid"),
            n.alias("n_vectors"),
        )
        .select("label", F.col("dim").cast("int").alias("dim"), "centroid", "n_vectors")
    )
