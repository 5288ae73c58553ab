"""Random-hyperplane LSH (sign-LSH) bucketed ANN — the scale path.

Sign-LSH for cosine similarity: project each vector onto
``n_planes`` fixed pseudo-random hyperplanes; the sign pattern is an
``n_planes``-bit bucket id. Vectors with high cosine land in the
same bucket with probability (1 − θ/π)^n_planes, so the ANN search
becomes: bucket everything (one scan), equi-join query buckets to
candidate buckets, score only within buckets.

The hyperplanes are derived deterministically from md5 (±1 Rademacher
entries, seeded by "plane:dim"), so the DuckDB oracle can replay the
exact bucketing — and so every run of the engine buckets identically
(re-runnable incremental indexing at 100 TB: new data buckets the
same way forever, no stored model needed).

Scale: the bucket join shuffles each side once on the bucket id;
multiprobe (flipping the weakest sign) trades recall for fan-out
without rebucketing.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity, dot

DIM = 64
N_PLANES = 8


def hyperplane_signs(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix: entry (p, d) is +1 iff the
    low bit of md5(f"{p}:{d}") is set. Reproducible everywhere —
    Python, executors, the SQL oracle — with no RNG state."""
    return [
        [
            1.0 if hashlib.md5(f"{p}:{d}".encode()).digest()[-1] & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Bucket id column: bit p = (emb · plane_p ≥ 0)."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        proj = dot(emb, F.array(*[F.lit(v) for v in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def topk_cosine_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k per query, searching only the query's
    bucket. Output ``(query_id, cand_id, rnk, cosine)`` — same shape
    as the exact ``topk_cosine`` so tests can measure recall."""
    if planes is None:
        planes = hyperplane_signs()
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        lsh_bucket(F.col("embedding"), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        lsh_bucket(F.col("embedding"), planes).alias("bucket"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_similarity(F.col("q_emb"), F.col("c_emb")).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk", F.round(F.col("cos"), 6).alias("cosine"))
    )
