"""Brute-force cosine similarity search over embedding columns.

The exact baseline: query set × candidate set cross/cartesian scoring
with a native ``zip_with``/``aggregate`` dot product (JVM-side, no
Python), then per-query top-k via a rank window.

Scale: brute force is O(|Q|·|C|·d) — fine when either side is small
(a broadcastable query batch against 100 TB of candidates streams
perfectly: broadcast Q, score candidates in place, per-partition
top-k heaps, tiny final merge — no candidate shuffle at all). For
big-Q × big-C use ``lsh.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_from_norms, l2_norm


def _scored(queries: DataFrame, candidates: DataFrame) -> DataFrame:
    from ..functions.util import rebalance

    # norms are pair-invariant: fold them once per row here, not once
    # per (query × candidate) pair in the scoring select (3× fewer
    # element ops in the O(|Q|·|C|) stage; bit-identical arithmetic)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    c = rebalance(candidates).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("c_norm"),
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm").alias("cos"),
        )
    )


def topk_cosine(queries: DataFrame, candidates: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, cand_id, rnk,
    cosine)``; ties broken by cand_id for determinism."""
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        _scored(queries, candidates)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk", F.round(F.col("cos"), 6).alias("cosine"))
    )


def cosine_pairs(vectors: DataFrame, threshold: float) -> DataFrame:
    """All (v1, v2, cosine) pairs with cosine ≥ threshold — the
    embedding-space near-duplicate detector. O(n²): correct at
    verification scale; the LSH variant is the 100 TB path."""
    a = vectors.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        l2_norm("embedding").alias("n1"),
    )
    b = vectors.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        l2_norm("embedding").alias("n2"),
    )
    cos = cosine_from_norms("e1", "e2", "n1", "n2")
    return (
        a.crossJoin(b)
        .filter(F.col("v1") < F.col("v2"))
        .filter(cos >= threshold)
        .select("v1", "v2", F.round(cos, 6).alias("cosine"))
    )
