"""Similarity-search queries over ``embeddings``: exact brute-force
top-k and the sign-LSH bucketed approximate variant (both
oracle-checked — the LSH hyperplanes are deterministic md5-derived
±1 vectors, inlined as literals into the SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..similarity.brute_force import topk_cosine
from ..similarity.lsh import N_PLANES, hyperplane_signs, topk_cosine_lsh
from .registry import register, t

N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             list_cosine_similarity(q.qv, c.v) AS cos
      FROM q JOIN e c ON c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, CAST(rnk AS INT) AS rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "knn"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the 10 query vectors —
    broadcast the query batch, score candidates in place (native
    zip_with/aggregate fold, no Python), per-query rank window."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_cosine(queries, emb, k=TOP_K).withColumn("rnk", F.col("rnk").cast("int"))


def _planes_sql() -> list[str]:
    return [
        "[" + ", ".join(f"{v:.1f}" for v in plane) + "]"
        for plane in hyperplane_signs()
    ]


def _bucket_sql(vec: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec}, {plane}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(_planes_sql())
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             CAST({_bucket_sql("CAST(embedding AS DOUBLE[])")} AS INT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             list_cosine_similarity(q.qv, c.v) AS cos
      FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id, CAST(rnk AS INT) AS rnk, round(cos, 6) AS cosine
    FROM ranked WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "lsh"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-5: {N}-bit deterministic hyperplane
    buckets, search only the query's bucket. ~2^{N}× less scoring
    work; recall vs the exact twin is measured in tests. The oracle
    replays the identical bucketing from inlined ±1 literals."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return topk_cosine_lsh(queries, emb, k=TOP_K).withColumn(
        "rnk", F.col("rnk").cast("int")
    )


@register("sim_bucket_histogram", oracle=f"""
    SELECT CAST({_bucket_sql("CAST(embedding AS DOUBLE[])")} AS INT) AS bucket,
           COUNT(*) AS n_vectors
    FROM embeddings
    GROUP BY bucket
    """, tags=("similarity", "lsh"))
def sim_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket occupancy histogram — the skew diagnostic for the
    ANN index (a hot bucket = a hot partition at 100 TB)."""
    from ..similarity.lsh import lsh_bucket

    return (
        t(spark, sf_dir, "embeddings")
        .select(lsh_bucket(F.col("embedding"), hyperplane_signs()).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
