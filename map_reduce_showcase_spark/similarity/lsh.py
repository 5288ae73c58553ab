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

from ..functions.vectors import cosine_from_norms, dot_sql, l2_norm

DIM = 64
#: 4 planes → 16 cells. For weakly-correlated vectors P(two vectors
#: agree on one plane) ≈ 1 − θ/π; with θ≈60° that is ~0.67 per
#: plane, so plane count is a direct recall/fan-out dial — 8 planes
#: drove recall to ~0.67^8≈4% on this data. 4 planes + Hamming-1
#: multiprobe lands recall ≈0.6 at ~5/16 of the scoring work.
N_PLANES = 4


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


def _plane_sql(plane: list[float]) -> str:
    """The ±1 plane as ONE array-literal SQL fragment — building it
    from 64 individual ``F.lit`` calls costs ~64 py4j round trips per
    plane (seconds per plan build on a py4j-slow driver); the parsed
    expression is identical."""
    return "array(" + ",".join(f"{v:.1f}D" for v in plane) + ")"


def lsh_bucket(emb_sql: str, planes: list[list[float]]) -> Column:
    """Bucket id column: bit p = (emb · plane_p ≥ 0). ``emb_sql`` is
    SQL text (a column name), and the whole bucket — every plane's
    dot-product fold included — is ONE parsed expression: the
    Column-API form of the same tree cost 0.24 s of py4j round trips
    per plan build (r18; ~40% of sim_topk_lsh's bench time was
    building plans, not running them)."""
    terms = " + ".join(
        f"(CASE WHEN {dot_sql(emb_sql, _plane_sql(plane))} >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return F.expr(f"CAST((0 + {terms}) AS INT)")


def banded_band_keys(
    emb_sql: str, planes: list[list[float]], rows_per_band: int
) -> list[Column]:
    """One join key per band: ``band_no * 2^r + bucket`` where the
    bucket is the band's ``r`` sign bits. AND-ing ``r`` planes per
    band sharpens precision; OR-ing across ``len(planes)/r`` bands
    restores recall — the classic S-curve, same shape as MinHash
    banding but for cosine. One parsed expression per key (see
    :func:`lsh_bucket`)."""
    n_bands = len(planes) // rows_per_band
    keys = []
    for b in range(n_bands):
        terms = " + ".join(
            f"(CASE WHEN {dot_sql(emb_sql, _plane_sql(planes[b * rows_per_band + j]))}"
            f" >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(rows_per_band)
        )
        keys.append(
            F.expr(f"CAST(({b * (1 << rows_per_band)} + (0 + {terms})) AS INT)")
        )
    return keys


def cosine_pairs_lsh(
    vectors: DataFrame,
    threshold: float,
    rows_per_band: int = 2,
    n_bands: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ ``threshold``) via
    banded sign-LSH — the 100 TB path, NO cross join anywhere:

    1. bucket: each vector emits ``n_bands`` band keys (one scan),
    2. candidates: self equi-join per band key, ``v1 < v2``,
       distinct — shuffle is on band keys, work is per-bucket,
    3. verify: join candidate ids back to their embeddings and keep
       exact cosine ≥ threshold (touches candidates only).

    Recall: a pair at angle θ agrees per plane with p = 1 − θ/π, so
    P(candidate) = 1 − (1 − p^r)^b. At threshold 0.45 (θ≈63°,
    p≈0.65) the default 2×8 gives ≈0.99; at a production near-dup
    threshold of 0.9 (p≈0.86) it is ≈1-1e-6. Exactness on found
    pairs is guaranteed by the verify stage; the brute-force twin
    (``brute_force.cosine_pairs``) measures recall in tests.
    """
    planes = hyperplane_signs(n_planes=rows_per_band * n_bands)
    from ..functions.util import rebalance

    v = rebalance(vectors).select("vec_id", "embedding")
    keys = banded_band_keys("embedding", planes, rows_per_band)
    # Each row keeps its FULL band-key vector alongside the exploded
    # key so a colliding pair can check, in place, whether an EARLIER
    # band already matched ("emit from first colliding band"). That
    # filter replaces a distinct() — i.e. a full shuffle of the raw
    # candidate stream, the largest intermediate in the query — with
    # a per-row check over ≤ n_bands ints. Band keys encode the band
    # number (band * 2^r + bucket), so bkey equality implies same
    # band and the zip below compares aligned prefixes.
    bucketed = v.select(
        "vec_id",
        F.array(*keys).alias("bkeys"),
        F.posexplode(F.array(*keys)).alias("band", "bkey"),
    )
    first_match = F.expr(
        "NOT exists(zip_with(slice(a.bkeys, 1, a.band), "
        "slice(b.bkeys, 1, b.band), (x, y) -> x = y), hit -> hit)"
    )
    cand = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bkey")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(first_match)
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
    )
    # norms folded once per vector, not once per candidate pair
    e1 = v.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        l2_norm("embedding").alias("n1"),
    )
    e2 = v.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        l2_norm("embedding").alias("n2"),
    )
    cos = cosine_from_norms("e1", "e2", "n1", "n2")
    return (
        cand.join(e1, "v1")
        .join(e2, "v2")
        .filter(cos >= threshold)
        .select("v1", "v2", F.round(cos, 6).alias("cosine"))
    )


def topk_cosine_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    planes: list[list[float]] | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k per query, searching the query's bucket
    plus (with ``multiprobe``) every Hamming-1 neighbor bucket —
    flipping the weakest assumption instead of rebucketing is how
    LSH recall is tuned at scale without touching the index. Output
    ``(query_id, cand_id, rnk, cosine)`` — same shape as the exact
    ``topk_cosine`` so tests can measure recall."""
    if planes is None:
        planes = hyperplane_signs()
    bucket = lsh_bucket("embedding", planes)
    probe_list = [bucket] + (
        [bucket.bitwiseXOR(F.lit(1 << p)) for p in range(len(planes))]
        if multiprobe
        else []
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
        F.explode(F.array(*probe_list)).alias("bucket"),
    )
    from ..functions.util import rebalance

    c = rebalance(candidates).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("c_norm"),
        bucket.alias("bucket"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_from_norms("q_emb", "c_emb", "q_norm", "c_norm").alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk", F.round(F.col("cos"), 6).alias("cosine"))
    )
