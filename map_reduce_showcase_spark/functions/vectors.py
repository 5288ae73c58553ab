"""Vector column expressions over ``array<float>`` embeddings.

All built on ``zip_with``/``aggregate`` higher-order functions —
JVM-side, codegen'd, no Python. Elements are cast to DOUBLE before
any arithmetic and accumulated with a sequential left fold so results
are bit-reproducible (and replayable by the DuckDB oracle, which also
folds sequentially).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a||·||b||), deterministic double arithmetic."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``cosine_similarity`` with the norms precomputed.

    Scoring joins evaluate cosine once per PAIR; the norm of each
    vector is pair-invariant, so folding it per pair triples the
    higher-order-function work (dot + 2 norms ≈ 3×dim element ops
    per pair instead of 1×dim). Callers compute ``l2_norm`` once per
    row before the join and pass the columns here. The arithmetic is
    the identical expression tree (sqrt of a sequential fold, one
    divide), so results are bit-equal to ``cosine_similarity``."""
    return dot(a, b) / (norm_a * norm_b)
