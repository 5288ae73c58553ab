"""Pipeline-utility queries: reproducible splits and data-quality
profiling — the unglamorous operators every training-data pipeline
runs before anything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, portable_hash60_sql
from .registry import register, t


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE
             WHEN {portable_hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
             WHEN {portable_hash60_sql("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
    tags=("pipeline", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hashing the
    stable document id — no RNG state, so every run, every engine,
    and every future incremental batch splits identically (THE
    property a reproducible training pipeline needs; ``randomSplit``
    re-deals on every run). Stratification is just the lang grouping
    shown here."""
    bucket = portable_hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        t(spark, sf_dir, "documents")
        .select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "quality_profile_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS null_custkey,
           COUNT(*) - COUNT(o_totalprice) AS null_totalprice,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) AS nonpositive_price,
           COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                               OR o_orderdate > TIMESTAMP '2030-01-01') AS out_of_range_date,
           COUNT(DISTINCT o_orderkey) AS distinct_keys,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS duplicate_keys
    FROM orders
    """,
    tags=("pipeline", "quality"),
)
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile in ONE scan: null counts, range
    violations, key-uniqueness — the ingest gate before a table
    enters the pipeline. All conditional aggregates, no extra
    passes (never profile with one query per check at 100 TB)."""
    o = t(spark, sf_dir, "orders")
    cnt = F.count(F.lit(1))
    return o.agg(
        cnt.alias("n_rows"),
        (cnt - F.count("o_custkey")).alias("null_custkey"),
        (cnt - F.count("o_totalprice")).alias("null_totalprice"),
        F.count_if(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        F.count_if(
            (F.col("o_orderdate") < F.lit("1990-01-01"))
            | (F.col("o_orderdate") > F.lit("2030-01-01"))
        ).alias("out_of_range_date"),
        F.count_distinct(F.col("o_orderkey")).alias("distinct_keys"),
        (cnt - F.count_distinct(F.col("o_orderkey"))).alias("duplicate_keys"),
    )


@register(
    "salted_event_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    """,
    tags=("pipeline", "skew"),
)
def salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe hot-key counting: ``events.event_type`` has only ~5
    values, so a plain groupBy concentrates each key's final merge
    in one task. :func:`~..operators.skew.salted_count_by_key`
    splits every key into 16 deterministic xxhash64 salts —
    partial-aggregate per (key, salt), merge 16 rows per key — the
    answer is IDENTICAL to ``GROUP BY`` (the oracle is the plain
    form) but no single task ever owns a hot key's raw rows. This is
    the two-stage pattern for 100 TB skewed aggregations that
    map-side combine alone can't fix (e.g. collect_list/percentile
    states that don't pre-reduce)."""
    from ..operators.skew import salted_count_by_key

    return salted_count_by_key(
        t(spark, sf_dir, "events"), "event_type", salt_cols=["event_id"], n_salts=16
    )
