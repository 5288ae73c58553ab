"""Parquet table sources for the engine's standard catalog.

The reference's only source is "one map task per whole local text
file" (``src/worker/mod.rs:166-180``); our standard catalog is
columnar Parquet read through ``spark.read.parquet``, which gets us
(all free via the DataSource V2 scan + Catalyst):

* column pruning — only referenced columns are decoded,
* predicate pushdown — filters reach the parquet row-group stats,
* splittable scans — partition count tracks
  ``spark.sql.files.maxPartitionBytes``, not file count (the
  reference's task-per-file granularity makes its biggest file the
  straggler; see SURVEY.md §4.2).

At 100 TB the same call works unchanged against an object store
(``s3a://...``); partition pruning applies when the layout is
hive-partitioned (e.g. ``.../date=2024-01-01/``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark cannot
    represent (SPARK-44988): we read nanos as raw longs (runtime conf
    so it works under any caller's session) and truncate to
    microseconds — the same truncation DuckDB's ns→us cast applies,
    keeping the two engines value-identical."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for ``spark.sql``."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
