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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


#: Spark conf that maps parquet TIMESTAMP(NANOS) — unrepresentable in
#: Spark (SPARK-44988) — onto raw epoch-nano longs at scan time.
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

#: Epoch-magnitude thresholds for inferring the unit of a raw INT64
#: timestamp column. A wall-clock instant between 1973 and ~5000 AD
#: lands unambiguously in exactly one band: seconds ~1e9,
#: millis ~1e12, micros ~1e15, nanos ~1e18.
_UNIT_BANDS = (
    (100_000_000_000, "timestamp_seconds(ts)"),
    (100_000_000_000_000, "timestamp_millis(ts)"),
    (100_000_000_000_000_000, "timestamp_micros(ts)"),
    # nanos: truncate to micros — the same truncation DuckDB's ns→us
    # cast applies, keeping the two engines value-identical.
    (None, "timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"),
)


def _first_parquet_file(path: str) -> str:
    """A parquet data file under ``path`` (itself, or one part file)."""
    if not os.path.isdir(path):
        return path
    for root, _dirs, files in sorted(os.walk(path)):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no parquet data files under {path}")


def _epoch_long_to_ts_expr(path: str) -> str:
    """SQL expr converting a raw INT64 ``ts`` to TIMESTAMP.

    Spark shows LongType either because the file is annotated
    TIMESTAMP(NANOS) under ``nanosAsLong`` (arrow schema tells the
    unit directly) or because the column is plain ``int64`` with no
    annotation — then the unit is inferred from the footer statistics
    (metadata-only: one row-group min, no data scan; at 100 TB this
    touches a single footer). Falls back to reading one row group if
    stats are absent.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(_first_parquet_file(path))
    arrow_type = pf.schema_arrow.field("ts").type
    if pa.types.is_timestamp(arrow_type):
        return {
            "s": "timestamp_seconds(ts)",
            "ms": "timestamp_millis(ts)",
            "us": "timestamp_micros(ts)",
            "ns": "timestamp_micros(CAST(ts DIV 1000 AS BIGINT))",
        }[arrow_type.unit]
    sample = None
    md = pf.metadata
    idx = next(
        i for i in range(len(md.schema)) if md.schema.column(i).name == "ts"
    )
    for rg in range(md.num_row_groups):
        stats = md.row_group(rg).column(idx).statistics
        if stats is not None and stats.has_min_max:
            sample = stats.min
            break
    if sample is None and md.num_row_groups:
        col = pf.read_row_group(0, columns=["ts"]).column("ts")
        if len(col):
            sample = col[0].as_py()
    if sample is None:  # empty table: unit is irrelevant, pick micros
        sample = 10**15
    for bound, expr in _UNIT_BANDS:
        if bound is None or sample < bound:
            return expr
    raise AssertionError("unreachable")


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load ``events`` robustly across physical encodings of ``ts``.

    Dispatch on what Spark actually loads, not on an assumed layout
    (testdata regeneration changed TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
    between rounds and must never break the catalog again):

    * timestamp / timestamp_ntz — pass through unchanged,
    * raw INT64 — unit inferred from footer stats, converted to
      TIMESTAMP (covers nanos/micros/millis/seconds-as-long),
    * TIMESTAMP(NANOS) — the plain read raises (SPARK-44988); retry
      with ``nanosAsLong`` scoped to this read, then truncate to
      micros. The conf is restored afterward: schema resolution
      happens eagerly at ``read.parquet`` time, and the physical scan
      re-converts from the already-resolved schema (pinned by
      tests/test_catalog_encodings.py).
    """
    try:
        df = spark.read.parquet(path)
    except Exception:
        prev = None
        try:
            prev = spark.conf.get(_NANOS_CONF)
        except Exception:
            prev = None
        spark.conf.set(_NANOS_CONF, "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev)
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.expr(_epoch_long_to_ts_expr(path)))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has drifted physical encodings across testdata
    generations; :func:`_load_events` dispatches on the dtype Spark
    actually loads so every encoding yields the same TIMESTAMP rows."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for ``spark.sql``."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
