"""Small plan utilities."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

#: (session id, sorted input files) -> estimated scan partitions.
#: File-split planning is deterministic per session config, so the
#: estimate never goes stale within a session.
_SPLIT_CACHE: dict[tuple[int, tuple[str, ...]], int] = {}


def _size_bytes(v: str) -> int:
    """Parse a Spark size conf value ("134217728", "128m", "4MB")."""
    s = v.strip().lower().removesuffix("b")
    for suf, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suf):
            return int(float(s[: -len(suf)]) * mult)
    return int(s)


def _estimated_scan_partitions(
    spark: SparkSession, files: list[str]
) -> int | None:
    """Replay Spark's file-split planning from metadata only.

    Mirrors ``FilePartition.maxSplitBytes``: splits are
    ``min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))``
    where ``bytesPerCore`` spreads the open-cost-padded total over
    ``minPartitionNum`` (default: the default parallelism). Uses the
    Hadoop FileSystem for sizes — pure driver-side metadata, no
    plan→RDD conversion, no job. Returns None when a size lookup
    fails (caller falls back to the exact RDD probe)."""
    sc = spark.sparkContext
    try:
        max_pb = _size_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        open_cost = _size_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
        )
        min_part = int(
            spark.conf.get(
                "spark.sql.files.minPartitionNum", str(sc.defaultParallelism)
            )
        )
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            total += fs.getFileStatus(p).getLen() + open_cost
        bytes_per_core = total // max(min_part, 1)
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        return max(1, math.ceil(total / max(max_split, 1)))
    except Exception:
        return None


def rebalance(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer
    partitions than the cluster has parallelism.

    Single parquet files produce one input partition per row group;
    expression-heavy stages (regex tokenize, higher-order shingle/
    vector folds) then run on one core no matter how many exist. At
    real scale inputs have plenty of splits and this is a no-op —
    the guard makes it safe to leave in every expression-heavy
    plan.

    The guard stays metadata-only on the hot path: ``inputFiles()``
    (a driver-side catalog listing) short-circuits the at-scale
    many-files case; few-file inputs get their split count REPLAYED
    from file sizes + the session's split config (memoized per file
    set) instead of the ``rdd.getNumPartitions()`` probe, which
    converts the whole plan to an RDD DAG and costs 0.1–0.7 s of
    driver time per call. The RDD probe survives only as the
    fallback for non-file plans (in-memory relations)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    par = sc.defaultParallelism
    files: list[str] | None
    try:
        files = df.inputFiles()
    except Exception:  # non-file-based plans (e.g. in-memory relations)
        files = None
    if files:
        if len(files) >= par:
            return df
        key = (id(spark), tuple(sorted(files)))
        est = _SPLIT_CACHE.get(key)
        if est is None:
            est = _estimated_scan_partitions(spark, files)
            if est is not None:
                _SPLIT_CACHE[key] = est
        if est is not None:
            return df.repartition(par) if est < par else df
    if df.isStreaming:
        # a streaming DataFrame has no .rdd and its parallelism is the
        # source's to decide — never probe, never repartition here
        return df
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def pinned_shuffle(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on ``keys`` with an EXPLICIT partition count
    (the session's ``spark.sql.shuffle.partitions`` — the scale knob
    ``session.py`` documents as ~2-3× total cores on a cluster).

    A downstream operator clustered the same way (groupBy / window /
    session-window / join on ``keys``) reuses this exchange, so no
    extra shuffle is added (guide §2.4). What the explicit count buys
    is an escape from AQE's bytes-based partition coalescing for this
    ONE exchange: AQE sizes post-shuffle partitions by input bytes,
    which serializes stages whose per-row work dwarfs their bytes —
    r17 measured a 0.1 MB distinct-names input expanding ~140× inside
    a single coalesced task (dedup_fuzzy_names), and sub-MB window /
    session inputs pinned to 1-2 tasks. Use only where the downstream
    stage is known expression- or expansion-heavy; everywhere else
    AQE's sizing is the right default."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    from pyspark.sql import functions as F

    return df.repartition(n, *[F.col(k) for k in keys])
