"""Small plan utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer
    partitions than the cluster has parallelism.

    Single parquet files produce one input partition per row group;
    expression-heavy stages (regex tokenize, higher-order shingle/
    vector folds) then run on one core no matter how many exist. At
    real scale inputs have plenty of splits and this is a no-op —
    the guard makes it safe to leave in every expression-heavy
    plan.

    The guard is two-tier to keep plan builds cheap: ``inputFiles()``
    (a driver-side catalog listing, no plan materialization) short-
    circuits the common at-scale case of many input files; only
    few-file inputs fall through to ``rdd.getNumPartitions()``, the
    exact-but-costlier probe that converts the plan to an RDD DAG."""
    sc = df.sparkSession.sparkContext
    try:
        if len(df.inputFiles()) >= sc.defaultParallelism:
            return df
    except Exception:  # non-file-based plans (e.g. in-memory relations)
        pass
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
