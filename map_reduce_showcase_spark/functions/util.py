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
    plan."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
