"""Distributed prefix sum — global cumulative aggregation without a
single-partition window.

A global running total over an ordered frame is the textbook case
where the naive plan dies at scale: ``SUM() OVER (ORDER BY ...)``
with no PARTITION BY collapses the whole frame into ONE task. The
classic fix is the two-pass prefix sum:

1. range-partition the frame on the global order and sort within
   partitions (each partition owns a contiguous key range),
2. per-partition running sums (parallel, partition-local windows),
3. one tiny pass over the |partitions| partition TOTALS computes each
   partition's starting offset (broadcast back as a join).

Correctness is partitioning-independent: the cumulative sum over a
total order is well-defined wherever the range boundaries land, so
the result is deterministic even though ``repartitionByRange``
samples boundaries. The reference has nothing like this (its only
ordered operation is the driver-side output sort, SURVEY §2.2); in
Spark it composes from three primitives and scales to any width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    n_partitions: int = 16,
    out_col: str = "cum_sum",
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over the
    total order given by ``order_cols`` (pass Column objects with
    ``.desc()``/``.asc()``; include a unique tie-break). The value
    column should be DECIMAL for an order-independent result."""
    ranged = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local_cum", F.sum(value_col).over(local_w))
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_ptotal"))
    # offsets: running total of PRECEDING partitions — |partitions|
    # rows, so this tiny unpartitioned window is fine by design
    offsets = totals.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_ptotal").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum", "_offset")
    )
