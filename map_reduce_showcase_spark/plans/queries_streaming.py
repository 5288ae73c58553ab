"""Registered Structured-Streaming queries.

The other streaming evidence lives in ``tests/test_streaming.py``
(stream-vs-batch equivalence, stateful ops, idempotent sinks); this
module gives the driver a directly-runnable entry: a REAL streaming
query — file source replayed one file per micro-batch, event-time
watermark, windowed aggregation, memory sink — whose complete-mode
output equals the batch group-by, so it carries a full DuckDB oracle
(not just a rows-only check).

The reference has no streaming at all (SURVEY.md §2.4); this is the
Spark-native capability a 100 TB/day ingest pipeline would run with
the file source swapped for Kafka and the memory sink for a
``foreachBatch`` parquet/MERGE writer (``streaming/demo.py``).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.demo import read_events_stream, streaming_tumbling_counts
from .registry import register, t

_QUERY_NAME = "mrs_streaming_smoke_sink"


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window-agg"),
)
def streaming_tumbling_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming: replay the events table as a
    multi-batch file stream (``maxFilesPerTrigger=1`` so the
    watermark actually advances across micro-batches), aggregate
    tumbling 1-hour counts per event type, and materialize via the
    memory sink. Complete output mode ⇒ the final table equals the
    batch aggregation, which is what the oracle checks.

    Scale shape: identical plan to ``events_tumbling_1h`` run
    incrementally — state is (window × event_type) rows in the state
    store, bounded by the watermark; swap source for Kafka and sink
    for foreachBatch and nothing else changes."""
    tmp = tempfile.mkdtemp(prefix="mrs_stream_smoke_")
    in_dir = f"{tmp}/events_in"
    (
        t(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .repartition(4)
        .write.mode("overwrite")
        .parquet(in_dir)
    )
    for q in spark.streams.active:
        if q.name == _QUERY_NAME:
            q.stop()
    query = (
        streaming_tumbling_counts(read_events_stream(spark, in_dir))
        .writeStream.format("memory")
        .queryName(_QUERY_NAME)
        .outputMode("complete")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(_QUERY_NAME).select("window_start", "event_type", "n_events")
