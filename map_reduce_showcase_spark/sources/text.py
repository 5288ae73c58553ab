"""Text-file sources mirroring the reference's input model.

Reference F1 (SURVEY.md §2.1): one map task per whole input file,
key = file path, value = entire file bytes
(``src/worker/mod.rs:166-180``). Two Spark-native equivalents:

* :func:`read_whole_files` — semantically identical ``(path,
  content)`` rows. Used by the golden-output parity tests that run
  the three reference apps on the reference's own ``data/`` corpus.
* :func:`read_lines_with_path` — line granularity with provenance,
  the shape grep actually wants; splittable, so one huge file no
  longer pins one task (the reference's skew mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_whole_files(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """(path, content) per file — reference F1's exact shape.

    Built on ``wholeTextFiles`` (the one deliberate RDD use in this
    codebase: whole-file pairing is its native contract). Fine for
    corpora of many small/medium files; for 100 TB of large files
    prefer :func:`read_lines_with_path`, which splits.
    """
    if isinstance(paths, str):
        paths = [paths]
    rdd = spark.sparkContext.wholeTextFiles(",".join(paths))
    return rdd.toDF(["path", "content"])


def read_lines_with_path(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """(path, line_no, line) rows; line_no is 1-based within its file.

    The 1-based numbering matches grep's ``lines().enumerate()``
    (``src/app/grep.rs:37-46``). Implemented with a per-file window
    over a monotonic id — at scale, prefer carrying line numbers in
    the data itself; this source exists for reference parity on
    small file corpora.
    """
    if isinstance(paths, str):
        paths = [paths]
    df = (
        spark.read.text(paths)
        .withColumn("path", F.input_file_name())
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("path").orderBy("_mid")
    return df.select(
        "path",
        F.row_number().over(w).alias("line_no"),
        F.col("value").alias("line"),
    )
