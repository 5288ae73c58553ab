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

    DataFrame-native: ``spark.read.text(..., wholetext=True)`` keeps
    the whole-file read inside the datasource framework (file
    listing parallelized, metadata columns, pruning) instead of the
    legacy RDD ``wholeTextFiles``. Fine for corpora of many
    small/medium files; for 100 TB of large files prefer
    :func:`read_lines_with_path`, which splits.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(paths, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value").alias("content")
    )


def read_lines_with_path(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """(path, line_no, line) rows; line_no is 1-based within its file.

    The 1-based numbering matches grep's ``lines().enumerate()``
    (``src/app/grep.rs:37-46``), including Rust ``lines()`` edge
    semantics: ``\\r\\n`` counts as one terminator and a trailing
    newline does not produce a final empty line.

    Numbering is computed per file with ``posexplode`` over a
    whole-file read — scan-local, NO shuffle and no corpus-wide sort
    (the naive alternative, a window over a global monotonic id,
    re-sorts the entire corpus on every read). The trade-off is the
    reference's own F1 input model: one row per file, so a single
    file must fit in memory. For line numbers over huge splittable
    files, carry them in the data or derive from split offsets.
    """
    if isinstance(paths, str):
        paths = [paths]
    content = spark.read.text(paths, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value")
    )
    lines = F.split(F.regexp_replace(F.col("value"), r"\r?\n$", ""), r"\r?\n")
    return (
        content.filter(F.length("value") > 0)  # empty file → zero lines
        .select("path", F.posexplode(lines).alias("pos", "line"))
        .select("path", (F.col("pos") + 1).cast("int").alias("line_no"), "line")
    )
