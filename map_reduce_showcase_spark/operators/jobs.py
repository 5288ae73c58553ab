"""Job-submission façade: the reference's client API, Spark-backed.

The reference's entire query surface is
``submit(app, files, output_dir, n_reduce, args) → poll → process``
(``proto/coordinator.proto:26-32``, ``src/client.rs:31-115``). This
module reproduces that exact contract so a reference user can port
their scripts 1:1:

* app registry with the same three names (``wc``, ``grep``,
  ``vertex-degree``) and the same unknown-app error behavior
  (submit-time validation, ``src/coordinator/mod.rs:198-201``),
* ``n_reduce`` → number of output files (``mr-out``-equivalent,
  one per partition — ``src/worker/mod.rs:138-144``),
* ``args`` → the app's parameters (grep's ``--term``,
  ``src/app/grep.rs:18-34``),
* ``process_output`` → the app's exact human-readable format.

Everything in between — scheduling, shuffle, retries, barriers — is
Spark's driver/executors (SURVEY.md §2.3: C1-C10 map to built-ins).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.text import read_lines_with_path, read_whole_files
from .mapreduce import (
    format_grep,
    format_vertex_degree,
    format_word_count,
    grep_lines,
    parse_edge_lines,
    vertex_degree,
    word_count_report,
)

APPS = ("wc", "grep", "vertex-degree")


@dataclass
class JobResult:
    """What the reference's poll+process yields: the result rows and
    the formatted output string."""

    df: DataFrame
    output: str
    output_dir: str | None = None
    n_output_files: int = field(default=0)


def submit_job(
    spark: SparkSession,
    app: str,
    files: list[str],
    output_dir: str | None = None,
    n_reduce: int = 5,
    args: list[str] | None = None,
) -> JobResult:
    """Run one reference-style job to completion (the Spark action IS
    submit+poll — blocking, with retries and stage barriers inside).

    Unknown ``app`` raises ValueError at submit time, matching the
    coordinator's InvalidArgument."""
    args = args or []
    cached = None  # unpersisted in the finally below, success or not
    try:
        if app == "wc":
            df = word_count_report(read_whole_files(spark, files), "content")
            fmt = format_word_count
        elif app == "grep":
            term = _parse_term(args)
            df = grep_lines(read_lines_with_path(spark, files), term)
            fmt = format_grep
        elif app == "vertex-degree":
            # persist the parsed edges: the validation pass, the result,
            # and an optional sink all consume them — one parse, not three
            cached = parse_edge_lines(
                read_lines_with_path(spark, files).select("line")
            ).persist()
            if cached.filter(~cached.valid).limit(1).count():
                # reference: malformed line => fatal task failure => job
                # failed with recorded errors (src/vertex_degree.rs:26-27)
                raise ValueError("vertex-degree: malformed edge line")
            df = vertex_degree(cached, "src", "dst")
            fmt = format_vertex_degree
        else:
            raise ValueError(f"unknown app {app!r}; known: {APPS}")

        n_files = 0
        if output_dir is not None:
            from ..sources.sinks import write_n_files

            n_files = write_n_files(df, output_dir, n_reduce, by_col=df.columns[0])
        # all actions complete before the finally drops the cache; the
        # returned df stays valid (recomputes from source if re-used)
        return JobResult(
            df=df, output=fmt(df.collect()), output_dir=output_dir, n_output_files=n_files
        )
    finally:
        if cached is not None:
            cached.unpersist()


def process_job(spark: SparkSession, app: str, output_dir: str) -> JobResult:
    """The reference's SEPARATE ``process`` invocation: re-read the
    job's output files from disk in a second client run and format
    them (``src/client.rs:66-93``, ``src/bin/client.rs:155-162``) —
    no recomputation, only read-back + format.

    Files are the parquet ``write_n_files`` wrote (the engine's
    ``mr-out-*`` equivalent; SURVEY.md §1.4 maps F11's
    length-delimited codec to parquet). Hash-partitioned files carry
    no global order, so presentation order is (re)applied here, as
    the reference's process step re-sorts per app
    (``src/app/wc.rs:60-66``, ``src/app/grep.rs:64-78``)."""
    if app not in APPS:
        raise ValueError(f"unknown app {app!r}; known: {APPS}")
    from pyspark.sql import functions as F

    df = spark.read.parquet(output_dir)
    if app == "wc":
        df = df.orderBy(F.col("cnt").asc(), F.col("word").asc())
        fmt = format_word_count
    elif app == "grep":
        fmt = format_grep  # sorts (path, line_no) itself
    else:
        fmt = format_vertex_degree  # sorts by vertex itself
    return JobResult(df=df, output=fmt(df.collect()), output_dir=output_dir)


def _parse_term(args: list[str]) -> str:
    """grep's clap-style ``--term <t>`` parsing (src/app/grep.rs:25-34)."""
    for i, a in enumerate(args):
        if a == "--term" and i + 1 < len(args):
            return args[i + 1]
        if a.startswith("--term="):
            return a.split("=", 1)[1]
    raise ValueError("grep requires --term <substring>")
