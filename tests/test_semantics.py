"""Engine-semantics pins: ANSI error behavior and the observe()
metrics API — cross-cutting contracts a user of the engine relies
on, independent of any single query."""

from __future__ import annotations

import pytest


def test_ansi_mode_raises_and_try_variants_null(spark):
    """The engine runs ANSI SQL semantics (Spark 4 default): a
    malformed cast is an ERROR, not a silent NULL — the behavior
    that stops a 100 TB job from quietly nulling a corrupted
    column. The sanctioned lenient path is the try_* family, which
    returns NULL per element instead."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        spark.sql("SELECT CAST('abc' AS INT) AS x").collect()
    row = spark.sql(
        "SELECT try_cast('abc' AS INT) AS x, try_divide(1, 0) AS d, "
        "try_add(9223372036854775807, 1) AS o"
    ).first()
    assert row["x"] is None and row["d"] is None and row["o"] is None


def test_observe_metrics_collected_in_one_pass(spark, sf_dir):
    """df.observe(): accumulator-backed metrics ride the SAME job as
    the query (no second scan) — how a production pipeline gets
    row counts / quality gauges without paying an extra pass over
    100 TB."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from map_reduce_showcase_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("order_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    )
    n_via_query = observed.count()
    metrics = obs.get
    assert metrics["n_rows"] == n_via_query
    exact = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    ).first()[0]
    assert metrics["total"] == exact
