"""Salting correctness: salted two-stage aggregation and salted join
must produce exactly the plain operators' results on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_showcase_spark.operators.skew import salted_count_by_key, salted_join


def _skewed_df(spark):
    # one hot key (90% of rows) + uniform tail — the classic shape
    hot = spark.range(0, 18000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(0, 2000).select(
        F.concat(F.lit("k"), (F.col("id") % 97).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionAll(tail)


def test_salted_count_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {
        (r["k"], r["cnt"])
        for r in salted_count_by_key(df, "k", ["v"], n_salts=8).collect()
    }
    assert salted == plain


def test_salted_count_spreads_hot_key(spark):
    df = _skewed_df(spark)
    stage1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64("v"), F.lit(8)))
        .groupBy("k", "_salt")
        .count()
    )
    hot_parts = stage1.filter(F.col("k") == "hot").count()
    assert hot_parts == 8, "hot key must split across all salts"


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = big.select("k").distinct().withColumn("tag", F.upper("k"))
    plain = big.join(small, "k").select("k", "v", "tag")
    salted = salted_join(big, small, "k", ["v"], n_salts=8).select("k", "v", "tag")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
