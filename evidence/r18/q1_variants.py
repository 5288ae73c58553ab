"""q1 salt variants for cost isolation."""
from pyspark.sql import functions as F
from map_reduce_showcase_spark.plans.registry import t
from map_reduce_showcase_spark.plans.queries_relational import (
    N_SUM_SALT, cents, disc_price_cents, sum_cents_2level, unscale,
)

def _q1(spark, sf_dir, salt_on, n_salt):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty, price, disc = cents("l_quantity"), cents("l_extendedprice"), cents("l_discount")
    dp = disc_price_cents()
    charge_tax = dp * cents("l_tax")
    g = sum_cents_2level(
        li, ["l_returnflag", "l_linestatus"],
        {"_q": qty, "_p": price, "_dp": dp, "_cht": charge_tax, "_d": disc},
        ["count_order"], salt_on=salt_on, n_salt=n_salt,
    )
    return g.select(
        "l_returnflag", "l_linestatus",
        unscale("_q", 2).alias("sum_qty"),
        unscale("_p", 2).alias("sum_base_price"),
        unscale("_dp", 4).alias("sum_disc_price"),
        unscale(F.col("_dp") * F.lit(100) + F.col("_cht"), 6).alias("sum_charge"),
        (unscale("_q", 2) / F.col("count_order")).alias("avg_qty"),
        (unscale("_p", 2) / F.col("count_order")).alias("avg_price"),
        (unscale("_d", 2) / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )

def q1_val2048(spark, sf_dir):
    return _q1(spark, sf_dir, "l_extendedprice", 2 * N_SUM_SALT)

def q1_okey2048(spark, sf_dir):
    return _q1(spark, sf_dir, "l_orderkey", 2 * N_SUM_SALT)
