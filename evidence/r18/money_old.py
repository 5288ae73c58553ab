"""Pre-r18 (HEAD) money-query builders for ABBA comparison."""
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from map_reduce_showcase_spark.plans.registry import t

def dec2(c):
    return F.col(c).cast("decimal(18,2)")


def disc_price():
    """l_extendedprice * (1 - l_discount), exact DECIMAL(18,4)."""
    one = F.lit(1).cast("decimal(18,2)")
    return (dec2("l_extendedprice") * (one - dec2("l_discount"))).cast("decimal(18,4)")



N_SUM_SALT = 1024


def cents(c, scale: int = 2):
    """Exact integer ``c·10^scale`` (a LONG) of a clean money double —
    see the module-comment precondition."""
    col = F.col(c) if isinstance(c, str) else c
    return (col * float(10**scale) + F.lit(0.5)).cast("long")


def unscale(c, scale: int):
    """Exact ``c / 10^scale`` as DOUBLE for an integer-cents sum
    (long or decimal): one exact decimal division + one correctly-
    rounded decimal→double cast, evaluated once per group row."""
    col = F.col(c) if isinstance(c, str) else c
    return (col.cast("decimal(38,0)") / F.lit(10**scale)).cast("double")


def disc_price_cents():
    """``cents(l_extendedprice·(1−l_discount), 4)`` in long math —
    the integer-cents twin of :func:`disc_price`."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def sum_cents_2level(df: DataFrame, keys: list[str], sums: dict, counts, salt_on: str):
    """Two-level exact grouped sums: long partials per (keys, salt),
    exact decimal re-sum per keys. ``sums`` maps output name → long
    Column; ``counts`` is an iterable of output names for row counts
    (counted at level 1, long-summed at level 2). ``salt_on`` names a
    column whose hash spreads each group's rows across ``N_SUM_SALT``
    partials — any deterministic per-row value works (exactness never
    depends on the spread, only the inner-long overflow headroom
    does)."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(N_SUM_SALT))
    lvl1 = df.groupBy(*keys, salt.alias("_salt")).agg(
        *[F.sum(col).alias(name) for name, col in sums.items()],
        *[F.count(F.lit(1)).alias(name) for name in counts],
    )
    return lvl1.groupBy(*keys).agg(
        *[F.sum(F.col(name).cast("decimal(38,0)")).alias(name) for name in sums],
        *[F.sum(F.col(name)).alias(name) for name in counts],
    )



def cents(c, scale: int = 2):
    """Exact integer ``c·10^scale`` (a LONG) of a clean money double —
    see the module-comment precondition."""
    col = F.col(c) if isinstance(c, str) else c
    return (col * float(10**scale) + F.lit(0.5)).cast("long")


def unscale(c, scale: int):
    """Exact ``c / 10^scale`` as DOUBLE for an integer-cents sum
    (long or decimal): one exact decimal division + one correctly-
    rounded decimal→double cast, evaluated once per group row."""
    col = F.col(c) if isinstance(c, str) else c
    return (col.cast("decimal(38,0)") / F.lit(10**scale)).cast("double")


def disc_price_cents():
    """``cents(l_extendedprice·(1−l_discount), 4)`` in long math —
    the integer-cents twin of :func:`disc_price`."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def sum_cents_2level(df: DataFrame, keys: list[str], sums: dict, counts, salt_on: str):
    """Two-level exact grouped sums: long partials per (keys, salt),
    exact decimal re-sum per keys. ``sums`` maps output name → long
    Column; ``counts`` is an iterable of output names for row counts
    (counted at level 1, long-summed at level 2). ``salt_on`` names a
    column whose hash spreads each group's rows across ``N_SUM_SALT``
    partials — any deterministic per-row value works (exactness never
    depends on the spread, only the inner-long overflow headroom
    does)."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(N_SUM_SALT))
    lvl1 = df.groupBy(*keys, salt.alias("_salt")).agg(
        *[F.sum(col).alias(name) for name, col in sums.items()],
        *[F.count(F.lit(1)).alias(name) for name in counts],
    )
    return lvl1.groupBy(*keys).agg(
        *[F.sum(F.col(name).cast("decimal(38,0)")).alias(name) for name in sums],
        *[F.sum(F.col(name)).alias(name) for name in counts],
    )



def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) adapted to the catalog schema.

    One scan; partial aggregation happens map-side so shuffled rows =
    groups × partitions. The shipdate predicate pushes to parquet
    row-group stats. Money sums run in integer cents (two-level —
    see the cents module comment): the r17 profile had the old
    per-row double→decimal casts at ~0.4 s of the 0.8 s scan stage,
    and the cents form measured value-identical and 2.4× faster."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty, price, disc = cents("l_quantity"), cents("l_extendedprice"), cents("l_discount")
    dp = disc_price_cents()                    # e4-scaled
    charge = dp * (F.lit(100) + cents("l_tax"))  # e6-scaled
    g = sum_cents_2level(
        li,
        ["l_returnflag", "l_linestatus"],
        {"_q": qty, "_p": price, "_dp": dp, "_ch": charge, "_d": disc},
        ["count_order"],
        salt_on="l_extendedprice",
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        unscale("_q", 2).alias("sum_qty"),
        unscale("_p", 2).alias("sum_base_price"),
        unscale("_dp", 4).alias("sum_disc_price"),
        unscale("_ch", 6).alias("sum_charge"),
        (unscale("_q", 2) / F.col("count_order")).alias("avg_qty"),
        (unscale("_p", 2) / F.col("count_order")).alias("avg_price"),
        (unscale("_d", 2) / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )



def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue rollup: fact ⋈ three broadcast dims.

    supplier/nation/region are all dimension-sized at any SF → all
    three joins broadcast; partial aggregation reduces the shuffle to
    ~25 nations × salt rows per partition. Revenue sums in integer
    cents, two-level (25 nation groups grow unboundedly with SF — see
    the cents module comment)."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    g = sum_cents_2level(
        joined, ["n_name"], {"_rev": disc_price_cents()}, [], salt_on="l_extendedprice"
    )
    return g.select("n_name", unscale("_rev", 4).alias("revenue"))



def join_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join showcase: part is the dim side (hinted); the
    fact side never shuffles for the join, only for the tiny final
    brand rollup. Revenue sums in integer cents, two-level (25 brand
    groups grow unboundedly with SF — see the cents module comment)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    g = sum_cents_2level(
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey),
        ["p_brand"],
        {"_rev": disc_price_cents()},
        ["n_items"],
        salt_on="l_extendedprice",
    )
    return g.select("p_brand", unscale("_rev", 4).alias("revenue"), "n_items")



