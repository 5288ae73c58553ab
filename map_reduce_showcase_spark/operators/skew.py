"""Skew mitigation: salting patterns for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) handles most
runtime skew; these explicit patterns cover the cases AQE can't —
skewed *aggregation* keys, and broadcast-ineligible joins where one
key dominates. The reference has no answer to skew at all: its unit
of work is a whole file, so its biggest file IS its straggler
(SURVEY.md §4.2).

* :func:`salted_count_by_key` — two-stage aggregation: salt the key
  into ``n_salts`` sub-keys, partial-aggregate per (key, salt),
  then merge per key. The hot key's work spreads over ``n_salts``
  tasks; the second stage touches ``n_salts`` rows per key, not the
  raw rows.
* :func:`salted_join` — replicate the small side ``n_salts`` times
  (one copy per salt), salt the big side deterministically from its
  row content, join on (key, salt). The hot key's probe rows land
  in ``n_salts`` different partitions.

Both salts derive from ``xxhash64`` of row content — deterministic
re-runs, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salts: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_count_by_key(
    df: DataFrame, key_col: str, salt_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-stage skew-safe count: (key, cnt) identical to
    ``groupBy(key).count()`` but no single task ever owns a hot key."""
    stage1 = (
        df.withColumn("_salt", _salt(salt_cols, n_salts))
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return stage1.groupBy(key_col).agg(F.sum("_partial").alias("cnt"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join equivalent to ``big.join(small, key)`` with
    the big side's hot keys spread across ``n_salts`` partitions.
    The small side is replicated ``n_salts``× — keep it genuinely
    small (or this degrades into a broadcast join, which you should
    use instead when possible)."""
    big_salted = big.withColumn("_salt", _salt(salt_cols, n_salts))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")
