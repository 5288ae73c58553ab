"""Driver-harness simulation per .claude/skills/verify/SKILL.md."""
import decimal
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def coerce(v):
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime().replace(tzinfo=None)
    return v


def value_hash(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(repr(coerce(v)) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return hash(tuple(rows))


# 1. entry smoke
r = E.entry(spark).collect()
assert len(r) > 0, "entry() returned no rows"
print(f"entry OK: {len(r)} rows")

# 2. per-query differential
queries = E.queries()
oracles = E.oracle_sql()
fails = []
t0 = time.time()
for i, (name, fn) in enumerate(queries.items()):
    try:
        got = fn(spark, SF).toPandas()
    except Exception as exc:
        fails.append((name, f"spark err {type(exc).__name__}: {exc}"))
        continue
    if name not in oracles:
        print(f"{i:3d} {name}: rows-only {len(got)}")
        continue
    try:
        want = con.execute(oracles[name]).fetchdf()
    except Exception as exc:
        fails.append((name, f"oracle err {type(exc).__name__}: {exc}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rowcount {len(got)} vs {len(want)}"))
    elif sorted(got.columns) != sorted(want.columns):
        fails.append((name, f"cols {sorted(got.columns)} vs {sorted(want.columns)}"))
    elif value_hash(got) != value_hash(want):
        fails.append((name, "value hash mismatch"))

print(f"\n{len(queries)} queries in {time.time()-t0:.0f}s; {len(fails)} failures")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
