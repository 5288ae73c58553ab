"""Driver-harness simulation per .claude/skills/verify/SKILL.md.

With ``--artifact PATH`` it also writes a CORRECTNESS-shaped JSON
(per-query rows/schema/hash match) covering ALL registered queries —
the local-evidence twin of the driver's ~50-entry artifact, for the
queries the capped window can't reach in a given round.
"""
import argparse
import decimal
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E
from map_reduce_showcase_spark.plans import REGISTRY
from map_reduce_showcase_spark.plans.registry import _load_all

_load_all()

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


ap = argparse.ArgumentParser()
ap.add_argument("--artifact", default=None, help="write per-query JSON here")
args = ap.parse_args()

# 1. entry smoke
r = E.entry(spark).collect()
assert len(r) > 0, "entry() returned no rows"
print(f"entry OK: {len(r)} rows")

# 2. per-query differential
queries = E.queries()
oracles = E.oracle_sql()
fails = []
records: dict[str, dict] = {}
t0 = time.time()
for i, (name, fn) in enumerate(queries.items()):
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "status": "checked",
        "err": None,
    }
    records[name] = rec
    try:
        got = fn(spark, SF).toPandas()
    except Exception as exc:
        rec["err"] = f"spark err {type(exc).__name__}: {exc}"[:300]
        fails.append((name, rec["err"]))
        continue
    rec["spark_rows"] = len(got)
    # vacuity gate: a 0-row frame hash-matches trivially (schema
    # proven, logic never executed on a row) — q8/q9/q11/q20 sat
    # green through four rounds this way. Queries whose emptiness
    # is semantically legitimate must carry the may_be_empty tag.
    tags = REGISTRY[name].tags if name in REGISTRY else ()
    if len(got) == 0 and "may_be_empty" not in tags:
        rec["err"] = "vacuous: 0 rows without may_be_empty tag"
        fails.append((name, rec["err"]))
        continue
    if name not in oracles:
        rec["status"] = "rows_only"
        print(f"{i:3d} {name}: rows-only {len(got)}")
        continue
    try:
        want = con.execute(oracles[name]).fetchdf()
    except Exception as exc:
        rec["err"] = f"oracle err {type(exc).__name__}: {exc}"[:300]
        fails.append((name, rec["err"]))
        continue
    rec["oracle_rows"] = len(want)
    rec["rows_match"] = len(got) == len(want)
    rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
    if rec["rows_match"] and rec["schema_match"]:
        rec["hash_match"] = value_hash(got) == value_hash(want)
    if not rec["rows_match"]:
        fails.append((name, f"rowcount {len(got)} vs {len(want)}"))
    elif not rec["schema_match"]:
        fails.append((name, f"cols {sorted(got.columns)} vs {sorted(want.columns)}"))
    elif not rec["hash_match"]:
        fails.append((name, "value hash mismatch"))

print(f"\n{len(queries)} queries in {time.time()-t0:.0f}s; {len(fails)} failures")
for name, why in fails:
    print(f"FAIL {name}: {why}")
if args.artifact:
    with open(args.artifact, "w") as fh:
        json.dump(records, fh, indent=1, sort_keys=False)
    print(f"wrote {args.artifact} ({len(records)} entries)")
sys.exit(1 if fails else 0)
