"""Driver-harness simulation per .claude/skills/verify/SKILL.md.

With ``--artifact PATH`` it also writes a CORRECTNESS-shaped JSON
(per-query rows/schema/hash match) covering ALL registered queries —
the local-evidence twin of the driver's ~50-entry artifact, for the
queries the capped window can't reach in a given round. Each entry
additionally carries the query's definition ``fingerprint`` (builder
source + oracle SQL hash), which is what lets the registry compute
the changed-since-green re-verify band instead of hand-maintaining
it (``plans/registry.py::changed_since_green``).

Importable: the per-query comparison lives in :func:`check_query`
so the harness's record encoding is unit-testable (rows-only and
errored entries must carry ``None`` match fields like the driver's
artifact does, NOT ``False`` — a consumer filtering on
``rows_match == False`` must see only real comparison failures).
"""
import argparse
import decimal
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from bench_constants import HEADLINE

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


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


def _check_eviction_census(df: pd.DataFrame, con=None):
    """Pinned expectation for ``streaming_sessions_timeout_eviction``
    (r9 verdict #5): the replay fixture is deterministic, so the
    rows-only record can assert the census SHAPE instead of logging a
    bare count — 2 rows (one running, one final), both groups
    populated, and the evicted-user census bounded by the running
    one (every evicted user emitted at least one non-final update
    before its timeout fired). Returns a failure reason or None.

    Since round 12 the pin is also VALUE-anchored cross-entry (r11
    verdict #2): the RUNNING census's ``n_users`` must equal DuckDB's
    ``COUNT(DISTINCT user_id)`` over events — which is exactly the
    row count the oracle-green twin ``streaming_eviction_final_state``
    proves (its oracle is ``GROUP BY user_id``), so this ties the
    rows-only entry to the twin through an independent engine. The
    verdict phrased the equality over the FINAL census, but that
    cannot hold by construction: the census replay deliberately has
    NO flush sentinels (that is the twin's addition), so users whose
    last events sit within ``gap`` of the replay's max ts end the
    stream un-evicted — at r10's sf0.01 that was 146 final vs 150
    running users. Every user DOES emit at least one non-final update
    in the batch its events arrive (``streaming/stateful.py:147`` —
    the data path always yields an ``is_final=False`` row), so the
    running census is the batch-invariant side of the equality; the
    final census stays bounded by it (asserted above)."""
    if len(df) != 2:
        return f"eviction census expected exactly 2 rows, got {len(df)}"
    by_final = {bool(r.is_final): r for r in df.itertuples(index=False)}
    if set(by_final) != {True, False}:
        return f"expected one running + one final group, got {sorted(set(by_final))}"
    for flag, r in by_final.items():
        if not (r.n_rows >= r.n_users >= 1):
            return (
                f"is_final={flag}: expected n_rows >= n_users >= 1, "
                f"got n_rows={r.n_rows} n_users={r.n_users}"
            )
    if by_final[True].n_users > by_final[False].n_users:
        return (
            f"more evicted users ({by_final[True].n_users}) than users "
            f"with running updates ({by_final[False].n_users})"
        )
    if con is not None:
        n_distinct = con.execute(
            "SELECT COUNT(DISTINCT user_id) FROM events"
        ).fetchone()[0]
        if by_final[False].n_users != n_distinct:
            return (
                f"running census n_users={by_final[False].n_users} != "
                f"COUNT(DISTINCT user_id)={n_distinct} (the twin "
                f"streaming_eviction_final_state's proven row count)"
            )
    return None


#: rows-only queries with a deterministic fixture get a PINNED shape
#: assertion instead of a bare row count — the driver window's one
#: non-check becomes a real check without needing a SQL oracle. The
#: pins describe the DEFAULT-SF fixture only and are skipped at other
#: ``--sf-dir``s: the eviction census is documented as 1-2 rows in
#: general (a dataset whose final watermark never passes any timeout
#: legitimately emits no final row), so applying the 2-row pin in the
#: sf0.1 re-validation mode could poison a healthy run with a false
#: failure.
PINNED_ROWS_ONLY = {
    "streaming_sessions_timeout_eviction": _check_eviction_census,
}


def check_query(name, fn, oracle_sql, tags, spark, con, sf=SF):
    """Run one registered query against its oracle and return the
    artifact record. Match fields start as ``None`` ("not
    evaluated") and only become booleans when the corresponding
    comparison actually ran — mirroring the driver's encoding, so
    rows-only and errored entries can't be misread as triple
    failures. Returns (record, failure_reason_or_None)."""
    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "status": "checked",
        "err": None,
    }
    try:
        got = fn(spark, sf).toPandas()
    except Exception as exc:
        rec["err"] = f"spark err {type(exc).__name__}: {exc}"[:300]
        return rec, rec["err"]
    rec["spark_rows"] = len(got)
    # vacuity gate: a 0-row frame hash-matches trivially (schema
    # proven, logic never executed on a row) — q8/q9/q11/q20 sat
    # green through four rounds this way. Queries whose emptiness
    # is semantically legitimate must carry the may_be_empty tag.
    if len(got) == 0 and "may_be_empty" not in tags:
        rec["err"] = "vacuous: 0 rows without may_be_empty tag"
        return rec, rec["err"]
    if oracle_sql is None:
        # realpath-normalized: `--sf-dir /root/testdata/sf0.01/` (or
        # any path alias of the default SF) must still apply the pin —
        # exact string equality silently downgraded the round's one
        # real rows-only check to a bare count (ADVICE r10)
        at_default_sf = os.path.realpath(sf) == os.path.realpath(SF)
        pinned = PINNED_ROWS_ONLY.get(name) if at_default_sf else None
        if name in PINNED_ROWS_ONLY and not at_default_sf:
            print(
                f"note: {name} has a PINNED_ROWS_ONLY checker but runs "
                f"unpinned at non-default sf {sf!r}",
                file=sys.stderr,
            )
        if pinned is None:
            rec["status"] = "rows_only"
            return rec, None
        # failure-isolated like every other comparison: a checker
        # crash (e.g. the query's schema changed under it) must fail
        # THIS entry, not abort the whole 170-query artifact run
        try:
            why = pinned(got, con)
        except Exception as exc:  # noqa: BLE001
            why = f"checker raised {type(exc).__name__}: {exc}"[:250]
        rec["status"] = "rows_only_pinned"
        rec["pinned_ok"] = why is None
        if why is not None:
            rec["err"] = f"pinned expectation failed: {why}"[:300]
        return rec, rec["err"]
    try:
        want = con.execute(oracle_sql).fetchdf()
    except Exception as exc:
        rec["err"] = f"oracle err {type(exc).__name__}: {exc}"[:300]
        return rec, rec["err"]
    rec["oracle_rows"] = len(want)
    rec["rows_match"] = len(got) == len(want)
    rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
    if rec["rows_match"] and rec["schema_match"]:
        rec["hash_match"] = value_hash(got) == value_hash(want)
    if not rec["rows_match"]:
        return rec, f"rowcount {len(got)} vs {len(want)}"
    if not rec["schema_match"]:
        return rec, f"cols {sorted(got.columns)} vs {sorted(want.columns)}"
    if not rec["hash_match"]:
        return rec, "value hash mismatch"
    return rec, None


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from map_reduce_showcase_spark.plans import REGISTRY
    from map_reduce_showcase_spark.plans.registry import (
        _load_all,
        definition_fingerprint,
        helper_fingerprint,
    )

    _load_all()

    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=None, help="write per-query JSON here")
    ap.add_argument(
        "--sf-dir",
        default=SF,
        help="testdata directory for both Spark and the DuckDB views "
        "(default: the driver's sf0.01; use sf0.1 for a 10x-scale "
        "re-validation — slower, mostly on the DuckDB oracle side)",
    )
    ap.add_argument(
        "--driver-mem",
        default=None,
        help="spark.driver.memory override. Default None = the "
        "driver's own plain session (1g) — correct for sf0.01 "
        "parity. A 170-query run at --sf-dir sf0.1 starves a 1g "
        "heap partway through (measured round 9: the JVM died and "
        "every later query failed with ConnectionRefused); use 12g "
        "there.",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir

    builder = SparkSession.builder.master("local[8]").config(
        "spark.sql.session.timeZone", "UTC"
    )
    if args.driver_mem:
        builder = builder.config("spark.driver.memory", args.driver_mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

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
        spec = REGISTRY.get(name)
        rec, why = check_query(
            name, fn, oracles.get(name), spec.tags if spec else (), spark, con,
            sf=sf_dir,
        )
        if spec is not None:
            rec["fingerprint"] = definition_fingerprint(spec)
            # helper-module source hash (round 7 on): lets the
            # registry auto-promote queries whose builder is
            # untouched but whose imported helper was rewritten
            rec["helper_fingerprint"] = helper_fingerprint(spec)
            # anchor-set membership (ADVICE r16): recorded so the
            # NEXT round's freshness gate can see HEADLINE-list
            # changes (a rename/swap previously bypassed the
            # mandatory-ABBA gate via the new-query exemption)
            if name in HEADLINE:
                rec["headline"] = True
        records[name] = rec
        if why:
            fails.append((name, why))
        elif rec["status"] == "rows_only_pinned":
            print(
                f"{i:3d} {name}: rows-only {rec['spark_rows']} "
                f"(pinned shape OK)"
            )
        elif rec["status"] == "rows_only":
            print(f"{i:3d} {name}: rows-only {rec['spark_rows']}")

    print(f"\n{len(queries)} queries in {time.time()-t0:.0f}s; {len(fails)} failures")
    for name, why in fails:
        print(f"FAIL {name}: {why}")
    if args.artifact:
        with open(args.artifact, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=False)
        print(f"wrote {args.artifact} ({len(records)} entries)")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
