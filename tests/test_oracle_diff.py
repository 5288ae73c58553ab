"""Differential suite: every registered query's Spark result must
EXACTLY equal its DuckDB oracle (column names, row count, values) —
a strictly stronger local version of the driver's order-insensitive
value-hash gate, so passing here implies passing there.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from map_reduce_showcase_spark.plans import REGISTRY
from map_reduce_showcase_spark.plans.registry import _load_all

_load_all()

SQL_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by a type-stable repr key (both
    engines produce identical values → identical keys → identical
    order), so positional comparison is order-insensitive."""
    df = df[sorted(df.columns)].copy()
    if len(df):
        keys = pd.DataFrame(
            {c: df[c].map(lambda v: repr(_coerce(v))) for c in df.columns}
        )
        order = keys.sort_values(by=list(keys.columns), kind="mergesort").index
        df = df.loc[order]
    return df.reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is b:
        return True
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    spec = REGISTRY[name]
    got = _normalize(spec.builder(spark, sf_dir).toPandas())
    want = _normalize(oracle.execute(spec.oracle).fetchdf())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} oracle={len(want)}"
    # vacuity guard: a 0-row result hash-matches its oracle trivially
    # — the schema is proven but the query's logic never executed on
    # a row (q8/q9/q11/q20 sat "green" like this for four rounds).
    # Queries that may legitimately be empty at small SF must say so
    # with an explicit may_be_empty tag.
    if "may_be_empty" not in spec.tags:
        assert len(got) > 0, (
            f"{name}: 0 rows at this SF — vacuously green; fix the slice "
            f"or tag the spec may_be_empty"
        )
    for col in got.columns:
        gk, wk = got[col].dtype.kind, want[col].dtype.kind
        # int-vs-float dtype crossings hash differently in the
        # driver (repr '2328' != '2328.0') even when values compare
        # equal — e.g. DuckDB returns SUM(BIGINT) as HUGEINT→float64
        assert not ("f" in (gk, wk) and {gk, wk} & {"i", "u"}), (
            f"{name}.{col}: int/float dtype crossing spark={got[col].dtype} oracle={want[col].dtype}"
        )
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(gv, wv))
            if not _values_equal(_coerce(a), _coerce(b))
        ]
        assert not bad, f"{name}.{col}: first diffs {bad[:5]}"


def _coerce(v):
    """Fold engine-representation differences that the driver's hash
    also folds (numpy scalars → python, Decimal → float)."""
    import decimal

    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime().replace(tzinfo=None)
    return v


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    """Non-SQL-expressible queries must at least run and return a
    stable schema — and rows, unless tagged may_be_empty (the same
    vacuity guard the oracle-checked side gets)."""
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert df.columns, name
    n = df.count()
    if "may_be_empty" not in spec.tags:
        assert n > 0, f"{name}: 0 rows — vacuous; fix the slice or tag may_be_empty"


def test_unverified_queries_export_inside_driver_window():
    """The driver's CORRECTNESS artifact records only the first ~50
    queries() entries. Every query with no green driver verdict from
    ANY past round (new or changed since) must therefore export
    inside the first 50 slots; the truncation tail may contain ONLY
    queries some round's artifact already proved."""
    import json
    import pathlib

    from map_reduce_showcase_spark.plans.registry import query_map

    repo = pathlib.Path(__file__).resolve().parent.parent
    green: set[str] = set()
    for art in sorted(repo.glob("CORRECTNESS_r*.json")):
        for n, e in json.loads(art.read_text()).items():
            if e.get("rows_match") and e.get("schema_match") and e.get("hash_match"):
                green.add(n)
    # (pivot_event_types_daily regressed in round 2 while hidden in
    # the tail; its fix got fresh green evidence in CORRECTNESS_r03,
    # so it may ride the tail again like any other proven query)
    order = list(query_map())
    tail = order[50:]
    not_proven = [n for n in tail if n not in green]
    assert not not_proven, f"unverified queries stuck in truncation tail: {not_proven}"


def test_export_order_is_evidence_priority():
    """The computed export order must be: sentinels, then every
    never-driver-green query, then the re-verify band (definition
    changed since the last green — the old artifact certifies
    different code), then proven queries with latest-green round
    non-decreasing (stalest evidence re-verifies first)."""
    from map_reduce_showcase_spark.plans.registry import (
        _REVERIFY,
        _SENTINELS,
        _latest_green_round,
        query_map,
    )

    order = list(query_map())
    green = _latest_green_round()
    assert tuple(order[: len(_SENTINELS)]) == _SENTINELS

    rest = order[len(_SENTINELS) :]
    # band rank per name: 1 never-green, 2 re-verify, 3 proven
    def band(n):
        if n not in green:
            return 1
        return 2 if n in _REVERIFY else 3

    bands = [band(n) for n in rest]
    assert bands == sorted(bands), "band order must be never-green, re-verify, proven"
    rounds = [green[n] for n, b in zip(rest, bands) if b == 3]
    assert rounds == sorted(rounds), "proven queries must be stalest-first"
    # re-verify names must actually sit inside the driver's ~50 window
    in_reverify = [n for n in order[:50] if n in _REVERIFY]
    assert set(in_reverify) == set(_REVERIFY) & set(order), (
        "every re-verify query must export inside the 50-entry window"
    )
