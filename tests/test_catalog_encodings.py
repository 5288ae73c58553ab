"""Pin the catalog loader against physical-encoding drift.

Between rounds the testdata generator changed ``events.ts`` from
parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and silently broke every
events query (VERDICT round 2). ``load_table`` now dispatches on the
dtype Spark actually loads; this suite writes a tiny events table in
every plausible physical encoding and asserts all of them come back as
the SAME timestamp rows — so the next regeneration cannot break the
catalog again.

Also: a fail-fast smoke check that every ``TABLE_NAMES`` entry loads
(runs early so a broken loader reads as one clear failure, not dozens
of downstream errors).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from map_reduce_showcase_spark.sources.tables import TABLE_NAMES, load_table

from .conftest import SF_DIR

#: Wall-clock instants (micro precision — all encodings can carry it).
_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 0),
    dt.datetime(2024, 1, 1, 0, 30, 15, 123456),
    dt.datetime(2024, 6, 30, 23, 59, 59, 999999),
]
_EPOCH = dt.datetime(1970, 1, 1)
_MICROS = [int((x - _EPOCH).total_seconds() * 1_000_000) for x in _TS]


def _write(tmp_path, name: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    path = str(tmp_path / name)
    (tmp_path / name).mkdir()
    pq.write_table(table, f"{path}/events.parquet")
    return path


_ENCODINGS = {
    "timestamp_micros": lambda: pa.array(_TS, pa.timestamp("us")),
    "timestamp_millis": lambda: pa.array(
        [x.replace(microsecond=x.microsecond // 1000 * 1000) for x in _TS],
        pa.timestamp("ms"),
    ),
    "timestamp_nanos": lambda: pa.array(_TS, pa.timestamp("ns")),
    "int64_nanos": lambda: pa.array([m * 1000 for m in _MICROS], pa.int64()),
    "int64_micros": lambda: pa.array(_MICROS, pa.int64()),
    "int64_millis": lambda: pa.array([m // 1000 for m in _MICROS], pa.int64()),
    "int64_seconds": lambda: pa.array([m // 1_000_000 for m in _MICROS], pa.int64()),
}

#: Encodings that carry full micro precision and must round-trip the
#: exact _TS instants. millis/seconds variants are checked against
#: their own truncation instead.
_EXACT = {"timestamp_micros", "timestamp_nanos", "int64_nanos", "int64_micros"}


@pytest.mark.parametrize("encoding", sorted(_ENCODINGS))
def test_events_ts_encoding_drift(spark, tmp_path, encoding):
    sf_dir = _write(tmp_path, encoding, _ENCODINGS[encoding]())
    df = load_table(spark, sf_dir, "events").orderBy("event_id")
    got = [r.ts.replace(tzinfo=None) if r.ts.tzinfo else r.ts for r in df.collect()]
    if encoding in _EXACT:
        want = _TS
    elif "millis" in encoding:
        want = [x.replace(microsecond=x.microsecond // 1000 * 1000) for x in _TS]
    else:  # seconds
        want = [x.replace(microsecond=0) for x in _TS]
    assert got == want, f"{encoding}: {got} != {want}"
    # dtype contract: downstream window/session/lag code needs a
    # timestamp column, never a raw long
    assert df.schema["ts"].dataType.typeName().startswith("timestamp")


def test_events_nanos_without_session_conf(spark, tmp_path):
    """TIMESTAMP(NANOS) must load even when the caller's session does
    NOT pre-set nanosAsLong (the driver builds its own session): the
    loader scopes the conf to the read and restores it after."""
    conf = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf, None)
    spark.conf.set(conf, "false")
    try:
        sf_dir = _write(tmp_path, "nanos_noconf", pa.array(_TS, pa.timestamp("ns")))
        df = load_table(spark, sf_dir, "events")
        got = sorted(
            r.ts.replace(tzinfo=None) if r.ts.tzinfo else r.ts for r in df.collect()
        )
        assert got == _TS
        assert spark.conf.get(conf) == "false", "conf not restored after scoped read"
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_catalog_smoke_all_tables(spark):
    """Every catalog table loads and yields rows from the real
    testdata — the canary that fires FIRST when testdata drifts."""
    for name in TABLE_NAMES:
        df = load_table(spark, SF_DIR, name)
        assert df.limit(1).count() == 1, f"table {name!r} empty or unreadable"
    ts_type = load_table(spark, SF_DIR, "events").schema["ts"].dataType.typeName()
    assert ts_type.startswith("timestamp"), ts_type
