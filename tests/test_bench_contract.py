"""Contract tests for ``bench.py`` — the driver-graded benchmark
surface.

The driver runs ``python bench.py`` each round and records the one
JSON line as ``BENCH_r{N}.json``; until round 10 nothing in the test
suite exercised that path, so a harness regression (e.g. the reps=0
clamp gap that emitted the non-RFC ``Infinity`` token) could only
surface in the driver's own run — after the round's code was frozen.
These tests pin the artifact contract on a tiny headline set at
sf0.001: one parseable JSON line, the min-of-N protocol stamped,
failure isolation (a broken query nulls the total but never the
artifact), and the reps clamp."""

import importlib.util
import json
import pathlib
import sys

import pytest

_REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench", _REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench", None)


def _run(bench, capsys, monkeypatch, headline, sf="/root/testdata/sf0.001", reps="2"):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", reps)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_SET", raising=False)
    monkeypatch.setattr(bench, "HEADLINE", headline)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    # the contract: the LAST stdout line is the one JSON artifact line
    return json.loads(out[-1])


def test_bench_artifact_contract_clean_run(bench, capsys, monkeypatch, spark):
    art = _run(bench, capsys, monkeypatch, ["topk_orders", "grep_docs"])
    assert art["metric"] == "headline_queries_total_sec"
    assert art["unit"] == "sec"
    assert art["runs_per_query"] == 2
    assert "min of 2 same-JVM runs" in art["protocol"]
    assert art["n_measured"] == art["n_expected"] == 2
    assert set(art["queries"]) == {"topk_orders", "grep_docs"}
    assert "errors" not in art
    # total is the sum of per-query minimums, rounded like the field
    assert art["value"] == pytest.approx(
        round(sum(art["queries"].values()), 3), abs=1e-6
    )
    assert art["sf"] == 0.001
    # box-load self-adjudication (round-10 verdict #4): per-query
    # [before, after] 1-minute loadavg samples + the final triple
    assert set(art["load_1m_per_query"]) == set(art["queries"])
    for pair in art["load_1m_per_query"].values():
        assert len(pair) == 2 and all(v >= 0 for v in pair)
    assert len(art["loadavg_final"]) == 3
    # the SINGLE adjudicated field (r11 verdict #4 — the raw samples
    # above still needed hand-interpretation): ok iff the 1m load
    # BEFORE any Spark work was under the stamped threshold. The
    # value itself is box state, so pin derivation, not the boolean.
    assert art["box_load_threshold_1m"] == bench.BOX_LOAD_THRESHOLD_1M
    assert art["load_1m_at_start"] >= 0
    assert art["box_load_ok"] == (
        art["load_1m_at_start"] < art["box_load_threshold_1m"]
    )
    # every timing is finite and JSON-round-trippable (the reps=0
    # regression emitted Infinity here)
    json.dumps(art, allow_nan=False)


def test_bench_failure_isolation_nulls_total_not_artifact(
    bench, capsys, monkeypatch, spark
):
    """One broken query must never destroy the artifact (the round-2
    lesson baked into bench.py): its error is recorded, the healthy
    query's timing survives, and the TOTAL is null — a partial sum
    would compare unlike sets across rounds."""
    art = _run(bench, capsys, monkeypatch, ["topk_orders", "no_such_query"])
    assert art["value"] is None
    assert art["n_measured"] == 1 and art["n_expected"] == 2
    assert "topk_orders" in art["queries"]
    assert "no_such_query" in art["errors"]
    assert "KeyError" in art["errors"]["no_such_query"]
    # load samples cover FAILED queries too (the load context of a
    # failure is exactly when you want the sample)
    assert set(art["load_1m_per_query"]) == {"topk_orders", "no_such_query"}
    json.dumps(art, allow_nan=False)


def test_bench_reps_clamped_to_at_least_one(bench, capsys, monkeypatch, spark):
    art = _run(bench, capsys, monkeypatch, ["topk_orders"], reps="0")
    assert art["runs_per_query"] == 1
    assert art["value"] is not None and art["value"] > 0
    json.dumps(art, allow_nan=False)


def test_bench_non_numeric_reps_falls_back(bench, capsys, monkeypatch, spark):
    """ADVICE r10: a malformed SPARK_GRAFT_BENCH_REPS aborted before
    any JSON printed — the exact broken-artifact mode the reps clamp
    exists to prevent; it must fall back to the default instead."""
    art = _run(bench, capsys, monkeypatch, ["topk_orders"], reps="three")
    assert art["runs_per_query"] == 3
    assert art["value"] is not None and art["value"] > 0
    json.dumps(art, allow_nan=False)
