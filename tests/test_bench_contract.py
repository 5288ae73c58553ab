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


def _run(
    bench,
    capsys,
    monkeypatch,
    headline,
    sf="/root/testdata/sf0.001",
    reps="2",
    extended=(),
):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPS", reps)
    # pytest itself drives the 1m loadavg well past the idle
    # threshold — with the default 600 s cap every contract test
    # would stall waiting for a load the suite is causing
    monkeypatch.setenv("SPARK_GRAFT_BENCH_IDLE_WAIT_CAP_SEC", "0")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_SET", raising=False)
    monkeypatch.setattr(bench, "HEADLINE", headline)
    monkeypatch.setattr(bench, "EXTENDED", list(extended))
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
    # bounded wait-for-idle record (r12 verdict #2): the artifact is
    # self-describing about how long it waited and what the load did;
    # with the test's 0 s cap it must have taken exactly one sample
    # and never slept
    iw = art["idle_wait"]
    assert iw["cap_sec"] == 0.0 and iw["waited_sec"] == 0.0
    assert len(iw["load_trajectory_1m"]) == 1
    assert art["load_1m_at_start"] == iw["load_trajectory_1m"][-1]
    # extended section present (empty here — _run pins EXTENDED=[])
    # and excluded from the anchor semantics by construction
    assert art["extended_queries"] == {}
    assert "excluded" in art["extended_note"]
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


def test_bench_extended_section_measured_but_not_in_anchor(
    bench, capsys, monkeypatch, spark
):
    """r12 verdict #4: extended queries run on the same min-of-N
    protocol but live outside the anchor — the total must be the
    HEADLINE sum only, with the extended timing stamped separately."""
    art = _run(
        bench, capsys, monkeypatch, ["topk_orders"], extended=["grep_docs"]
    )
    assert set(art["extended_queries"]) == {"grep_docs"}
    assert art["extended_queries"]["grep_docs"] > 0
    assert "extended_errors" not in art
    # anchor total is headline-only
    assert art["value"] == pytest.approx(
        round(sum(art["queries"].values()), 3), abs=1e-6
    )
    assert set(art["queries"]) == {"topk_orders"}
    # headline load samples stay headline-shaped (the r10 assertion)
    assert set(art["load_1m_per_query"]) == {"topk_orders"}
    json.dumps(art, allow_nan=False)


def test_bench_extended_failure_never_nulls_anchor_total(
    bench, capsys, monkeypatch, spark
):
    """An extended-section failure is recorded but must NOT null the
    headline total — only headline errors make cross-round totals
    compare unlike sets."""
    art = _run(
        bench, capsys, monkeypatch, ["topk_orders"], extended=["no_such_query"]
    )
    assert art["value"] is not None and art["value"] > 0
    assert "errors" not in art
    assert "KeyError" in art["extended_errors"]["no_such_query"]
    assert art["extended_queries"] == {}
    json.dumps(art, allow_nan=False)


def test_bench_wait_for_idle_paths(bench):
    """The wait loop's three behaviors, driven through injected
    sample/sleep so the test never touches the real clock: (a) an
    already-idle box takes one sample and never sleeps; (b) a loaded
    box that decays is waited out, trajectory recording the decay;
    (c) a box that never idles burns exactly the cap and stops."""
    # (a) idle immediately
    sleeps: list[float] = []
    traj, waited = bench.wait_for_idle(
        600.0, sample=lambda: 0.5, sleep=sleeps.append
    )
    assert traj == [0.5] and waited == 0.0 and sleeps == []

    # (b) decays: 10.4 -> 4.0 -> 1.2 (under the 2.0 threshold)
    readings = iter([10.4, 4.0, 1.2])
    sleeps = []
    traj, waited = bench.wait_for_idle(
        600.0, poll_sec=30.0, sample=lambda: next(readings), sleep=sleeps.append
    )
    assert traj == [10.4, 4.0, 1.2]
    assert waited == 60.0 and sleeps == [30.0, 30.0]

    # (c) never idles: stops at the cap, last step truncated to fit
    sleeps = []
    traj, waited = bench.wait_for_idle(
        70.0, poll_sec=30.0, sample=lambda: 9.9, sleep=sleeps.append
    )
    assert waited == 70.0 and sleeps == [30.0, 30.0, 10.0]
    assert traj == [9.9, 9.9, 9.9, 9.9]

    # boundary: adjudication uses the rounded sample, so a reading
    # that ROUNDS to the threshold keeps waiting (box_load_ok would
    # be false for it)
    readings = iter([2.004, 1.99])
    traj, waited = bench.wait_for_idle(
        600.0, sample=lambda: next(readings), sleep=lambda s: None
    )
    assert traj == [2.0, 1.99]


def test_bench_non_numeric_reps_falls_back(bench, capsys, monkeypatch, spark):
    """ADVICE r10: a malformed SPARK_GRAFT_BENCH_REPS aborted before
    any JSON printed — the exact broken-artifact mode the reps clamp
    exists to prevent; it must fall back to the default instead."""
    art = _run(bench, capsys, monkeypatch, ["topk_orders"], reps="three")
    assert art["runs_per_query"] == 3
    assert art["value"] is not None and art["value"] > 0
    json.dumps(art, allow_nan=False)
