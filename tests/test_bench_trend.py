"""Unit tests for the mechanical band adjudicator
(``tools/bench_trend.py``) and its band constants. Pure dict-in /
dict-out — no SparkSession. The COMMITTED artifacts double as fixtures
so the driver-tail extraction is pinned against the real capture
formats (r05 single-line record, r13 truncated head, r14 local full
record)."""

import importlib.util
import json
import pathlib
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent
_TOOLS = _REPO / "tools"


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_trend", _TOOLS / "bench_trend.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench_trend", mod)
    spec.loader.exec_module(mod)
    return mod


def _driver_artifact(tmp_path, tail: str, n: int = 99) -> pathlib.Path:
    p = tmp_path / f"BENCH_r{n}.json"
    p.write_text(json.dumps({"n": n, "rc": 0, "cpus": 32, "sf": 0.1,
                             "tail": tail}))
    return p


# --- extraction -------------------------------------------------------

def test_extracts_last_parseable_json_line_from_driver_tail(tmp_path):
    bt = _load()
    full = json.dumps({"value": 11.0, "queries": {}, "extra": "diag"})
    compact = json.dumps({"value": 11.1, "queries": {}})
    tail = f"WARN noise\n{full}\n{compact}\n"
    got = bt.extract_record(_driver_artifact(tmp_path, tail))
    assert got["kind"] == "driver"
    assert got["record"]["value"] == 11.1  # LAST line wins (compact)


def test_truncated_tail_reports_unrecoverable(tmp_path):
    bt = _load()
    # r13 failure mode: the head (including "value") fell out of the
    # capture window, leaving a line that is not a whole JSON object.
    tail = '"q5": 1.43, "join_brand_revenue": 1.445}\n'
    got = bt.extract_record(_driver_artifact(tmp_path, tail))
    assert got["record"] is None
    assert "no parseable" in got["reason"]


def test_committed_r13_artifact_is_unparseable_and_r05_parses():
    bt = _load()
    r13 = bt.extract_record(_REPO / "BENCH_r13.json")
    assert r13["record"] is None  # the defect the compact line fixed
    r05 = bt.extract_record(_REPO / "BENCH_r05.json")
    assert r05["record"]["value"] == 14.94


def test_committed_local_r14_grades_fully_in_band():
    bt = _load()
    g = bt.grade(bt.extract_record(_REPO / "BENCH_LOCAL_r14.json"))
    assert g["headline"]["grade"] == "in_band"
    assert g["headline"]["era"] == "min_of_3"
    grades = {e["grade"] for e in g["extended"].values()}
    assert grades == {"in_band"}


# --- era dispatch -----------------------------------------------------

def test_single_run_era_grades_against_its_own_band():
    bt = _load()
    lo, hi = bt.SINGLE_RUN_ERA_BAND_SEC
    g = bt._grade_headline({"value": (lo + hi) / 2})  # no runs_per_query
    assert g["era"] == "single_run" and g["grade"] == "in_band"
    g2 = bt._grade_headline({"value": (lo + hi) / 2, "runs_per_query": 3})
    assert g2["era"] == "min_of_3"  # same total reads differently


# --- adjudication of out-of-band readings -----------------------------

def test_above_band_on_stamped_loaded_box_is_load_suspect():
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.2, "runs_per_query": 3,
           "load_1m_at_start": 5.0, "box_load_ok": False}
    g = bt._grade_headline(rec)
    assert g["grade"] == "above_band"
    assert g["adjudication"] == "load_suspect"


def test_above_band_with_draining_5m_average_is_load_suspect():
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.1, "runs_per_query": 3,
           "load_1m_at_start": 0.1, "box_load_ok": True,
           "loadavg_final": [0.2, 4.5, 3.0]}
    assert bt._grade_headline(rec)["adjudication"] == "load_suspect"


def test_above_band_on_idle_box_is_investigate():
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.3, "runs_per_query": 3,
           "load_1m_at_start": 0.1, "box_load_ok": True,
           "loadavg_final": [0.2, 0.3, 0.4]}
    assert bt._grade_headline(rec)["adjudication"] == "investigate"


def test_legacy_record_without_any_load_stamps_is_unadjudicable():
    bt = _load()
    rec = {"value": bt.SINGLE_RUN_ERA_BAND_SEC[1] * 1.2}
    g = bt._grade_headline(rec)
    assert g["adjudication"] == "unadjudicable_no_load_stamps"


def test_r11_style_per_query_stamps_adjudicate_the_headline():
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.05, "runs_per_query": 3,
           "loadavg_final": [0.2, 0.3, 0.4],
           "load_1m_per_query": {"wc_word_count": [4.34, 4.47]}}
    g = bt._grade_headline(rec)
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["first_query_load_before"] == 4.34


def test_extended_riser_with_loaded_before_sample_is_load_suspect():
    bt = _load()
    q = "graph_pagerank"
    hi = bt.EXTENDED_OBSERVED_RANGES_SEC[q][1]
    rec = {"extended_queries": {q: hi * 1.3},
           "extended_load_1m_per_query": {q: [6.4, 7.0]}}
    g = bt._grade_extended(rec)[q]
    assert g["grade"] == "above_band"
    assert g["adjudication"] == "load_suspect"


def test_extended_riser_on_idle_box_is_investigate():
    bt = _load()
    q = "graph_triangle_summary"
    hi = bt.EXTENDED_OBSERVED_RANGES_SEC[q][1]
    rec = {"extended_queries": {q: hi * 1.3},
           "extended_load_1m_per_query": {q: [0.3, 1.1]}}
    assert bt._grade_extended(rec)[q]["adjudication"] == "investigate"


def test_below_band_is_never_an_investigate_flag():
    bt = _load()
    lo = bt.ANCHOR_BAND_MIN_OF_3_SEC[0]
    g = bt._grade_headline({"value": lo * 0.8, "runs_per_query": 3})
    assert g["grade"] == "below_band"
    assert "adjudication" not in g


# --- single source of truth -------------------------------------------

def test_extended_range_keys_match_bench_extended_list():
    """The graded set and the measured set must be the same queries."""
    import bench
    bt = _load()
    assert set(bt.EXTENDED_OBSERVED_RANGES_SEC) == set(bench.EXTENDED)


def test_bench_stamps_the_constant_band():
    """bench.py's stamped min_of_3_fresh_jvm_spread_sec is the same
    object the trend tool grades against (bench_constants is the
    single source)."""
    import bench
    from bench_constants import ANCHOR_BAND_MIN_OF_3_SEC
    assert bench.ANCHOR_BAND_MIN_OF_3_SEC == ANCHOR_BAND_MIN_OF_3_SEC
    src = (_REPO / "bench.py").read_text()
    assert "list(ANCHOR_BAND_MIN_OF_3_SEC)" in src


def test_band_edges_hold_every_committed_min_of_3_local_artifact():
    """Maintenance invariant: the committed local records (idle-box by
    protocol) must sit inside the anchor band — a local artifact
    landing outside means the band doc went stale without provenance."""
    bt = _load()
    lo, hi = bt.ANCHOR_BAND_MIN_OF_3_SEC
    for p in sorted(_REPO.glob("BENCH_LOCAL_r*.json")):
        rec = json.loads(p.read_text())
        assert lo <= rec["value"] <= hi, (p.name, rec["value"])
