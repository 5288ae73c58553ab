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

def test_extracts_fullest_json_record_from_driver_tail(tmp_path):
    bt = _load()
    full = json.dumps({"value": 11.0, "queries": {}, "extra": "diag"})
    compact = json.dumps({"value": 11.1, "queries": {}})
    tail = f"WARN noise\n{full}\n{compact}\n"
    got = bt.extract_record(_driver_artifact(tmp_path, tail))
    assert got["kind"] == "driver"
    # The FULLEST record wins — the diagnostic line carries strictly
    # more keys than the compact line derived from it.
    assert got["record"]["value"] == 11.0


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


def test_final_loadavg_never_masks_a_regression_as_load_suspect():
    """ADVICE r14 (the medium finding): ``loadavg_final`` is sampled
    at END of run, after minutes of the bench's own local[32] load —
    a genuine ~1.5-2x regression lengthens the run and pushes its OWN
    final 5m average past any fixed threshold, so the r14
    implementation's final-5m check stamped the regression
    load_suspect and --strict exited 0 (larger regressions
    self-masked more reliably). End-of-run signals must NOT
    adjudicate: a clean-START run with an elevated final 5m average
    is an 'investigate', never a silent load_suspect."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.6, "runs_per_query": 3,
           "load_1m_at_start": 0.1, "box_load_ok": True,
           "loadavg_final": [0.2, 4.5, 3.0]}  # the run's own self-load
    assert bt._grade_headline(rec)["adjudication"] == "investigate"


def test_unsettled_gate_run_is_load_suspect_from_compact_stamps():
    """r14 verdict #2 end-to-end: a run whose idle gate exhausted the
    cap (box idle on the 1m scale but still draining — the 13.78 s
    r14 case) stamps box_load_ok false + gate_criterion
    cap_exhausted, and an above-band total on it must grade
    load_suspect mechanically, with the gate stamps as evidence."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.25, "runs_per_query": 3,
           "load_1m_at_start": 1.58, "box_load_ok": False,
           "box_settled": False, "gate_criterion": "cap_exhausted"}
    g = bt._grade_headline(rec)
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["gate_criterion"] == "cap_exhausted"
    assert g["evidence"]["box_settled"] is False


def test_first_query_sample_is_ignored_for_fresh_order_records():
    """For records stamped extended_order: fresh_jvm_before_headline
    (the r15 ordering that was tried and reverted) the first headline
    query's pre-sample carried the decay of the bench's OWN extended
    child — not a start-side signal; such an above-band record with a
    hot first pre-sample but clean run-level stamps must reach
    'investigate'. The final fresh_jvm_after_headline ordering puts
    nothing before the headline, so the sample adjudicates again."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.4, "runs_per_query": 3,
           "box_load_ok": True, "load_1m_at_start": 0.1,
           "extended_order": "fresh_jvm_before_headline",
           "load_1m_per_query": {"wc_word_count": [3.1, 2.9]}}
    assert bt._grade_headline(rec)["adjudication"] == "investigate"
    # ...while a LEGACY record with the same shape still adjudicates
    # from the first pre-sample (the round-14 warm-up-arrival case)
    legacy = dict(rec)
    legacy.pop("extended_order")
    assert bt._grade_headline(legacy)["adjudication"] == "load_suspect"
    # ...and so does the final child-AFTER-headline ordering
    after = dict(rec, extended_order="fresh_jvm_after_headline")
    assert bt._grade_headline(after)["adjudication"] == "load_suspect"


def test_hypervisor_steal_adjudicates_above_band_as_load_suspect():
    """r15: host-denied cycles are invisible to every loadavg stamp
    (measured live: clean gate, start 0.2, headline 3.5x the band,
    32-core probe showed 8.2% capacity stolen). An above-band reading
    whose steal stamp crosses STEAL_SUSPECT_PCT is external load;
    below the threshold the clean-start default ('investigate')
    stands. Steal can't be self-caused by a regression — the host
    denies cycles, the guest only burns them — so thresholding it has
    no ADVICE-r14 self-masking mode."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    base = {"value": hi * 1.5, "runs_per_query": 3,
            "box_load_ok": True, "load_1m_at_start": 0.2,
            "extended_order": "fresh_jvm_before_headline"}
    stolen = dict(base, steal_pct=8.2)
    g = bt._grade_headline(stolen)
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["steal_pct_of_capacity"] == 8.2
    # diagnostic-line shape (nested cpu_steal) adjudicates the same
    nested = dict(base, cpu_steal={"steal_jiffies": 31318,
                                   "total_jiffies": 1574400,
                                   "steal_pct_of_capacity": 4.4})
    assert bt._grade_headline(nested)["adjudication"] == "load_suspect"
    # idle-host steal does NOT excuse an out-of-band reading
    clean = dict(base, steal_pct=0.1, steal_pct_demand=0.3)
    assert bt._grade_headline(clean)["adjudication"] == "investigate"
    # the DEMAND view catches what capacity dilutes (the r15 13.84 s
    # case: 1.66% of capacity — under threshold — but the denied
    # cycles were a much larger share of what the bursty bench
    # actually asked for)
    diluted = dict(base, steal_pct=1.66, steal_pct_demand=5.2)
    g3 = bt._grade_headline(diluted)
    assert g3["adjudication"] == "load_suspect"
    assert g3["evidence"]["steal_pct_of_demand"] == 5.2


def test_headline_window_steal_stamp_adjudicates_the_headline():
    """ADVICE r15 (medium): the run-level steal window spans the whole
    measured span, of which the headline loop is a minority — (a) a
    burst landing only in the extended/child sections must NOT excuse
    an above-band headline (clean headline window + dirty run-level
    stamp => investigate), and (b) a burst concentrated IN the
    headline must adjudicate even when the whole-span percentage was
    diluted under the thresholds (dirty headline window + clean
    run-level stamp => load_suspect). Records without the r16 headline
    stamp keep the run-level fallback."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    base = {"value": hi * 1.3, "runs_per_query": 3,
            "box_load_ok": True, "load_1m_at_start": 0.1,
            "extended_order": "fresh_jvm_after_headline"}
    # (b) diluted whole-span stamp, concentrated headline burst
    concentrated = dict(base, steal_pct=0.9, steal_pct_demand=1.2,
                        steal_pct_headline=1.1, steal_pct_demand_headline=6.3)
    g = bt._grade_headline(concentrated)
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["steal_pct_of_demand"] == 6.3
    # (a) clean headline window; the burst hit the extended sections
    elsewhere = dict(base, steal_pct=4.4, steal_pct_demand=9.0,
                     steal_pct_headline=0.2, steal_pct_demand_headline=0.9)
    assert bt._grade_headline(elsewhere)["adjudication"] == "investigate"
    # diagnostic-line shape (nested cpu_steal_headline) works the same
    nested = dict(base, steal_pct=0.5,
                  cpu_steal_headline={"steal_pct_of_capacity": 5.0,
                                      "steal_pct_of_demand": 12.0})
    assert bt._grade_headline(nested)["adjudication"] == "load_suspect"
    # no headline stamp (pre-r16 records): run-level stamps adjudicate
    legacy = dict(base, steal_pct=4.4)
    assert bt._grade_headline(legacy)["adjudication"] == "load_suspect"
    # degenerate all-None headline stamp (<=0-jiffy window) is a
    # MISSING stamp, not a clean one — run-level fallback applies
    degenerate = dict(base, steal_pct=4.4,
                      cpu_steal_headline={"steal_pct_of_capacity": None,
                                          "steal_pct_of_demand": None})
    assert bt._grade_headline(degenerate)["adjudication"] == "load_suspect"


def test_all_none_child_steal_stamp_falls_back_to_run_level():
    """ADVICE r15 (low): when the child stamp exists but both
    percentages are None (degenerate jiffy window), the old override
    became (None, None) and silently skipped the run-level fallback —
    the fresh section was graded with no steal signal at all. An
    all-None child stamp must be treated like a missing one."""
    bt = _load()
    q = "graph_pagerank"
    hi = bt.EXTENDED_FRESH_RANGES_SEC[q][1]
    rec = {"extended_order": "fresh_jvm_after_headline",
           "box_load_ok": True, "load_1m_at_start": 0.2,
           "steal_pct": 7.7,  # run-level window caught the denial
           "extended_queries": {q: hi * 1.3},
           "extended_fresh_cpu_steal": {"steal_pct_of_capacity": None,
                                        "steal_pct_of_demand": None}}
    g = bt._grade_extended(rec)[q]
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["steal_pct_of_capacity"] == 7.7


def test_fresh_extended_section_graded_by_child_steal_window():
    """The fresh child stamps its own steal window; the run-level
    percentage dilutes a contaminated child ~5x (the child is a
    fraction of the measured span). A fresh-section riser must be
    adjudicated from the CHILD's stamp: contaminated child =>
    load_suspect even when the run-level percentage stayed under
    threshold — and a clean child window keeps 'investigate' even
    when contention hit the rest of the run (the fresh numbers were
    measured before it arrived)."""
    bt = _load()
    q = "graph_pagerank"
    hi = bt.EXTENDED_FRESH_RANGES_SEC[q][1]
    base = {"extended_order": "fresh_jvm_before_headline",
            "box_load_ok": True, "load_1m_at_start": 0.2,
            "extended_queries": {q: hi * 1.3}}
    dirty_child = dict(base, steal_pct=0.9,
                       extended_fresh_cpu_steal={"steal_pct_of_capacity": 4.2})
    g = bt._grade_extended(dirty_child)[q]
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["steal_pct_of_capacity"] == 4.2
    clean_child = dict(base, steal_pct=2.65,
                       extended_fresh_cpu_steal={"steal_pct_of_capacity": 0.32})
    assert bt._grade_extended(clean_child)[q]["adjudication"] == "investigate"


def test_min_of_3_record_without_stamps_fails_strict(tmp_path):
    """ADVICE r14 (low): every r10+ record stamps loads, so a
    min-of-3-era above-band reading that LOST its stamps is a harness
    defect — --strict must fail, not silently pass."""
    bt = _load()
    rec = {"metric": "headline_queries_total_sec",
           "value": bt.ANCHOR_BAND_MIN_OF_3_SEC[1] * 1.3, "unit": "sec",
           "queries": {}, "runs_per_query": 3, "sf": 0.1,
           "extended_queries": {}}
    p = _driver_artifact(tmp_path, json.dumps(rec) + "\n", n=20)
    g = bt.grade(bt.extract_record(p))
    assert g["headline"]["adjudication"] == "unadjudicable_no_load_stamps"
    assert g["headline"]["strict_fail"] is True
    assert bt.main(["--artifact", str(p), "--strict"]) == 1
    assert bt.main(["--artifact", str(p)]) == 0  # report-only unchanged


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


def test_load_arriving_during_warmup_is_load_suspect():
    """Observed live in round 14: a run stamped start 0.02 and
    box_load_ok true, but external load arrived during the warm-up
    pass — the first MEASURED query's pre-sample read 2.43 and the
    total came in 1.17x its clean twin. The first headline pre-sample
    must adjudicate even when the run-level start stamp is present
    and clean."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.11, "runs_per_query": 3,
           "box_load_ok": True, "load_1m_at_start": 0.02,
           "loadavg_final": [8.59, 3.28, 2.34],
           "load_1m_per_query": {"wc_word_count": [2.43, 2.43],
                                 "grep_docs": [2.43, 2.43]}}
    g = bt._grade_headline(rec)
    assert g["grade"] == "above_band"
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["first_query_load_before"] == 2.43


def test_extended_riser_on_loaded_run_is_load_suspect():
    bt = _load()
    q = "graph_pagerank"
    hi = bt.EXTENDED_OBSERVED_RANGES_SEC[q][1]
    rec = {"extended_queries": {q: hi * 1.3}, "box_load_ok": False,
           "load_1m_at_start": 5.0,
           "extended_load_1m_per_query": {q: [6.4, 7.0]}}
    g = bt._grade_extended(rec)[q]
    assert g["grade"] == "above_band"
    assert g["adjudication"] == "load_suspect"


def test_extended_riser_on_clean_start_run_is_investigate():
    """The critical path (review r14): the extended section runs LAST,
    so its mid-run load samples ALWAYS carry Spark's own self-load
    (2.8-11.3 on committed idle runs) — thresholding them would stamp
    every real extended regression load_suspect. Adjudication is
    run-level; a clean-start run's riser must reach 'investigate'
    even with realistic (high) mid-run self-load samples."""
    bt = _load()
    q = "graph_triangle_summary"
    hi = bt.EXTENDED_OBSERVED_RANGES_SEC[q][1]
    rec = {"extended_queries": {q: hi * 1.3}, "box_load_ok": True,
           "load_1m_at_start": 0.1, "loadavg_final": [5.0, 2.1, 1.4],
           "extended_load_1m_per_query": {q: [5.6, 6.2]}}  # self-load
    g = bt._grade_extended(rec)[q]
    assert g["adjudication"] == "investigate"
    # ...and the self-load samples ride along as labeled evidence.
    assert g["evidence"][
        "mid_run_load_before_after_self_load_included"] == [5.6, 6.2]


def test_extended_band_dispatch_on_order_stamp():
    """r14 verdict #4: fresh-order records grade their primary
    extended section against EXTENDED_FRESH_RANGES_SEC and their
    postheadline section against the legacy ranges; legacy records
    keep the legacy ranges for their single section."""
    bt = _load()
    q = "graph_pagerank"
    fresh_band = bt.EXTENDED_FRESH_RANGES_SEC[q]
    legacy_band = bt.EXTENDED_OBSERVED_RANGES_SEC[q]
    rec = {"extended_order": "fresh_jvm_after_headline",
           "box_load_ok": True, "load_1m_at_start": 0.1,
           "extended_queries": {q: fresh_band[1]},
           "extended_queries_postheadline": {q: legacy_band[1]}}
    g = bt._grade_extended(rec)
    assert g[q]["band"] == list(fresh_band)
    assert g[q]["grade"] == "in_band"
    assert g[f"{q} (postheadline)"]["band"] == list(legacy_band)
    assert g[f"{q} (postheadline)"]["grade"] == "in_band"
    # legacy record: single section, legacy band
    legacy_rec = {"extended_queries": {q: legacy_band[1]}}
    g2 = bt._grade_extended(legacy_rec)
    assert g2[q]["band"] == list(legacy_band)
    assert f"{q} (postheadline)" not in g2


def test_postheadline_section_is_recorded_only(tmp_path):
    """r16: the legacy after-headline section rides Spark's
    accumulated self-load and has no section-scoped steal window —
    its 1.00-1.05x edge wobbles on degraded-box days carry no gate
    information (clean-stamp r16 runs read fuzzy 3.046 / pagerank
    6.19 vs edges 2.92 / 6.18 while their FRESH sections sat
    mid-band). A postheadline 'investigate' must not fail --strict;
    a PRIMARY fresh-section investigate still must."""
    bt = _load()
    q = "dedup_fuzzy_names"
    base = {"metric": "headline_queries_total_sec",
            "value": sum(bt.ANCHOR_BAND_MIN_OF_3_SEC) / 2, "unit": "sec",
            "queries": {}, "n_measured": 18, "n_expected": 18, "sf": 0.1,
            "runs_per_query": 3, "box_load_ok": True,
            "load_1m_at_start": 0.1, "extended_order":
            "fresh_jvm_after_headline", "steal_pct": 0.1,
            "steal_pct_demand": 0.2,
            "extended_queries": {q: bt.EXTENDED_FRESH_RANGES_SEC[q][0]}}
    post_riser = dict(base, extended_queries_postheadline={
        q: bt.EXTENDED_OBSERVED_RANGES_SEC[q][1] * 1.05})
    p = tmp_path / "BENCH_LOCAL_r31.json"
    p.write_text(json.dumps(post_riser))
    g = bt.grade(bt.extract_record(p))
    entry = g["extended"][f"{q} (postheadline)"]
    assert entry["grade"] == "above_band"
    assert entry["gating"] is False
    assert bt.main(["--artifact", str(p), "--strict"]) == 0
    # ...the gated PRIMARY fresh section still fails strict
    fresh_riser = dict(base, extended_fresh_cpu_steal={
        "steal_pct_of_capacity": 0.1, "steal_pct_of_demand": 0.2},
        extended_queries={q: bt.EXTENDED_FRESH_RANGES_SEC[q][1] * 1.3})
    p2 = tmp_path / "BENCH_LOCAL_r32.json"
    p2.write_text(json.dumps(fresh_riser))
    g2 = bt.grade(bt.extract_record(p2))
    assert g2["extended"][q]["adjudication"] == "investigate"
    assert g2["extended"][q].get("gating", True) is True
    assert bt.main(["--artifact", str(p2), "--strict"]) == 1


def test_literal_r16_stamp_invisible_17506_run_is_not_investigate():
    """r16 verdict #3's must-catch case, on the LITERAL committed
    stamps (evidence/r16/BENCH_LOCAL_r16_episode_17506.json): the
    17.506 s run passed every steal stamp (nested headline window
    0.02%/0.18%, compact keys explicitly null) and the idle gate
    (1m_and_5m_idle, start 1.51) and predates the probe
    (cpu_work_probe_sec: null) — it must STILL not grade
    'investigate': the first-headline-query pre-sample (3.36) is the
    one signal that caught it live, and the explicit-null compact
    steal keys must not shadow the nested record (ADVICE r16 low:
    dict-default vs None-coalescing)."""
    bt = _load()
    p = _REPO / "evidence" / "r16" / "BENCH_LOCAL_r16_episode_17506.json"
    g = bt.grade(bt.extract_record(p))
    h = g["headline"]
    assert h["value"] == 17.506
    assert h["grade"] == "above_band"
    assert h["adjudication"] == "load_suspect"
    assert h["evidence"]["first_query_load_before"] == 3.36


def test_literal_r16_episode_13348_run_caught_by_headline_steal():
    """The episode's only probe-stamped run (13.348 s, probe
    [0.3953, 0.4071]) — its nested headline window carries 3.43%
    demand-steal, so the steal signal names the mechanism before the
    probe is consulted. Committed as the probe calibration's DEGRADED
    point (bench_constants.CPU_WORK_PROBE_SLOW_SEC provenance)."""
    bt = _load()
    p = _REPO / "evidence" / "r16" / "BENCH_LOCAL_r16_episode_13348.json"
    g = bt.grade(bt.extract_record(p))
    h = g["headline"]
    assert h["value"] == 13.348
    # era-aware since r17: an r16 artifact grades against the r16
    # engine's band (bench_constants.anchor_band_for_round)
    if h["value"] > h["band"][1]:
        # once the band's episode-widened high edge retires (the
        # r16-verdict-#2 contraction rule), this point reads
        # above-band and must adjudicate from its headline steal
        assert h["grade"] == "above_band"
        assert h["adjudication"] == "load_suspect"
        assert h["evidence"]["steal_pct_of_demand"] == 3.43
    else:
        # while the widened edge still covers the episode point it
        # grades in-band; pin the adjudication path directly so the
        # steal extraction is exercised either way
        assert h["grade"] == "in_band"
        rec = bt.extract_record(p)["record"]
        adj = bt._load_adjudication(rec, steal_override=(0.47, 3.43))
        assert adj["adjudication"] == "load_suspect"
        assert adj["evidence"]["steal_pct_of_demand"] == 3.43


def test_explicit_null_compact_steal_keys_do_not_shadow_nested():
    """ADVICE r16 (low): a record carrying steal_pct_headline
    explicitly null ALONGSIDE a populated nested cpu_steal_headline
    must adjudicate from the nested percentages (dict-default
    .get(key, fallback) ignored them because the key existed)."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    rec = {"value": hi * 1.2, "runs_per_query": 3,
           "box_load_ok": True, "load_1m_at_start": 0.1,
           "extended_order": "fresh_jvm_after_headline",
           "steal_pct_headline": None, "steal_pct_demand_headline": None,
           "cpu_steal_headline": {"steal_pct_of_capacity": 0.5,
                                  "steal_pct_of_demand": 7.7}}
    g = bt._grade_headline(rec)
    assert g["adjudication"] == "load_suspect"
    assert g["evidence"]["steal_pct_of_demand"] == 7.7


def test_slow_probe_adjudicates_above_band_as_host_slow_suspect():
    """r16 verdict #3: the fixed-work host-speed probe is the one
    stamp that sees frequency-cap/memory-bandwidth degradation. An
    above-band reading with clean gate/loads/steal but a bracketing
    probe max over CPU_WORK_PROBE_SLOW_SEC grades host_slow_suspect
    (box state); a probe inside the committed clean envelope — the
    driver's clean 11.566 s run read [0.3887, 0.3955] — must NOT
    excuse anything ('investigate' stands); a missing/null probe
    (pre-r16 records) keeps the clean-start default too."""
    bt = _load()
    hi = bt.ANCHOR_BAND_MIN_OF_3_SEC[1]
    base = {"value": hi * 1.3, "runs_per_query": 3,
            "box_load_ok": True, "load_1m_at_start": 0.1,
            "steal_pct": 0.02, "steal_pct_demand": 0.11,
            "steal_pct_headline": 0.02, "steal_pct_demand_headline": 0.18,
            "extended_order": "fresh_jvm_after_headline"}
    degraded = dict(base, cpu_work_probe_sec=[0.3953, 0.4071])
    g = bt._grade_headline(degraded)
    assert g["adjudication"] == "host_slow_suspect"
    assert g["evidence"]["cpu_work_probe_max_sec"] == 0.4071
    assert g["evidence"]["threshold_sec"] == bt.CPU_WORK_PROBE_SLOW_SEC
    clean = dict(base, cpu_work_probe_sec=[0.3887, 0.3955])
    assert bt._grade_headline(clean)["adjudication"] == "investigate"
    absent = dict(base, cpu_work_probe_sec=None)
    assert bt._grade_headline(absent)["adjudication"] == "investigate"


def test_host_slow_suspect_passes_strict_like_load_suspect(tmp_path):
    """host_slow_suspect is box state, not regression — it must not
    fail --strict (the probe is engine-free, so an engine regression
    cannot raise it; no ADVICE-r14 self-masking mode)."""
    bt = _load()
    rec = {"metric": "headline_queries_total_sec",
           "value": bt.ANCHOR_BAND_MIN_OF_3_SEC[1] * 1.36, "unit": "sec",
           "queries": {}, "n_measured": 18, "n_expected": 18, "sf": 0.1,
           "runs_per_query": 3, "box_load_ok": True,
           "load_1m_at_start": 0.1, "steal_pct": 0.02,
           "steal_pct_demand": 0.11, "steal_pct_headline": 0.02,
           "steal_pct_demand_headline": 0.18,
           "extended_order": "fresh_jvm_after_headline",
           "cpu_work_probe_sec": [0.41, 0.405], "extended_queries": {}}
    p = _driver_artifact(tmp_path, json.dumps(rec) + "\n", n=21)
    g = bt.grade(bt.extract_record(p))
    assert g["headline"]["adjudication"] == "host_slow_suspect"
    assert bt.main(["--artifact", str(p), "--strict"]) == 0


def test_fresh_section_probe_is_the_childs_not_the_parents():
    """The child stamps its own probe
    (extended_fresh_cpu_work_probe_sec); the parent's bracketing pair
    probes a different window. A fresh-section riser with a clean
    child steal window grades host_slow_suspect only on the CHILD's
    probe — a slow parent pair must not excuse it, and vice versa."""
    bt = _load()
    q = "graph_pagerank"
    hi = bt.EXTENDED_FRESH_RANGES_SEC[q][1]
    base = {"extended_order": "fresh_jvm_after_headline",
            "box_load_ok": True, "load_1m_at_start": 0.2,
            "steal_pct": 0.1, "steal_pct_demand": 0.2,
            "extended_queries": {q: hi * 1.3},
            "extended_fresh_cpu_steal": {"steal_pct_of_capacity": 0.1,
                                         "steal_pct_of_demand": 0.2}}
    slow_child = dict(base, cpu_work_probe_sec=[0.37, 0.37],
                      extended_fresh_cpu_work_probe_sec=0.42)
    g = bt._grade_extended(slow_child)[q]
    assert g["adjudication"] == "host_slow_suspect"
    assert g["evidence"]["cpu_work_probe_max_sec"] == 0.42
    slow_parent = dict(base, cpu_work_probe_sec=[0.42, 0.43],
                       extended_fresh_cpu_work_probe_sec=0.375)
    assert bt._grade_extended(slow_parent)[q][
        "adjudication"] == "investigate"


def test_below_band_is_never_an_investigate_flag():
    bt = _load()
    lo = bt.ANCHOR_BAND_MIN_OF_3_SEC[0]
    g = bt._grade_headline({"value": lo * 0.8, "runs_per_query": 3})
    assert g["grade"] == "below_band"
    assert "adjudication" not in g


# --- review-r14 regression scenarios ------------------------------------

def _compact_style_record(value, **extra):
    """Shape of the r14+ driver compact line (run-level stamps, no
    per-query load dicts)."""
    rec = {"metric": "headline_queries_total_sec", "value": value,
           "unit": "sec", "queries": {}, "n_measured": 18,
           "n_expected": 18, "sf": 0.1, "runs_per_query": 3,
           "box_load_ok": True, "load_1m_at_start": 0.1,
           "loadavg_final": [0.5, 0.8, 0.9],
           "box_load_threshold_1m": 2.0, "extended_queries": {}}
    rec.update(extra)
    return rec


def test_regressed_driver_compact_artifact_fails_strict(tmp_path):
    """A genuinely regressed driver total on a clean-start run must
    grade 'investigate' from the compact line alone, and --strict must
    exit 1 (previously it fell into the legacy unadjudicable branch
    and the gate passed)."""
    bt = _load()
    bad = _compact_style_record(bt.anchor_band_for_round(15)[1] * 1.48)
    tail = "noise\n" + json.dumps(bad) + "\n"
    p = _driver_artifact(tmp_path, tail, n=15)
    g = bt.grade(bt.extract_record(p))
    assert g["headline"]["grade"] == "above_band"
    assert g["headline"]["adjudication"] == "investigate"
    assert bt.main(["--artifact", str(p), "--strict"]) == 1


def test_truncated_or_null_value_artifact_fails_strict(tmp_path):
    """An ungradable artifact is a gate FAILURE, not an all-clear —
    the r13 truncation must never again pass silently."""
    bt = _load()
    p = _driver_artifact(tmp_path, '"q5": 1.43, "x": 1}\n', n=16)
    assert bt.main(["--artifact", str(p), "--strict"]) == 1
    nulled = _compact_style_record(None)
    p2 = _driver_artifact(tmp_path, json.dumps(nulled) + "\n", n=17)
    assert bt.main(["--artifact", str(p2), "--strict"]) == 1


def test_two_line_stdout_capture_parses_as_local_artifact(tmp_path):
    """`python bench.py > BENCH_LOCAL_rN.json` yields TWO JSON lines;
    the fuller (diagnostic) record must win, not a crash."""
    bt = _load()
    diag = _compact_style_record(
        sum(bt.anchor_band_for_round(18)) / 2, protocol="min of 3"
    )
    compact = {k: diag[k] for k in ("metric", "value", "queries")}
    p = tmp_path / "BENCH_LOCAL_r18.json"
    p.write_text(json.dumps(diag) + "\n" + json.dumps(compact) + "\n")
    got = bt.extract_record(p)
    assert got["record"]["protocol"] == "min of 3"  # diagnostic line won
    assert bt.grade(got)["headline"]["grade"] == "in_band"


def test_driver_parsed_field_is_authoritative_when_present(tmp_path):
    """When the driver already extracted a record ('parsed' non-null),
    grade THAT — tail scanning is only the parsed:null recovery path."""
    bt = _load()
    parsed = _compact_style_record(11.0)
    tail_rec = _compact_style_record(99.0)  # stale/other line in tail
    p = tmp_path / "BENCH_r19.json"
    p.write_text(json.dumps({"n": 19, "rc": 0, "parsed": parsed,
                             "tail": json.dumps(tail_rec)}))
    assert bt.extract_record(p)["record"]["value"] == 11.0


def test_artifact_without_round_number_reports_not_crashes(tmp_path):
    bt = _load()
    p = tmp_path / "mybench.json"
    p.write_text(json.dumps(_compact_style_record(11.9)))
    assert bt.main(["--artifact", str(p)]) == 0


def test_compact_record_degrades_to_fit_budget_for_registry_sweeps():
    """SPARK_GRAFT_BENCH_SET=all produces a ~171-entry queries dict;
    the compact line must degrade (drop per-query dicts) rather than
    overflow the driver's tail capture — the r13 failure mode."""
    import bench
    diag = {"metric": "headline_queries_total_sec", "value": 123.4,
            "unit": "sec",
            "queries": {f"query_name_{i:03d}": 1.234 for i in range(171)},
            "n_measured": 171, "n_expected": 171, "sf": 0.1,
            "runs_per_query": 3, "box_load_ok": True,
            "load_1m_at_start": 0.1, "loadavg_final": [1, 1, 1],
            "box_load_threshold_1m": 2.0,
            "extended_queries": {f"heavy_{i}": 9.999 for i in range(4)}}
    line = json.dumps(bench.compact_record(diag))
    assert len(line.encode()) <= bench.FINAL_LINE_BUDGET_BYTES
    assert "171 entries" in line  # degraded, pointing at the full record


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
    protocol) must sit inside the anchor band OF THEIR CODE ERA — a
    local artifact landing outside means the band doc went stale
    without provenance. Era-aware since r17 (the optimization rounds
    change the engine itself; bench_constants.anchor_band_for_round
    dispatches on the artifact's round number)."""
    bt = _load()
    for p in sorted(_REPO.glob("BENCH_LOCAL_r*.json")):
        # extract_record handles both committed shapes: the r14
        # single-document diagnostic record and the r15+ raw two-line
        # `python bench.py > file` capture
        parsed = bt.extract_record(p)
        lo, hi = bt.anchor_band_for_round(parsed["round"])
        rec = parsed["record"]
        assert lo <= rec["value"] <= hi, (p.name, rec["value"])
