#!/usr/bin/env python
"""Mechanically adjudicate bench artifacts against the recorded noise
bands (r13 verdict #4's end goal: "so r15 can adjudicate an extended
riser mechanically").

Reads driver artifacts (``BENCH_r{N}.json`` — the driver's
``{"n", "rc", "parsed", "tail"}`` stdout-tail capture) and builder
artifacts (``BENCH_LOCAL_r{N}.json`` — the full diagnostic record
bench.py prints first), extracts the record, and grades:

- the headline total against the era-matched band
  (``bench_constants.ANCHOR_BAND_MIN_OF_3_SEC`` for min-of-3 records,
  ``SINGLE_RUN_ERA_BAND_SEC`` for r01-r09 single-run artifacts), and
- each ``extended_queries`` heavy against its observed idle range
  (``bench_constants.EXTENDED_OBSERVED_RANGES_SEC`` — the machine-
  readable copy of SCALING.md's "Extended-heavy observed ranges").

Out-of-band readings are adjudicated from the RUN-LEVEL load stamps
(start load / box_load_ok / final loadavg / first headline query's
pre-sample) per the standing rules (SCALING.md#noise-band): a run that
demonstrably started loaded — or whose 5m average shows external work
draining — is stamped ``load_suspect`` (box state, not regression); an
out-of-band reading on a clean-start run is stamped ``investigate`` —
either a plan regression (check ``tools/freshness_check.py`` / git) or
a per-round DATA-regime shift (the bands absorb regimes: update the
constant WITH provenance once the new regime reproduces on an idle
pair, as the round-13 and round-14 regenerations did).

Deliberately NOT used for adjudication: the extended section's mid-run
``extended_load_1m_per_query`` samples. The section runs LAST, after
minutes of measurement, so those samples always carry Spark's OWN
accumulated self-load (2.8-11.3 on the committed idle runs) — a
threshold on them would stamp every real extended regression
``load_suspect``. They are attached as evidence only.

Usage::

    python tools/bench_trend.py              # newest round's artifacts
    python tools/bench_trend.py --artifact BENCH_LOCAL_r14.json
    python tools/bench_trend.py --all        # cross-round trend table
    python tools/bench_trend.py --strict     # exit 1 unless cleanly graded

Report-only by default (exit 0); ``--strict`` exits 1 when any graded
entry is ``investigate`` OR when an artifact in the graded set cannot
be graded at all (unparseable tail, null total) — an ungradable round
is a gate failure, not an all-clear (the r13 truncation lesson).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench_constants import (  # noqa: E402
    ANCHOR_BAND_MIN_OF_3_SEC,
    BOX_LOAD_THRESHOLD_1M,
    CPU_WORK_PROBE_SLOW_SEC,
    EXTENDED_FRESH_RANGES_SEC,
    EXTENDED_OBSERVED_RANGES_SEC,
    SINGLE_RUN_ERA_BAND_SEC,
    STEAL_SUSPECT_DEMAND_PCT,
    STEAL_SUSPECT_PCT,
    anchor_band_for_round,
    extended_ranges_for_round,
)

REPO = Path(__file__).resolve().parent.parent


def _best_record(candidates: list[dict]) -> dict | None:
    """The fullest record wins: the diagnostic line carries strictly
    more keys than the compact line derived from it."""
    with_value = [c for c in candidates if isinstance(c, dict) and "value" in c]
    return max(with_value, key=lambda c: len(c), default=None)


def _scan_json_lines(text: str) -> list[dict]:
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict):
            out.append(cand)
    return out


def extract_record(path: Path) -> dict:
    """Parse one artifact into ``{round, kind, record, reason}``.

    ``record`` is the diagnostic/compact dict (or None when
    unrecoverable, with ``reason`` saying why — e.g. round 13's
    truncated driver tail, the defect the compact final line fixed).
    """
    m = re.search(r"_r(\d+)", path.name)
    rnd = int(m.group(1)) if m else None
    text = path.read_text()
    try:
        raw = json.loads(text)
    except ValueError:
        # A local artifact captured via `python bench.py > file` holds
        # TWO JSON lines (diagnostic + compact) — not one document.
        rec = _best_record(_scan_json_lines(text))
        return {"round": rnd, "kind": "local", "record": rec,
                "reason": None if rec else "no parseable JSON record",
                "path": str(path)}
    if isinstance(raw, dict) and "tail" in raw and "rc" in raw:
        # Driver capture. The driver's own extraction ("parsed") is
        # authoritative when non-null — grade what the driver graded;
        # scan the tail only for the parsed:null recovery case (r13).
        parsed = raw.get("parsed")
        if isinstance(parsed, dict) and "value" in parsed:
            rec = parsed
        else:
            rec = _best_record(_scan_json_lines(raw["tail"]))
        return {
            "round": raw.get("n", rnd),
            "kind": "driver",
            "record": rec,
            "reason": None if rec else "no parseable JSON line in driver tail",
            "path": str(path),
        }
    return {"round": rnd, "kind": "local", "record": raw, "reason": None,
            "path": str(path)}


def _probe_max(probe) -> float | None:
    """Max over the section's stamped host-speed probe readings (the
    bracketing [gate-pass, post-headline] pair for the headline; the
    child's own single reading for the fresh section) — one slow end
    means the probed window overlapped a degradation episode. None
    when the stamp is absent/null (pre-r16 records, and the literal
    17.506 s run that MOTIVATED the probe)."""
    vals = probe if isinstance(probe, (list, tuple)) else [probe]
    vals = [v for v in vals if isinstance(v, (int, float))]
    return max(vals) if vals else None


def _load_adjudication(
    rec: dict,
    steal_override: tuple | None = None,
    probe: float | None = None,
) -> dict:
    """Standing rule, applied at RUN level and ONLY from start-side
    signals (ADVICE r14): the run-level start stamp, ``box_load_ok``
    (which since r15 folds in the settle criterion), the idle-wait
    gate outcome, and — when the extended section did not run first —
    the first headline query's pre-sample. End-of-run signals are
    deliberately NOT thresholded: ``loadavg_final`` is sampled after
    minutes of the bench's own local[32] load, so a genuine ~1.5-2x
    regression lengthens the run and pushes its OWN final 5m average
    past any fixed threshold — a final-loadavg check stamps the
    regression ``load_suspect`` and masks it, more reliably the
    larger it is (the r14 implementation had exactly this hole).
    Mid-run per-query samples are likewise not thresholded (Spark
    self-load dominates them). A clean-start run's out-of-band
    reading therefore defaults to ``investigate``."""
    thresh = rec.get("box_load_threshold_1m", BOX_LOAD_THRESHOLD_1M)
    start = rec.get("load_1m_at_start")
    per_q = rec.get("load_1m_per_query") or {}
    has_any_stamp = ("box_load_ok" in rec or start is not None
                     or bool(per_q))
    if not has_any_stamp:
        # Pre-r11 driver artifacts carry no load stamps at all — the
        # reading can't be adjudicated from the artifact, and those
        # driver runs are known loaded-box sessions. For min-of-3-era
        # records (runs_per_query >= 2) a stamp-less above-band
        # reading is a GATE failure under --strict, not a silent pass
        # (ADVICE r14): every r10+ record stamps loads, so losing
        # them is itself a harness defect.
        return {"adjudication": "unadjudicable_no_load_stamps",
                "strict_fail": rec.get("runs_per_query", 1) >= 2,
                "evidence": {}}
    if (start is not None and start >= thresh) or not rec.get(
            "box_load_ok", True):
        return {"adjudication": "load_suspect",
                "evidence": {"load_1m_at_start": start,
                             "box_load_ok": rec.get("box_load_ok"),
                             "gate_criterion": rec.get("gate_criterion"),
                             "box_settled": rec.get("box_settled")}}
    # Hypervisor steal (r15): the one external load NO guest stamp can
    # see — host-denied cycles on this VM. Measured live: clean gate,
    # start load 0.2, and the headline read 3.5x the band while a
    # 32-core probe showed 8.2% of capacity stolen. Safe to threshold
    # despite being a whole-run signal: a code regression burns GUEST
    # cycles, it cannot make the HOST deny them, so — unlike the
    # retired end-of-run loadavg check — a regression cannot inflate
    # its own steal stamp and self-mask.
    if steal_override is not None:
        cap_steal, dem_steal = steal_override
    else:
        cs = rec.get("cpu_steal") or {}
        cap_steal = rec.get("steal_pct", cs.get("steal_pct_of_capacity"))
        dem_steal = rec.get("steal_pct_demand", cs.get("steal_pct_of_demand"))
    if cap_steal is not None and cap_steal >= STEAL_SUSPECT_PCT:
        return {"adjudication": "load_suspect",
                "evidence": {"steal_pct_of_capacity": cap_steal}}
    # demand view: capacity-steal dilutes denial by the span's idle
    # phases; the barrier-relevant number is the fraction of cycles
    # the guest ASKED for and was denied (see bench._steal_record —
    # also self-masking-safe: a regression grows the denominator)
    if dem_steal is not None and dem_steal >= STEAL_SUSPECT_DEMAND_PCT:
        return {"adjudication": "load_suspect",
                "evidence": {"steal_pct_of_demand": dem_steal}}
    # The FIRST headline query's pre-sample is a second start-of-
    # measurement reading — taken AFTER the warm-up pass, so it
    # catches external load that arrived between the run-level start
    # stamp and the measured loop (observed live in round 14: a run
    # stamped start 0.02 / box_load_ok true carried 2.4-2.8 through
    # the whole headline loop and read 13.86 s, 1.17x its clean twin;
    # Spark's own threads have not yet accumulated into the 1m
    # average at this first sample, so the threshold is meaningful
    # here — unlike the mid-run/extended samples). Also the only
    # signal for r11-style records that lack run-level stamps.
    # Era-gated OFF only for child-BEFORE-headline records (the r15
    # ordering that was tried first and reverted): there the sample
    # carried the decay of the bench's OWN extended child. With the
    # final child-AFTER ordering nothing precedes the headline again,
    # so the sample stays a start-side signal.
    if per_q and rec.get("extended_order") != "fresh_jvm_before_headline":
        samples = [v for v in per_q.values() if v]
        first_before = samples[0][0] if samples else None
        if first_before is not None and first_before >= thresh:
            return {"adjudication": "load_suspect",
                    "evidence": {"first_query_load_before": first_before}}
    # Fixed-work host-speed probe (r16 verdict #3): the one stamp that
    # sees frequency-cap / memory-bandwidth degradation — the r16
    # episode's 17.506 s run passed EVERY steal and gate stamp (0.18%
    # headline demand-steal) while the box ran the engine 1.25-1.5x
    # slow. The probe is engine-free, so an engine regression cannot
    # raise it (no ADVICE-r14 self-masking mode); a reading above
    # CPU_WORK_PROBE_SLOW_SEC — above every committed clean point —
    # grades the section host_slow_suspect (box state). Checked LAST
    # among the excuse signals: steal/load stamps name the mechanism
    # more precisely when they fire.
    if probe is not None and probe >= CPU_WORK_PROBE_SLOW_SEC:
        return {"adjudication": "host_slow_suspect",
                "evidence": {"cpu_work_probe_max_sec": probe,
                             "threshold_sec": CPU_WORK_PROBE_SLOW_SEC}}
    return {"adjudication": "investigate",
            "evidence": {"load_1m_at_start": start}}


def _steal_pair_or_none(cap, dem) -> tuple | None:
    """A steal override whose percentages are BOTH None is a degenerate
    stamp (a <=0-jiffy window), not a clean one — treat it like a
    missing stamp so the run-level steal record still adjudicates
    (ADVICE r15: a (None, None) override silently skipped the run-level
    fallback and graded the section with no steal signal at all)."""
    if cap is None and dem is None:
        return None
    return (cap, dem)


def _grade_headline(rec: dict, round_no: int | None = None) -> dict:
    # Era dispatch, two axes: min-of-3 records (r10+) stamp
    # runs_per_query >= 2; single-run-era artifacts grade against
    # THEIR band — cross-era point-to-band comparison mis-reads by
    # ~18% (BASELINE.md). Since r17 the CODE era dispatches too
    # (bench_constants.anchor_band_for_round): the optimization
    # rounds changed the engine itself, so pre-r17 artifacts keep
    # the band their engine ran under.
    min_of_3 = rec.get("runs_per_query", 1) >= 2
    lo, hi = (
        anchor_band_for_round(round_no) if min_of_3 else SINGLE_RUN_ERA_BAND_SEC
    )
    value = rec.get("value")
    out = {"value": value, "band": [lo, hi],
           "era": "min_of_3" if min_of_3 else "single_run"}
    if value is None:
        # A nulled total (all headline queries failed) is ungradable —
        # surfaced as a gate failure in --strict, never an all-clear.
        out["grade"] = "no_value"
        return out
    if lo <= value <= hi:
        out["grade"] = "in_band"
    elif value < lo:
        # Faster than every recorded idle run — band maintenance
        # (extend the low edge with provenance), never a defect.
        out["grade"] = "below_band"
        out["ratio_to_low_edge"] = round(value / lo, 3)
    else:
        out["grade"] = "above_band"
        out["ratio_to_high_edge"] = round(value / hi, 3)
        # ADVICE r15 (medium): the run-level steal window spans the
        # whole measured span (headline + postheadline + fresh child),
        # of which the headline loop is a minority — a burst landing
        # only in the extended sections could excuse a genuine
        # headline regression, and a burst concentrated IN the
        # headline is diluted ~3-5x and may miss the thresholds.
        # Records stamped since r16 carry a headline-window steal
        # record (``cpu_steal_headline`` / compact
        # ``steal_pct_headline``); adjudicate the headline on THAT
        # window when present, falling back to the run-level stamps
        # for older records (and for degenerate all-None stamps).
        # None-coalescing, not dict-default (ADVICE r16 low): a record
        # carrying the compact key explicitly set to null alongside a
        # populated nested cpu_steal_headline record must let the
        # nested percentages win, not fall back to the diluted
        # run-level stamps.
        hs = rec.get("cpu_steal_headline") or {}
        cap_h = rec.get("steal_pct_headline")
        if cap_h is None:
            cap_h = hs.get("steal_pct_of_capacity")
        dem_h = rec.get("steal_pct_demand_headline")
        if dem_h is None:
            dem_h = hs.get("steal_pct_of_demand")
        headline_steal = _steal_pair_or_none(cap_h, dem_h)
        out.update(_load_adjudication(
            rec,
            steal_override=headline_steal,
            # the [gate-pass, post-headline] pair brackets the
            # headline loop — the section this grade is about
            probe=_probe_max(rec.get("cpu_work_probe_sec")),
        ))
    return out


def _grade_one_extended_section(
    rec: dict, ext: dict, ranges: dict, load_key: str,
    steal_override: tuple | None = None,
    probe: float | None = None,
) -> dict:
    out = {}
    for q, band in ranges.items():
        t = ext.get(q)
        entry = {"value": t, "band": list(band)}
        if t is None:
            entry["grade"] = "not_measured"
        elif band[0] <= t <= band[1]:
            entry["grade"] = "in_band"
        elif t < band[0]:
            entry["grade"] = "below_band"
        else:
            entry["grade"] = "above_band"
            entry["ratio_to_high_edge"] = round(t / band[1], 3)
            # RUN-level adjudication (see module docstring: the mid-run
            # extended samples always carry Spark self-load, so they
            # can't separate external load from a real riser).
            entry.update(_load_adjudication(rec, steal_override, probe))
            mid = (rec.get(load_key) or {}).get(q)
            if mid is not None:
                entry.setdefault("evidence", {})[
                    "mid_run_load_before_after_self_load_included"] = mid
        out[q] = entry
    return out


def _grade_extended(rec: dict, round_no: int | None = None) -> dict:
    """Era dispatch (r14 verdict #4): records stamped
    ``extended_order: fresh_jvm_*`` carry FRESH-order primary
    numbers, graded against ``EXTENDED_FRESH_RANGES_SEC``;
    their legacy after-headline numbers ride along under
    ``extended_queries_postheadline`` and are graded against the
    legacy ranges as a secondary trend. Older records' single
    ``extended_queries`` section IS the legacy order."""
    ext = rec.get("extended_queries")
    if not isinstance(ext, dict):
        ext = {}  # budget-degraded compact line or old artifact
    fresh_order = str(rec.get("extended_order") or "").startswith("fresh_jvm")
    primary_ranges = extended_ranges_for_round(round_no, fresh_order)
    # the fresh child stamps its own steal window — the run-level
    # percentage dilutes a contaminated child ~5x (the child is a
    # fraction of the span), so the child's stamp grades its section
    child = rec.get("extended_fresh_cpu_steal") or {}
    child_steal = (
        _steal_pair_or_none(
            child.get("steal_pct_of_capacity"),
            child.get("steal_pct_of_demand"),
        )
        if fresh_order and child else None
    )
    out = _grade_one_extended_section(
        rec, ext, primary_ranges, "extended_load_1m_per_query",
        steal_override=child_steal,
        # the child stamps its own probe; the parent's bracketing pair
        # probes a different window, so it never grades this section
        probe=(
            _probe_max(rec.get("extended_fresh_cpu_work_probe_sec"))
            if fresh_order else None
        ))
    post = rec.get("extended_queries_postheadline")
    if isinstance(post, dict):
        for q, entry in _grade_one_extended_section(
            rec, post, extended_ranges_for_round(round_no, False),
            "extended_postheadline_load_1m_per_query",
        ).items():
            # RECORDED-ONLY since r16 (like the sweep's raw 4x tail):
            # the postheadline section is the legacy same-JVM order
            # kept as a secondary trend — it rides Spark's accumulated
            # self-load (the ±30% noise that motivated the fresh child
            # in the first place) and has no section-scoped steal
            # window, so its 1.00-1.05x edge wobbles on degraded-box
            # days flap the gate without information (r16: clean-stamp
            # runs read fuzzy 3.046 / pagerank 6.19 vs edges 2.92 /
            # 6.18 while their FRESH sections sat mid-band). The fresh
            # child remains the gated primary.
            entry["gating"] = False
            out[f"{q} (postheadline)"] = entry
    return out


def grade(parsed: dict) -> dict:
    rec = parsed["record"]
    if rec is None:
        return {**{k: parsed[k] for k in ("round", "kind", "path")},
                "grade": "unparseable", "reason": parsed["reason"]}
    return {
        **{k: parsed[k] for k in ("round", "kind", "path")},
        "headline": _grade_headline(rec, parsed.get("round")),
        "extended": _grade_extended(rec, parsed.get("round")),
    }


def find_artifacts() -> list[Path]:
    return sorted(REPO.glob("BENCH_r*.json")) + sorted(
        REPO.glob("BENCH_LOCAL_r*.json"))


def _fmt_grade(g: dict) -> str:
    tag = g["grade"]
    if tag == "above_band":
        tag += f" ({g.get('ratio_to_high_edge')}x high edge, " \
               f"{g.get('adjudication')})"
    elif tag == "below_band" and "ratio_to_low_edge" in g:
        tag += f" ({g['ratio_to_low_edge']}x low edge)"
    if g.get("gating") is False:
        tag += " [recorded-only]"
    return tag


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifact", action="append", default=None,
                    help="artifact path(s); default = newest round found")
    ap.add_argument("--all", action="store_true",
                    help="grade every committed artifact (trend table)")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 unless every graded artifact is cleanly "
                         "in band or load-adjudicated")
    ap.add_argument("--json", action="store_true",
                    help="machine output: one JSON line per artifact")
    args = ap.parse_args(argv)

    historical = False  # --all grades eras the gate shouldn't fail on
    if args.artifact:
        paths = [Path(a) for a in args.artifact]
    else:
        paths = find_artifacts()
        if not paths:
            print("no BENCH artifacts found", file=sys.stderr)
            return 2
        if args.all:
            historical = True
        else:
            rounds = [int(re.search(r"_r(\d+)", p.name).group(1))
                      for p in paths]
            rn = max(rounds)
            paths = [p for p, r in zip(paths, rounds) if r == rn]

    investigate, ungradable = [], []
    for p in paths:
        g = grade(extract_record(p))
        rn = g["round"] if g["round"] is not None else "?"
        if g.get("grade") == "unparseable":
            # Historical unparseables (r02 pre-JSON, r13 truncation)
            # are known; a CURRENT one is the r13 defect recurring.
            if not historical:
                ungradable.append(f"{p.name}: {g['reason']}")
            if args.json:
                print(json.dumps(g, sort_keys=True))
            else:
                print(f"r{rn:>2} {g['kind']:<6} {p.name}: "
                      f"UNPARSEABLE — {g['reason']}")
            continue
        h = g["headline"]
        if h["grade"] == "no_value" and not historical:
            ungradable.append(f"{p.name}: headline total is null")
        if args.json:
            print(json.dumps(g, sort_keys=True))
        else:
            print(f"r{rn:>2} {g['kind']:<6} {p.name}: "
                  f"headline {h['value']} s vs {h['band']} -> "
                  f"{_fmt_grade(h)}")
            for q, e in g["extended"].items():
                if e["grade"] == "not_measured":
                    continue
                print(f"      extended {q}: {e['value']} s vs "
                      f"{e['band']} -> {_fmt_grade(e)}")
        for section in [h] + list(g["extended"].values()):
            if (
                section.get("adjudication") == "investigate"
                and section.get("gating", True)
            ):
                investigate.append(
                    f"{p.name}: {section.get('value')} s vs "
                    f"{section['band']}")
            elif (
                section.get("adjudication") == "unadjudicable_no_load_stamps"
                and section.get("strict_fail")
                and not historical
            ):
                # ADVICE r14: a min-of-3-era record that LOST its load
                # stamps must not silently pass the gate — every r10+
                # record stamps loads, so a stamp-less above-band
                # reading is itself a harness defect.
                ungradable.append(
                    f"{p.name}: above-band reading with no load stamps "
                    f"on a min-of-3-era record")
    if ungradable:
        print("VERDICT: ungradable artifact(s) — " + "; ".join(ungradable)
              + ". An ungradable round is a gate failure, not an "
              "all-clear (the r13 truncation lesson).")
        return 1 if args.strict else 0
    if investigate:
        print("VERDICT: investigate — out-of-band reading(s) on a "
              "clean-start run: " + "; ".join(investigate)
              + ". Check freshness_check / git history, or record a "
              "reproduced data-regime shift in bench_constants with "
              "provenance.")
        return 1 if args.strict else 0
    print("VERDICT: all readings in band or load-adjudicated.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
