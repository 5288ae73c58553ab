#!/usr/bin/env python
"""Mechanically adjudicate bench artifacts against the recorded noise
bands (r13 verdict #4's end goal: "so r15 can adjudicate an extended
riser mechanically").

Reads driver artifacts (``BENCH_r{N}.json`` — the driver's
``{"n", "rc", "tail"}`` stdout-tail capture) and builder artifacts
(``BENCH_LOCAL_r{N}.json`` — the full diagnostic record bench.py prints
first), extracts the compact record, and grades:

- the headline total against the min-of-3 idle-box ANCHOR band
  (``bench_constants.ANCHOR_BAND_MIN_OF_3_SEC``, the same band bench.py
  stamps as ``min_of_3_fresh_jvm_spread_sec``), and
- each ``extended_queries`` heavy against its observed idle range
  (``bench_constants.EXTENDED_OBSERVED_RANGES_SEC`` — the machine-
  readable copy of SCALING.md's "Extended-heavy observed ranges").

Out-of-band readings are adjudicated from the artifact's own load
stamps per the standing rules (SCALING.md#noise-band): a reading whose
pre-query 1m loadavg exceeded the ``box_load_threshold_1m`` is stamped
``load_suspect`` (box state, not regression); an out-of-band reading on
an idle box is stamped ``investigate`` — that's either a plan
regression (check ``tools/freshness_check.py`` / git) or a per-round
DATA-regime shift (the bands absorb regimes: update the constant WITH
provenance once the new regime reproduces on an idle pair, as the
round-13 fresh-testdata shift did for the anchor band).

Usage::

    python tools/bench_trend.py              # newest round's artifacts
    python tools/bench_trend.py --artifact BENCH_LOCAL_r14.json
    python tools/bench_trend.py --all        # cross-round trend table
    python tools/bench_trend.py --strict     # exit 1 on any 'investigate'

Report-only by default (exit 0); ``--strict`` exits 1 when any entry
grades ``investigate`` so a round-end recipe can gate on it.
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
    EXTENDED_OBSERVED_RANGES_SEC,
    SINGLE_RUN_ERA_BAND_SEC,
)

REPO = Path(__file__).resolve().parent.parent


def extract_record(path: Path) -> dict:
    """Parse one artifact into ``{round, kind, record, reason}``.

    ``record`` is the compact/diagnostic dict (or None when
    unrecoverable, with ``reason`` saying why — e.g. round 13's
    truncated driver tail, the defect the compact final line fixed).
    """
    raw = json.loads(path.read_text())
    m = re.search(r"_r(\d+)", path.name)
    rnd = int(m.group(1)) if m else None
    if "tail" in raw and "rc" in raw:
        # Driver capture: the record is the LAST parseable JSON object
        # line in the ~2,000-char stdout tail. Since round 14 that is
        # the compact final line (budget-capped, always whole); older
        # tails may hold a whole single-line record (r10-r12) or a
        # truncated head (r13 -> unrecoverable).
        rec, reason = None, "no parseable JSON line in driver tail"
        for line in raw["tail"].splitlines():
            line = line.strip()
            if not (line.startswith("{") and line.endswith("}")):
                continue
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if isinstance(cand, dict) and "value" in cand:
                rec, reason = cand, None
        return {
            "round": raw.get("n", rnd),
            "kind": "driver",
            "record": rec,
            "reason": reason,
            "path": str(path),
        }
    return {"round": rnd, "kind": "local", "record": raw, "reason": None,
            "path": str(path)}


def _grade_headline(rec: dict) -> dict:
    # Era dispatch: min-of-3 records (r10+) stamp runs_per_query >= 2;
    # single-run-era artifacts grade against THEIR band — cross-era
    # point-to-band comparison mis-reads by ~18% (BASELINE.md).
    min_of_3 = rec.get("runs_per_query", 1) >= 2
    lo, hi = ANCHOR_BAND_MIN_OF_3_SEC if min_of_3 else SINGLE_RUN_ERA_BAND_SEC
    value = rec.get("value")
    out = {"value": value, "band": [lo, hi],
           "era": "min_of_3" if min_of_3 else "single_run"}
    if value is None:
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
        out.update(_load_adjudication(rec, None))
    return out


def _load_adjudication(rec: dict, query: str | None) -> dict:
    """Standing rule: blame box state when the artifact's own stamps
    show it; otherwise the reading needs investigation."""
    thresh = rec.get("box_load_threshold_1m", BOX_LOAD_THRESHOLD_1M)
    loads = None
    if query is not None:
        loads = (rec.get("extended_load_1m_per_query") or {}).get(query) \
            or (rec.get("load_1m_per_query") or {}).get(query)
    if loads is None:
        # Headline total / compact record: adjudicate from the run-
        # level stamps (start load + final loadavg).
        start = rec.get("load_1m_at_start")
        final = rec.get("loadavg_final")
        if (start is not None and start >= thresh) or not rec.get(
                "box_load_ok", True):
            return {"adjudication": "load_suspect",
                    "evidence": {"load_1m_at_start": start}}
        if final is not None and len(final) > 1 and final[1] >= 2 * thresh:
            # 5m average still draining (SCALING.md: box_load_ok can
            # pass while 5m-scale state inflates ~1.25x).
            return {"adjudication": "load_suspect",
                    "evidence": {"loadavg_final_5m": final[1]}}
        if start is None and rec.get("load_1m_per_query"):
            # r11-style records: no run-level start stamp, but per-
            # query [before, after] samples exist — a PRE-query sample
            # at/over threshold means concurrent load during the run.
            # (Post-query samples include Spark's own 32 threads, so
            # only the first 'before' is a clean box-state reading.)
            samples = [v for v in rec["load_1m_per_query"].values() if v]
            first_before = samples[0][0] if samples else None
            if first_before is not None and first_before >= thresh:
                return {"adjudication": "load_suspect",
                        "evidence": {"first_query_load_before":
                                     first_before}}
        if start is None and final is None:
            # Pre-r11 driver artifacts carry no load stamps at all —
            # the reading can't be adjudicated from the artifact, and
            # those driver runs are known loaded-box sessions. Not an
            # 'investigate' flag: there is nothing current to act on.
            return {"adjudication": "unadjudicable_no_load_stamps",
                    "evidence": {}}
        return {"adjudication": "investigate",
                "evidence": {"load_1m_at_start": start}}
    if loads and max(loads) >= thresh:
        return {"adjudication": "load_suspect",
                "evidence": {"load_1m_before_after": loads}}
    return {"adjudication": "investigate",
            "evidence": {"load_1m_before_after": loads}}


def _grade_extended(rec: dict) -> dict:
    out = {}
    for q, band in EXTENDED_OBSERVED_RANGES_SEC.items():
        t = (rec.get("extended_queries") or {}).get(q)
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
            entry.update(_load_adjudication(rec, q))
        out[q] = entry
    return out


def grade(parsed: dict) -> dict:
    rec = parsed["record"]
    if rec is None:
        return {**{k: parsed[k] for k in ("round", "kind", "path")},
                "grade": "unparseable", "reason": parsed["reason"]}
    return {
        **{k: parsed[k] for k in ("round", "kind", "path")},
        "headline": _grade_headline(rec),
        "extended": _grade_extended(rec),
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
    return tag


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--artifact", action="append", default=None,
                    help="artifact path(s); default = newest round found")
    ap.add_argument("--all", action="store_true",
                    help="grade every committed artifact (trend table)")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any grade is 'investigate'")
    ap.add_argument("--json", action="store_true",
                    help="machine output: one JSON line per artifact")
    args = ap.parse_args(argv)

    if args.artifact:
        paths = [Path(a) for a in args.artifact]
    else:
        paths = find_artifacts()
        if not paths:
            print("no BENCH artifacts found", file=sys.stderr)
            return 2
        if not args.all:
            newest = max(
                (p for p in paths), key=lambda p: (
                    int(re.search(r"_r(\d+)", p.name).group(1))))
            rn = int(re.search(r"_r(\d+)", newest.name).group(1))
            paths = [p for p in paths
                     if re.search(rf"_r0*{rn}\.json$", p.name)]

    investigate = False
    for p in paths:
        g = grade(extract_record(p))
        if args.json:
            print(json.dumps(g, sort_keys=True))
        else:
            if g.get("grade") == "unparseable":
                print(f"r{g['round']:>2} {g['kind']:<6} {p.name}: "
                      f"UNPARSEABLE — {g['reason']}")
                continue
            h = g["headline"]
            print(f"r{g['round']:>2} {g['kind']:<6} {p.name}: "
                  f"headline {h['value']} s vs {h['band']} -> "
                  f"{_fmt_grade(h)}")
            for q, e in g["extended"].items():
                if e["grade"] == "not_measured":
                    continue
                print(f"      extended {q}: {e['value']} s vs "
                      f"{e['band']} -> {_fmt_grade(e)}")
        for section in ([g.get("headline", {})]
                        + list(g.get("extended", {}).values())):
            if section.get("adjudication") == "investigate":
                investigate = True
    if investigate:
        print("VERDICT: investigate — out-of-band reading(s) on an idle "
              "box; check freshness_check / git history, or record a "
              "reproduced data-regime shift in bench_constants with "
              "provenance.")
        return 1 if args.strict else 0
    print("VERDICT: all readings in band or load-adjudicated.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
