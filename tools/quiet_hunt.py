#!/usr/bin/env python
"""Quiet-window hunter — harvest clean-steal bench evidence on a
contended host (r15 verdict #1 / #5).

The r15 and r16 sessions both hit multi-hour hypervisor-contention
windows (16 of 17 round-15 bench runs steal-polluted; round 16's
first run read 13.5% demand-steal on a loadavg-clean box). Band-edge
moves need CLEAN-stamp points, and on a day like that the only way to
get them is to keep watch and fire the bench the moment the host goes
quiet. This tool automates that watch:

1. **Burn probe** (the r15 method, mechanized): ``PROBE_PROCS``
   busy-loop worker processes for ``PROBE_SEC`` seconds, steal delta
   stamped around them via ``bench_constants.read_cpu_steal``. A
   guest at idle cannot observe denial (nothing is asking for
   cycles); a loaded guest can — demand-steal under the probe is the
   question "would a bench launched right now get its cycles?".
2. If the probe is clean (demand-steal < ``PROBE_DEMAND_MAX``) and
   the box idle, launch a full ``python bench.py`` run (the run's own
   idle gate still applies — the probe's ~10 s of load decays during
   the gate's settle wait).
3. Grade the run from its own stamps: ``headline_clean`` = gate
   passed on a criterion AND the headline-window steal record
   (``cpu_steal_headline``, r16) under both thresholds;
   ``child_clean`` = the fresh-JVM child's stamp under both. Collect
   until ``TARGET_CLEAN`` clean-headline runs or attempts exhaust.

Attempts land in ``$SPARK_GRAFT_HUNT_DIR`` (default /tmp) as
``bench_r{TAG}_attempt{N}.out``; one JSONL line per decision goes to
``quiet_hunt.log`` in the same directory. Run it detached::

    nohup python tools/quiet_hunt.py > /tmp/quiet_hunt.stdout 2>&1 &

This is an operator tool, not part of the driver contract — bench.py
remains the measured artifact's single producer; the hunter only
decides WHEN to run it and never edits what it prints.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_constants import (  # noqa: E402
    STEAL_SUSPECT_DEMAND_PCT,
    STEAL_SUSPECT_PCT,
    read_cpu_steal,
    steal_record,
)

HUNT_DIR = os.environ.get("SPARK_GRAFT_HUNT_DIR", "/tmp")
TAG = os.environ.get("SPARK_GRAFT_HUNT_TAG", "hunt")
LOG = os.path.join(HUNT_DIR, "quiet_hunt.log")
#: clean-headline runs to collect before exiting (4 ≈ one fresh-band
#: recalibration pass per the r15 verdict #5 protocol)
TARGET_CLEAN = int(os.environ.get("SPARK_GRAFT_HUNT_TARGET", "4"))
MAX_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_HUNT_ATTEMPTS", "60"))
PROBE_PROCS = 16
PROBE_SEC = 10
#: stricter than STEAL_SUSPECT_DEMAND_PCT on purpose: the probe is a
#: 10 s sample of a bursty signal — launching at 1.9% routinely
#: yields a 6-min run over 2%.
PROBE_DEMAND_MAX = 1.5
SLEEP_BETWEEN = 240.0


def log(rec: dict) -> None:
    rec["t"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(rec, flush=True)


def burn_probe() -> dict | None:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             f"import time;e=time.time()+{PROBE_SEC}\n"
             "while time.time()<e: pass"]
        )
        for _ in range(PROBE_PROCS)
    ]
    b0 = read_cpu_steal()
    for p in procs:
        p.wait()
    return steal_record(b0, read_cpu_steal())


def run_bench(n: int) -> tuple[str, dict | None]:
    out = os.path.join(HUNT_DIR, f"bench_r{TAG}_attempt{n}.out")
    with open(out, "w") as fo, open(out + ".err", "w") as fe:
        subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       stdout=fo, stderr=fe, timeout=3600)
    lines = [ln for ln in open(out) if ln.strip().startswith("{")]
    return out, (json.loads(lines[0]) if lines else None)


def _first_query_sample_ok(diag: dict) -> bool:
    per_q = diag.get("load_1m_per_query") or {}
    samples = [v for v in per_q.values() if v]
    if not samples:
        return False
    thresh = diag.get("box_load_threshold_1m", 2.0)
    return samples[0][0] < thresh


def stamp_clean(stamp: dict | None) -> bool:
    if not stamp:
        return False
    c = stamp.get("steal_pct_of_capacity")
    d = stamp.get("steal_pct_of_demand")
    return (
        c is not None and c < STEAL_SUSPECT_PCT
        and d is not None and d < STEAL_SUSPECT_DEMAND_PCT
    )


def main() -> None:
    clean_runs = 0
    for attempt in range(1, MAX_ATTEMPTS + 1):
        la = os.getloadavg()
        if la[0] > 1.5 or la[1] > 2.5:
            log({"attempt": attempt, "skip": "box busy",
                 "load": [round(la[0], 2), round(la[1], 2)]})
            time.sleep(SLEEP_BETWEEN)
            continue
        probe = burn_probe()
        pd = probe.get("steal_pct_of_demand") if probe else None
        if pd is None or pd >= PROBE_DEMAND_MAX:
            log({"attempt": attempt, "skip": "probe dirty", "probe": probe})
            time.sleep(SLEEP_BETWEEN)
            continue
        log({"attempt": attempt, "probe_clean": probe, "launching": True})
        out, diag = run_bench(attempt)
        if diag is None:
            log({"attempt": attempt, "bench": "no JSON line", "file": out})
            time.sleep(SLEEP_BETWEEN)
            continue
        verdict = {
            "attempt": attempt,
            "file": out,
            "value": diag.get("value"),
            "gate": diag.get("gate_criterion"),
            "box_load_ok": diag.get("box_load_ok"),
            "steal_run": diag.get("cpu_steal"),
            "steal_headline": diag.get("cpu_steal_headline"),
            "steal_child": diag.get("extended_fresh_cpu_steal"),
            "ext_fresh": diag.get("extended_queries"),
            "ext_post": diag.get("extended_queries_postheadline"),
            # box_load_ok + headline-window steal + the FIRST headline
            # query's pre-sample (the round-14 warm-up-arrival signal,
            # and the only one that caught the r16 attempt-12 case: a
            # 1.36x headline on 0.18% steal — stamp-invisible host
            # interference that arrived during warm-up). Mirrors
            # bench_trend._load_adjudication; the tool's flag must
            # never be GREENER than the grader's.
            "headline_clean": bool(
                diag.get("box_load_ok")
                and stamp_clean(diag.get("cpu_steal_headline"))
                and _first_query_sample_ok(diag)
            ),
            "child_clean": stamp_clean(
                diag.get("extended_fresh_cpu_steal")
            ),
        }
        log(verdict)
        if verdict["headline_clean"]:
            clean_runs += 1
            if clean_runs >= TARGET_CLEAN:
                log({"done": True, "clean_runs": clean_runs})
                return
        time.sleep(30)
    log({"done": True, "clean_runs": clean_runs, "exhausted": True})


if __name__ == "__main__":
    main()
