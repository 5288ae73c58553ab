#!/usr/bin/env python
"""Round-end artifact FRESHNESS tripwire (r11 verdict #3).

Two committed artifacts claim to describe HEAD and nothing previously
failed when code was edited after their final regeneration (the r7
builder skipped regeneration entirely; the only guard since has been
judge diligence):

* ``SCALE_SWEEP.json`` stamps ``build_fp`` — the replica-construction
  fingerprint. A drifted ``build_fp`` means the committed sweep was
  measured on replicas a fresh ``--build`` would no longer produce.
  This half is ALSO pinned by an always-on pytest
  (``tests/test_artifact_freshness.py``): replica-construction edits
  are rare and must ship a sweep refresh in the same change.
* The newest ``LOCAL_DIFF_r*.json`` records each query's definition
  ``fingerprint`` (builder source + oracle SQL) and
  ``helper_fingerprint`` (cross-module closure). A drifted entry
  means that query was EDITED after the differential ran — the
  artifact proves a version of the query the driver will never run.
  This half CANNOT be an always-on pytest: mid-round, every query
  edit legitimately drifts until the round-end regeneration (the
  differential is generated LAST by design, after all query edits),
  and a deliberately-red suite would poison every ``-x`` run and the
  driver's own mid-round pytest. It is therefore a ROUND-END gate:
  the verify skill runs this script after the differential is
  regenerated, and the checker's detection logic is pinned by pytest
  against synthetic artifacts so the gate itself can't rot.

Exit 0 = both artifacts describe HEAD. Exit 1 = stale, with the
drifted queries (or the build_fp pair) printed.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stale_entries(
    artifact: dict,
    current: dict[str, str],
    current_helper: dict[str, str],
) -> dict[str, str]:
    """Queries whose committed LOCAL_DIFF snapshot no longer matches
    the code at HEAD — ``{name: reason}``. Pure so the failure
    directions are testable on synthetic artifacts.

    * missing: registered at HEAD but absent from the artifact (a
      query added after the regeneration).
    * definition drift: builder source or oracle SQL edited since.
    * helper drift: a cross-module helper in the query's closure
      edited since (same signal the changed-since-green band uses).
    Artifact-only names (queries deleted at HEAD) are stale too —
    the artifact claims evidence for code that no longer exists —
    but are keyed separately so the message names the direction.
    """
    stale: dict[str, str] = {}
    for name, fp in current.items():
        e = artifact.get(name)
        if not isinstance(e, dict):
            stale[name] = "missing from artifact (added after regeneration?)"
            continue
        if e.get("fingerprint") != fp:
            stale[name] = (
                f"definition drift: artifact {e.get('fingerprint')!r} "
                f"!= HEAD {fp!r}"
            )
            continue
        hf = current_helper.get(name)
        if hf is None:
            # ADVICE r12: skipping the helper comparison when HEAD
            # reports no fingerprint would pass a query that STOPPED
            # tracking helpers (or a registry regression dropping
            # helper fingerprints wholesale) as fresh on definition
            # match alone — flag the direction explicitly.
            if e.get("helper_fingerprint") is not None:
                stale[name] = (
                    f"helper tracking removed: artifact records "
                    f"{e.get('helper_fingerprint')!r} but HEAD reports "
                    f"no helper fingerprint for this query"
                )
        elif e.get("helper_fingerprint") != hf:
            stale[name] = (
                f"helper drift: artifact {e.get('helper_fingerprint')!r} "
                f"!= HEAD {hf!r}"
            )
    for name in artifact:
        if name not in current:
            stale[name] = "deleted at HEAD but still in artifact"
    return stale


def newest_local_diff(repo: str = REPO) -> str | None:
    diffs = sorted(
        (
            f
            for f in os.listdir(repo)
            if re.fullmatch(r"LOCAL_DIFF_r\d+\.json", f)
        ),
        key=lambda f: int(re.search(r"r(\d+)", f).group(1)),
    )
    return os.path.join(repo, diffs[-1]) if diffs else None


def main() -> int:
    from map_reduce_showcase_spark.plans.registry import (
        current_fingerprints,
        current_helper_fingerprints,
    )
    from scale_sweep import build_fingerprint

    ok = True

    sweep_path = os.path.join(REPO, "SCALE_SWEEP.json")
    if os.path.exists(sweep_path):
        committed = json.load(open(sweep_path)).get("build_fp")
        head = build_fingerprint()
        if committed != head:
            ok = False
            print(
                f"STALE SCALE_SWEEP.json: build_fp {committed!r} != HEAD "
                f"{head!r} — replica construction changed; re-run "
                f"`scale_sweep.py --build` + `--run`"
            )
    else:
        ok = False
        print("missing SCALE_SWEEP.json")

    diff_path = newest_local_diff()
    if diff_path is None:
        ok = False
        print("no committed LOCAL_DIFF artifact — run the round-end recipe")
    else:
        artifact = json.load(open(diff_path))
        stale = stale_entries(
            artifact, current_fingerprints(), current_helper_fingerprints()
        )
        if stale:
            ok = False
            print(
                f"STALE {os.path.basename(diff_path)}: {len(stale)} "
                f"queries drifted since regeneration — regenerate it "
                f"LAST (drive_contract --artifact) before committing:"
            )
            for name, why in sorted(stale.items()):
                print(f"  {name}: {why}")
    if ok:
        print(
            f"fresh: SCALE_SWEEP build_fp matches HEAD; "
            f"{os.path.basename(diff_path)} matches all "
            f"{len(current_fingerprints())} registered queries"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
