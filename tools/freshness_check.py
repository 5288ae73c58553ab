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

Since round 16 a third claim is gated (r15 verdict #2): the bench
anchor band is ~22% wide — wide enough to absorb a genuine ~15%
headline regression the point-in-band check cannot see. The only
protocol on this box that CAN see it is an interleaved same-JVM ABBA
pair-ratio comparison (``tools/ab_compare.py``). So any round whose
diff moves the fingerprint of a HEADLINE query (relative to the
PREVIOUS round's committed differential) must also commit
``AB_r{N}.json`` — ``{query: ab_compare-output-record}`` with A = the
previous round's builder and B = HEAD — covering every touched
headline query, with no conclusive ``a_faster`` (old-code-faster)
verdict. Rounds that never touch headline-feeding code (most rounds)
pass this gate with no artifact, mechanically.

Exit 0 = all claims describe HEAD. Exit 1 = stale/missing, with the
drifted queries (or the build_fp pair, or the AB-gate findings)
printed.
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
    diffs = local_diffs_newest_last(repo)
    return diffs[-1] if diffs else None


def local_diffs_newest_last(repo: str = REPO) -> list[str]:
    return [
        os.path.join(repo, f)
        for f in sorted(
            (
                f
                for f in os.listdir(repo)
                if re.fullmatch(r"LOCAL_DIFF_r\d+\.json", f)
            ),
            key=lambda f: int(re.search(r"r(\d+)", f).group(1)),
        )
    ]


def ab_gate_findings(
    prev_artifact: dict,
    current: dict[str, str],
    current_helper: dict[str, str],
    headline: list[str],
    ab_artifact: dict | None,
    ab_name: str = "AB_r{N}.json",
) -> list[str]:
    """The mandatory-ABBA gate (r15 verdict #2), pure so every failure
    direction is testable on synthetic artifacts.

    ``prev_artifact`` is the PREVIOUS round's committed LOCAL_DIFF —
    the last code state a driver bench graded. A headline query whose
    definition or helper fingerprint moved since then feeds the anchor
    total this round, and the band cannot catch a ~15% regression in
    it; the committed AB artifact must cover it with an interleaved
    pair-ratio record (``tools/ab_compare.py`` output: A = previous
    round's builder, B = HEAD) whose verdict is not ``a_faster``.

    Headline queries ABSENT from the previous differential are new
    this round — there is no previous-round baseline side to A/B —
    but they are NOT silently exempt (ADVICE r16 low: a rename or a
    HEADLINE-membership swap changed the anchor plan while bypassing
    the gate through exactly this hole). Since r17 the differential
    records anchor membership (``headline: true`` per entry,
    ``tools/drive_contract.py``); when the previous artifact carries
    that marker, any membership change (names added/removed, which a
    rename produces both of) and any name absent from the previous
    differential requires either an AB record in the artifact (A =
    the nearest predecessor builder) or an explicit recorded waiver
    (``ab_artifact["__waivers__"][name] = reason`` — e.g. "new query,
    no predecessor exists"). Pre-r17 previous artifacts carry no
    marker, so the membership half stays inert for them (the old
    exemption, confined to the one transition round).
    """
    prev_headline = (
        {n for n, e in prev_artifact.items()
         if isinstance(e, dict) and e.get("headline")}
        or None
    )
    touched = []
    needs_record: list[tuple[str, str]] = []  # (name, why)
    for name in headline:
        prev = prev_artifact.get(name)
        if not isinstance(prev, dict):
            if prev_headline is not None:
                needs_record.append(
                    (name, "headline query absent from the previous "
                           "round's differential (new or renamed)")
                )
            continue  # pre-r17 prev artifact: no membership marker
        if prev.get("fingerprint") != current.get(name) or prev.get(
            "helper_fingerprint"
        ) != current_helper.get(name):
            touched.append(name)
        if prev_headline is not None and name not in prev_headline:
            needs_record.append(
                (name, "added to HEADLINE since the previous round")
            )
    removed = sorted(prev_headline - set(headline)) if prev_headline else []
    if not (touched or needs_record or removed):
        return []
    problems: list[str] = []
    if ab_artifact is None:
        lst = touched + [n for n, _ in needs_record] + removed
        return [
            f"headline queries {sorted(set(lst))} changed (fingerprint "
            f"or HEADLINE membership) since the previous round's "
            f"differential but no {ab_name} artifact is committed — run "
            f"tools/ab_compare.py (A = previous round's builder, B = "
            f"HEAD) for each touched query and commit the records; "
            f"membership changes without a predecessor side need an "
            f"explicit __waivers__ entry (r15 verdict #2 / ADVICE r16)"
        ]
    waivers = ab_artifact.get("__waivers__") or {}
    for name, why in needs_record:
        if name in waivers or isinstance(ab_artifact.get(name), dict):
            continue
        problems.append(
            f"{name}: {why} — needs an AB record against the nearest "
            f"predecessor in {ab_name}, or an explicit "
            f"__waivers__['{name}'] entry recording why none exists"
        )
    for name in removed:
        if name not in waivers:
            problems.append(
                f"{name}: removed from HEADLINE since the previous "
                f"round — the anchor total no longer compares like "
                f"sets; record an explicit __waivers__['{name}'] "
                f"entry in {ab_name} saying why"
            )
    for name in touched:
        rec = ab_artifact.get(name)
        if not isinstance(rec, dict) or not (
            "median_ratio_b_over_a" in rec and "verdict" in rec
        ):
            problems.append(
                f"{name}: fingerprint moved this round but {ab_name} has "
                f"no ab_compare record for it (need median_ratio_b_over_a "
                f"+ verdict)"
            )
        elif rec["verdict"] == "a_faster":
            problems.append(
                f"{name}: AB verdict 'a_faster' (ratio "
                f"{rec['median_ratio_b_over_a']}) — the previous round's "
                f"plan is conclusively faster; this is a headline "
                f"regression, fix it or record why the slower plan ships"
            )
    return problems


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

    # Mandatory-ABBA gate (r15 verdict #2): headline fingerprints that
    # moved since the PREVIOUS round's differential require a committed
    # AB_r{N}.json pair-ratio artifact — the anchor band is too wide to
    # catch a modest headline regression; only the interleaved protocol
    # can. Needs two differentials (a previous-round baseline to diff
    # against); the first round ever has nothing to compare.
    from bench_constants import HEADLINE

    diffs = local_diffs_newest_last()
    if len(diffs) >= 2:
        prev_artifact = json.load(open(diffs[-2]))
        cur_round = int(re.search(r"r(\d+)", os.path.basename(diffs[-1])).group(1))
        ab_name = f"AB_r{cur_round}.json"
        ab_path = os.path.join(REPO, ab_name)
        ab_artifact = (
            json.load(open(ab_path)) if os.path.exists(ab_path) else None
        )
        findings = ab_gate_findings(
            prev_artifact,
            current_fingerprints(),
            current_helper_fingerprints(),
            HEADLINE,
            ab_artifact,
            ab_name=ab_name,
        )
        if findings:
            ok = False
            print(f"AB GATE ({ab_name}):")
            for f in findings:
                print(f"  {f}")

    if ok:
        print(
            f"fresh: SCALE_SWEEP build_fp matches HEAD; "
            f"{os.path.basename(diff_path)} matches all "
            f"{len(current_fingerprints())} registered queries"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
