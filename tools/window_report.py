#!/usr/bin/env python
"""Report the driver-window evidence policy for the CURRENT code.

Prints the ~50-entry window the driver's CORRECTNESS artifact will
record, band by band (sentinels / never-green / changed-since-green /
stalest-green-first), plus the per-round staleness histogram of the
truncation tail — the two numbers each round's planning needs
(round 6 computed both inline twice; this makes it one command).

Usage: python tools/window_report.py [--window 50]
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_showcase_spark.plans.registry import (  # noqa: E402
    _SENTINELS,
    _latest_green_round,
    query_map,
    reverify_band,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    order = list(query_map())
    green = _latest_green_round()
    band2 = reverify_band()

    def band(n: str) -> str:
        if n in _SENTINELS:
            return "sentinel"
        if n not in green:
            return "never-green"
        if n in band2:
            return "changed-since-green"
        return f"green-r{green[n]}"

    win, tail = order[: args.window], order[args.window :]
    print(f"registry: {len(order)} queries; window: {len(win)}; tail: {len(tail)}")
    print("\nwindow composition:")
    for b, c in Counter(band(n) for n in win).most_common():
        print(f"  {b:22s} {c}")
    promoted = [n for n in win if band(n) in ("never-green", "changed-since-green")]
    if promoted:
        print("\nband 1+2 members (need driver proof this round):")
        for n in promoted:
            print(f"  {band(n):22s} {n}")
    stale_tail = Counter(band(n) for n in tail)
    print("\ntail staleness histogram (all must be some-round green):")
    for b, c in sorted(stale_tail.items()):
        print(f"  {b:22s} {c}")
    unproven_tail = [n for n in tail if n not in green]
    if unproven_tail:
        print(f"\nWARNING: unproven queries in tail: {unproven_tail}")
        sys.exit(1)

    # Structural guard (round-7 lesson: the builder skipped the
    # round-end local differential and only a judge-run artifact kept
    # the fingerprint band from going blind for every query greened
    # that round): if the newest CORRECTNESS round has no matching
    # LOCAL_DIFF, say so loudly every time this report is consulted.
    import glob
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _rounds(pattern: str) -> set[int]:
        out = set()
        for p in glob.glob(os.path.join(repo, pattern)):
            m = re.search(r"r(\d+)\.json$", p)
            if m:
                out.add(int(m.group(1)))
        return out

    corr = _rounds("CORRECTNESS_r*.json")
    if corr:
        latest = max(corr)
        if latest not in _rounds("LOCAL_DIFF_r*.json"):
            print(
                f"\nWARNING: LOCAL_DIFF_r{latest:02d}.json is missing — "
                f"generate it LAST this round "
                f"(python tools/drive_contract.py --artifact "
                f"LOCAL_DIFF_r{latest:02d}.json), or the fingerprint "
                f"band has no snapshot for anything greened in r{latest}."
            )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        # Point stdout at devnull BEFORE exiting: the interpreter
        # flushes the wrapper at shutdown, and without this the flush
        # re-raises and prints "Exception ignored in: <_io...>".
        # Exit non-zero — a truncated report may have swallowed the
        # unproven-tail warning, so it must not read as a clean pass.
        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
        sys.exit(1)
