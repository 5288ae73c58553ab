#!/usr/bin/env python
"""Generate SCALING.md's current-state table from SCALE_SWEEP.json.

The table was hand-regenerated ad hoc each refresh, which is exactly
how ADVICE r11's doc/artifact drift happened (a bullet kept `--only`
merge values the full refresh had superseded). One generator, one
format; ``tests/test_artifact_freshness.py`` pins the committed
table's rows to the committed artifact, so a sweep refresh that
forgets the table update fails pytest instead of waiting for a
reader to cross-check.

Usage:
    python tools/scaling_table.py [--round N]   # prints the rows
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HEADER = (
    "| Query | sf1.6 s | raw tail | tpw | detector | verdict "
    "| last measured |"
)


def rows(artifact: dict, round_label: str) -> list[str]:
    """One markdown row per sweep entry, in artifact order. Raw tail
    is t(sf1.6)/t(sf0.4) recomputed from the stamped times (not a
    stored field), so a hand-edited time cannot silently disagree
    with its displayed ratio."""
    out = []
    for q, v in artifact["queries"].items():
        t = v["times_sec"]
        raw = round(t["sf1.6"] / t["sf0.4"], 2)
        tpw = v.get("tail_time_per_work")
        det = v.get("detector")
        verdict = "clean" if v.get("flag") is False else str(v.get("flag"))
        wf = v.get("would_flag")
        if wf is not None:
            det = "exempt"
            both = all(wf.values())
            verdict = (
                f"control (would_flag raw+tpw: {'true' if both else wf})"
            )
        tpw_s = tpw if tpw is not None else "—"
        out.append(
            f"| `{q}` | {t['sf1.6']} | {raw} | {tpw_s} | {det} "
            f"| {verdict} | §{round_label} |"
        )
    return out


def committed_table_rows(scaling_md: str) -> list[str]:
    """The current-state table's data rows as committed in
    SCALING.md (everything between the header separator and the
    first blank line). Lookup failures raise with a message naming
    what was expected where (ADVICE r12: a bare ``str.index``
    ValueError — 'substring not found' — is what the pinning pytest
    would otherwise surface on a reworded header or a table that
    runs to EOF)."""
    try:
        start = scaling_md.index(HEADER)
    except ValueError:
        raise ValueError(
            f"SCALING.md: current-state table header not found — "
            f"expected the exact line {HEADER!r}; regenerate the "
            f"table with tools/scaling_table.py"
        ) from None
    # the separator must be the line IMMEDIATELY after the header — a
    # free-ranging index("|---") would silently lock onto some LATER
    # markdown table's separator if this one were deleted
    header_end = scaling_md.find("\n", start + len(HEADER))
    if header_end == -1 or not scaling_md[header_end + 1 :].startswith("|---"):
        raise ValueError(
            "SCALING.md: the line after the current-state table "
            "header is not a '|---' separator — the table must be "
            "the markdown shape tools/scaling_table.py emits"
        )
    sep_end = scaling_md.find("\n", header_end + 1)
    end = scaling_md.find("\n\n", sep_end) if sep_end != -1 else -1
    if sep_end == -1 or end == -1:
        raise ValueError(
            "SCALING.md: current-state table is not terminated by a "
            "blank line — keep one blank line after the last row so "
            "the table's extent is unambiguous"
        )
    return [r for r in scaling_md[sep_end + 1 : end].split("\n") if r]


def round_label_of(rows_list: list[str]) -> str:
    """Extract the round label from a committed row ('§X full sweep'
    → 'X full sweep')."""
    m = re.search(r"§([^|]+?) \|$", rows_list[0])
    return m.group(1).strip() if m else ""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--label",
        default=None,
        help="'last measured' label (default: reuse the committed one)",
    )
    args = ap.parse_args()
    artifact = json.load(open(os.path.join(REPO, "SCALE_SWEEP.json")))
    label = args.label
    if label is None:
        scaling = open(os.path.join(REPO, "SCALING.md")).read()
        label = round_label_of(committed_table_rows(scaling))
    print(HEADER)
    print("|---|---|---|---|---|---|---|")
    for r in rows(artifact, label):
        print(r)


if __name__ == "__main__":
    sys.exit(main())
